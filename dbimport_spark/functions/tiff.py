"""Baseline TIFF codec — the scanned-document raster format, from the
public TIFF 6.0 specification (Adobe, 1992). Both byte orders (II/MM),
IFD tag walk, multi-strip assembly, 8-bit grayscale and RGB, and three
compressions:

  * 1 — uncompressed strips;
  * 32773 — PackBits (the Macintosh run-length scheme in Section 9:
    control n ≥ 0 → n+1 literal bytes, −127 ≤ n ≤ −1 → repeat next byte
    1−n times, −128 → noop), encode + decode;
  * 5 — TIFF LZW (Section 13): MSB-first bit packing, 9→12-bit codes,
    ClearCode 256 / EOI 257, and the spec's EarlyChange convention (the
    code width bumps one code earlier than GIF's LSB-first LZW), encode +
    decode.

PhotometricInterpretation 0 (WhiteIsZero) inverts to the conventional
BlackIsZero on decode so callers always see intensity = brightness.
Everything else (tiles, 16-bit, planar config 2, JPEG-in-TIFF) raises
loudly.
"""

from __future__ import annotations

import struct

import numpy as np


class TiffError(ValueError):
    pass


# ------------------------------------------------------------- PackBits


def packbits_encode(data: bytes) -> bytes:
    """Section-9 PackBits: greedy runs ≥ 3 become repeats, the rest
    literal groups of ≤ 128."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)  # -(run-1) as unsigned byte
            out.append(data[i])
            i = j
            continue
        # literal segment: until the next run of ≥3 or 128 bytes
        lit_start = i
        while i < n and i - lit_start < 128:
            j = i + 1
            while j < n and j - i < 128 and data[j] == data[i]:
                j += 1
            if j - i >= 3:
                break
            i = j
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c == 128:  # noop
            continue
        if c < 128:
            if i + c + 1 > n:
                raise TiffError("truncated PackBits literal")
            out += data[i : i + c + 1]
            i += c + 1
        else:
            if i >= n:
                raise TiffError("truncated PackBits run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) != expected:
        raise TiffError(f"PackBits decoded {len(out)} bytes, expected {expected}")
    return bytes(out)


# ------------------------------------------------------------- TIFF LZW

_CLEAR = 256
_EOI = 257


def tiff_lzw_encode(data: bytes) -> bytes:
    """Section-13 LZW: MSB-first code packing, table reset at 4094
    entries, EarlyChange width bumps (at 510/1022/2046 used codes)."""
    out_bits: list[tuple[int, int]] = []

    def emit(code: int, width: int) -> None:
        out_bits.append((code, width))

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    prefix = b""
    for byte in data:
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        # EarlyChange: width grows when next_code == 2^width - 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prefix = bytes([byte])
    if prefix:
        emit(table[prefix], width)
    emit(_EOI, width)
    # pack MSB-first
    acc = 0
    nbits = 0
    out = bytearray()
    for code, w in out_bits:
        acc = (acc << w) | code
        nbits += w
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    pos = 0
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    total = bits.size
    while len(out) < expected:
        if pos + width > total:
            raise TiffError("truncated LZW stream")
        code = 0
        for b in bits[pos : pos + width].tolist():
            code = (code << 1) | b
        pos += width
        if code == _EOI:
            break
        if code == _CLEAR:
            reset()
            continue
        if prev is None:
            if code >= len(table) or code > 255:
                raise TiffError("LZW stream does not start with a root code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise TiffError(f"LZW code {code} beyond table")
        out += entry
        prev = entry
        # EarlyChange, decoder side: the decoder's table trails the
        # encoder's by ONE entry (the encoder adds per emission, the
        # decoder per received code starting from the second), so the
        # width bump fires at 2^w − 2 here to align with the encoder's
        # bump at next_code == 2^w − 1
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) != expected:
        raise TiffError(f"LZW decoded {len(out)} bytes, expected {expected}")
    return bytes(out)


# ------------------------------------------------------------ container

_COMPRESSORS = {
    "none": (1, lambda d: d),
    "packbits": (32773, packbits_encode),
    "lzw": (5, tiff_lzw_encode),
}


def encode_tiff(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    compression: str = "none",
    rows_per_strip: int = 64,
) -> bytes:
    """Row-major 8-bit pixels (gray or RGB) → little-endian TIFF bytes
    with multi-strip layout."""
    if channels not in (1, 3):
        raise TiffError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise TiffError("pixel buffer size mismatch")
    if compression not in _COMPRESSORS:
        raise TiffError(f"unknown compression {compression!r}")
    comp_tag, comp_fn = _COMPRESSORS[compression]

    stride = width * channels
    strips = []
    for y0 in range(0, height, rows_per_strip):
        rows = pixels[y0 * stride : min(y0 + rows_per_strip, height) * stride]
        strips.append(comp_fn(bytes(rows)))

    n = len(strips)
    # layout: header(8) + strip data + IFD
    data_at = 8
    offsets = []
    pos = data_at
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    ifd_at = pos + (pos & 1)

    def entry(tag, typ, count, value):
        return struct.pack("<HHI4s", tag, typ, count, value)

    def long_val(v):
        return struct.pack("<I", v)

    def short_val(v):
        return struct.pack("<HH", v, 0)

    entries = []
    extra = b""
    extra_at = None  # filled after counting entries

    def array_field(values, typ):
        # SHORT(3) or LONG(4) arrays; inline when they fit in 4 bytes
        nonlocal extra
        fmt = "<H" if typ == 3 else "<I"
        sz = 2 if typ == 3 else 4
        raw = b"".join(struct.pack(fmt, v) for v in values)
        if len(raw) <= 4:
            return raw + b"\x00" * (4 - len(raw))
        at = extra_at + len(extra)
        extra += raw
        return struct.pack("<I", at)

    # two passes: first count entries to place the extra-data area
    tags = [
        (256, 3, 1, None),  # ImageWidth
        (257, 3, 1, None),  # ImageLength
        (258, 3, channels, None),  # BitsPerSample
        (259, 3, 1, None),  # Compression
        (262, 3, 1, None),  # Photometric: 1 gray black-is-zero / 2 RGB
        (273, 4, n, None),  # StripOffsets
        (277, 3, 1, None),  # SamplesPerPixel
        (278, 3, 1, None),  # RowsPerStrip
        (279, 4, n, None),  # StripByteCounts
    ]
    n_entries = len(tags)
    extra_at = ifd_at + 2 + n_entries * 12 + 4

    entries.append(entry(256, 3, 1, short_val(width)))
    entries.append(entry(257, 3, 1, short_val(height)))
    entries.append(entry(258, 3, channels, array_field([8] * channels, 3)))
    entries.append(entry(259, 3, 1, short_val(comp_tag)))
    entries.append(entry(262, 3, 1, short_val(1 if channels == 1 else 2)))
    entries.append(entry(273, 4, n, array_field(offsets, 4)))
    entries.append(entry(277, 3, 1, short_val(channels)))
    entries.append(entry(278, 3, 1, short_val(rows_per_strip)))
    entries.append(entry(279, 4, n, array_field([len(s) for s in strips], 4)))

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_at))
    for s in strips:
        out += s
    if pos & 1:
        out += b"\x00"
    out += struct.pack("<H", n_entries) + b"".join(entries) + struct.pack("<I", 0)
    out += extra
    return bytes(out)


def _read_ifd_value(blob, endian, typ, count, raw):
    fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
    if fmt is None:
        raise TiffError(f"unsupported IFD type {typ}")
    size = struct.calcsize(fmt)
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (at,) = struct.unpack(endian + "I", raw)
        buf = blob[at : at + total]
        if len(buf) != total:
            raise TiffError("IFD value offset out of range")
    return list(struct.unpack(endian + fmt * count, buf))


def decode_tiff(blob: bytes):
    """TIFF bytes → (width, height, channels, pixel bytes row-major)."""
    if len(blob) < 8:
        raise TiffError("not a TIFF file")
    order = blob[:2]
    if order == b"II":
        endian = "<"
    elif order == b"MM":
        endian = ">"
    else:
        raise TiffError("not a TIFF file (bad byte order)")
    magic, ifd_at = struct.unpack(endian + "HI", blob[2:8])
    if magic != 42:
        raise TiffError("not a TIFF file (bad magic)")
    if ifd_at + 2 > len(blob):
        raise TiffError("truncated IFD")
    (n_entries,) = struct.unpack(endian + "H", blob[ifd_at : ifd_at + 2])
    tags = {}
    for i in range(n_entries):
        at = ifd_at + 2 + i * 12
        if at + 12 > len(blob):
            raise TiffError("truncated IFD entry")
        tag, typ, count = struct.unpack(endian + "HHI", blob[at : at + 8])
        tags[tag] = (typ, count, blob[at + 8 : at + 12])

    def get(tag, default=None):
        if tag not in tags:
            if default is not None:
                return default
            raise TiffError(f"missing required TIFF tag {tag}")
        typ, count, raw = tags[tag]
        return _read_ifd_value(blob, endian, typ, count, raw)

    width = get(256)[0]
    height = get(257)[0]
    channels = get(277, [1])[0]
    bits = get(258, [8])
    compression = get(259, [1])[0]
    photometric = get(262, [1])[0]
    rows_per_strip = get(278, [height])[0]
    offsets = get(273)
    counts = get(279)
    if channels not in (1, 3) or any(b != 8 for b in bits):
        raise TiffError(f"unsupported TIFF ({channels} ch, bits {bits})")
    if photometric not in (0, 1, 2):
        raise TiffError(f"unsupported photometric {photometric}")
    if len(offsets) != len(counts):
        raise TiffError("StripOffsets/StripByteCounts disagree")

    stride = width * channels
    out = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = blob[off : off + cnt]
        if len(strip) != cnt:
            raise TiffError("truncated strip data")
        n_rows = min(rows_per_strip, height - si * rows_per_strip)
        expected = n_rows * stride
        if compression == 1:
            if len(strip) != expected:
                raise TiffError("uncompressed strip size mismatch")
            out += strip
        elif compression == 32773:
            out += packbits_decode(strip, expected)
        elif compression == 5:
            out += tiff_lzw_decode(strip, expected)
        else:
            raise TiffError(f"unsupported compression {compression}")
    if len(out) != height * stride:
        raise TiffError("assembled pixel data has wrong size")
    if photometric == 0:  # WhiteIsZero → invert to conventional intensity
        out = bytearray(bytes(np.frombuffer(bytes(out), np.uint8) ^ 0xFF))
    return width, height, channels, bytes(out)
