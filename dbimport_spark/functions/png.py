"""Pure-stdlib PNG codec (encode + decode) for the multimodal pipeline.

The container has no PIL/imageio, but PNG's container format is zlib
(RFC 1950) inside length-prefixed CRC'd chunks — both fully coverable
with ``zlib`` + ``struct``. This gives the multimodal operators a REAL
decode kernel for one ubiquitous format; JPEG/video stay honestly
stubbed (see functions/multimodal.py).

Scope (the subset a data pipeline actually meets for raster blobs):
  * bit depth 8; color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA),
    and 3 (palette, via PLTE expansion to RGB)
  * all five scanline filters (None/Sub/Up/Average/Paeth), decode + encode
  * multiple IDAT chunks, non-interlaced only (Adam7 rejected explicitly)

Reference parity note: the reference imports blobs as opaque bytes
(``/root/reference/src/main/java/de/soderer/dbimport/DbImportWorker.java``
blob import path) and never decodes; decode kernels are part of this
repo's training-data-pipeline surface, not a reference port.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Undo per-scanline filtering. ``raw`` is height * (1 + stride) bytes."""
    stride = width * bpp
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        pos += stride
        base = y * stride
        prev = base - stride
        if ftype == 0:  # None
            out[base : base + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                out[base + x] = (line[x] + left) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                up = out[prev + x] if y > 0 else 0
                out[base + x] = (line[x] + up) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                up = out[prev + x] if y > 0 else 0
                out[base + x] = (line[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                up = out[prev + x] if y > 0 else 0
                ul = out[prev + x - bpp] if (y > 0 and x >= bpp) else 0
                out[base + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise PngError(f"unknown scanline filter {ftype}")
    return out


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes → (width, height, channels, pixel bytes row-major).

    Palette images are expanded to 3-channel RGB. Raises PngError on
    malformed input, non-8-bit depth, or interlaced images.
    """
    if len(data) < 8 or data[:8] != _SIGNATURE:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    width = height = bit_depth = color_type = None
    interlace = 0
    idat = bytearray()
    palette: bytes | None = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngError(f"bad CRC in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = bytes(body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise PngError("missing IHDR")
    if bit_depth != 8:
        raise PngError(f"unsupported bit depth {bit_depth} (only 8)")
    if color_type not in _CHANNELS:
        raise PngError(f"unsupported color type {color_type}")
    if interlace != 0:
        raise PngError("interlaced (Adam7) PNG not supported")
    bpp = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    expect = height * (1 + width * bpp)
    if len(raw) != expect:
        raise PngError(f"decompressed size {len(raw)} != expected {expect}")
    pixels = _unfilter(raw, width, height, bpp)
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        rgb = bytearray(len(pixels) * 3)
        for i, idx in enumerate(pixels):
            off = idx * 3
            if off + 3 > len(palette):
                raise PngError(f"palette index {idx} out of range")
            rgb[i * 3 : i * 3 + 3] = palette[off : off + 3]
        return width, height, 3, bytes(rgb)
    return width, height, bpp, bytes(pixels)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    filter_type: int = 0,
    compress_level: int = 6,
) -> bytes:
    """Row-major 8-bit pixels → PNG bytes.

    ``filter_type`` applies one filter to every scanline (0..4); a real
    encoder would pick per-row, but a fixed filter keeps the stream small
    and exercises the decoder's filter paths symmetrically in tests.
    """
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise PngError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != height * stride:
        raise PngError(f"pixel buffer {len(pixels)} != {height}x{stride}")
    if not 0 <= filter_type <= 4:
        raise PngError(f"bad filter {filter_type}")
    bpp = channels
    raw = bytearray()
    for y in range(height):
        base = y * stride
        line = pixels[base : base + stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw += line
            continue
        prev_line = pixels[base - stride : base] if y > 0 else b"\x00" * stride
        for x in range(stride):
            left = line[x - bpp] if x >= bpp else 0
            up = prev_line[x]
            ul = prev_line[x - bpp] if x >= bpp else 0
            if filter_type == 1:
                pred = left
            elif filter_type == 2:
                pred = up
            elif filter_type == 3:
                pred = (left + up) >> 1
            else:
                pred = _paeth(left, up, ul)
            raw.append((line[x] - pred) & 0xFF)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), compress_level))
        + _chunk(b"IEND", b"")
    )
