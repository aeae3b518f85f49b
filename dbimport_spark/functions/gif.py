"""From-scratch GIF codec (stdlib only) — real multi-FRAME container
decode for the multimodal family.

PNG covers still images (functions/png.py) and WAV covers audio
(functions/wav.py); GIF is the animated container, so frame SAMPLING —
the video-pipeline primitive multimodal.sample_frames previously faked by
byte-slicing — runs against a real decoder here. Implemented from the
public GIF89a specification (CompuServe, 1990; www.w3.org/Graphics/GIF/
spec-gif89a.txt): logical screen descriptor, global/local color tables,
extension blocks (skipped via their sub-block chains), image descriptors,
and the variable-width LZW data stream (9→12-bit codes, clear/end codes,
dictionary rebuild on clear).

The encoder uses the spec-legal "literal LZW" form: every pixel is
emitted as its own root code with a clear code before the dictionary
would force a width growth — larger output than real compression but a
valid stream ANY conforming decoder accepts (and ours decodes general
streams, exercised by the growth-path tests)."""

from __future__ import annotations

import struct

HEADER = b"GIF89a"
TRAILER = 0x3B
IMAGE_SEP = 0x2C
EXTENSION = 0x21


# ---------------------------------------------------------------- LZW

def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """General GIF-LZW decode: variable code width, dictionary growth to
    4096 entries, CLEAR resets, EOI terminates."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    # bit reader (LSB-first per spec)
    acc = 0
    nbits = 0
    pos = 0

    def read_code(width):
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    def reset_table():
        return {i: bytes([i]) for i in range(clear)}

    table = reset_table()
    width = min_code_size + 1
    prev: bytes | None = None
    next_code = eoi + 1
    while True:
        code = read_code(width)
        if code is None or code == eoi:
            return bytes(out)
        if code == clear:
            table = reset_table()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def lzw_encode_literal(pixels: bytes, min_code_size: int = 8) -> bytes:
    """Spec-legal uncompressed LZW: emit each pixel as a root code,
    inserting CLEAR whenever the implicit dictionary is about to grow the
    code width past min_code_size+1 bits."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    cap = (1 << width) - 1  # emit CLEAR before next_code reaches this

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    next_code = eoi + 1
    for px in pixels:
        emit(px)
        next_code += 1
        if next_code >= cap:
            emit(clear)
            next_code = eoi + 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap payload into ≤255-byte length-prefixed sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ------------------------------------------------------------ container

def encode_gif(frames, width: int, height: int) -> bytes:
    """Encode 8-bit grayscale frames (each ``bytes`` of w*h pixels) as an
    animated GIF with a 256-gray global color table."""
    out = bytearray(HEADER)
    # logical screen descriptor: GCT present, 8 bits/px, 256-entry table
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):
        out += bytes((i, i, i))  # grayscale GCT
    for px in frames:
        if len(px) != width * height:
            raise ValueError("frame size mismatch")
        out.append(IMAGE_SEP)
        out += struct.pack("<HHHHB", 0, 0, width, height, 0)  # no LCT
        out.append(8)  # LZW min code size
        out += _sub_blocks(lzw_encode_literal(px, 8))
    out.append(TRAILER)
    return bytes(out)


def decode_gif(blob: bytes):
    """→ (width, height, [frame pixel bytes]); pixels are palette indices
    (gray value, for images from encode_gif)."""
    if blob[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF file")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))
    frames = []
    while pos < len(blob):
        b = blob[pos]
        pos += 1
        if b == TRAILER:
            break
        if b == EXTENSION:
            pos += 1  # label
            while blob[pos]:  # skip sub-block chain
                pos += 1 + blob[pos]
            pos += 1
        elif b == IMAGE_SEP:
            fx, fy, fw, fh, iflags = struct.unpack_from("<HHHHB", blob, pos)
            pos += 9
            if iflags & 0x40:
                raise ValueError("interlaced GIF not supported")
            if iflags & 0x80:
                pos += 3 * (2 << (iflags & 0x07))  # local color table
            min_code = blob[pos]
            pos += 1
            data = bytearray()
            while blob[pos]:
                n = blob[pos]
                data += blob[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            px = lzw_decode(bytes(data), min_code)
            if len(px) < fw * fh:
                raise ValueError("truncated LZW pixel data")
            frames.append(px[: fw * fh])
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    return w, h, frames
