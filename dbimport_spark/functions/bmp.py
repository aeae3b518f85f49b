"""BMP (Windows bitmap) codec — the simplest raster container a scraped
corpus contains, implemented from the public BITMAPFILEHEADER /
BITMAPINFOHEADER layout. The pixel payload of a 24-bit BI_RGB file is
exactly the DIB layout functions/avi.py already implements for
uncompressed video frames (bottom-up rows, BGR order, 4-byte stride), so
this module is a thin header layer over those shared kernels.

Scope: encode 24-bit BI_RGB; decode 24-bit BI_RGB and 8-bit palettized
(palette expanded to RGB). Anything else (RLE, 16/32-bit masks, V4/V5
headers beyond the core fields) raises loudly.
"""

from __future__ import annotations

import struct

from dbimport_spark.functions.avi import _dib_stride, _dib_to_rgb, _rgb_to_dib


class BmpError(ValueError):
    pass


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB pixels (w·h·3 bytes) → 24-bit BI_RGB .bmp bytes."""
    if len(rgb) != width * height * 3:
        raise BmpError("pixel buffer size mismatch")
    dib = _rgb_to_dib(width, height, rgb)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0,  # header size, dims, planes, bpp, BI_RGB
        len(dib), 2835, 2835, 0, 0,   # image size, 72 DPI, no palette
    )
    offset = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", offset + len(dib), 0, 0, offset)
    return hdr + info + dib


def decode_bmp(blob: bytes) -> tuple[int, int, bytes]:
    """BMP bytes → (width, height, top-down RGB pixels)."""
    if len(blob) < 54 or blob[:2] != b"BM":
        raise BmpError("not a BMP file")
    _magic, _fsize, _r1, _r2, offset = struct.unpack_from("<2sIHHI", blob, 0)
    hdr_size, width, height, planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", blob, 14
    )
    if hdr_size < 40:
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    if planes != 1 or compression != 0:
        raise BmpError(f"unsupported BMP (planes={planes}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise BmpError("bad BMP dimensions")
    if bpp == 24:
        stride = _dib_stride(width)
        px = blob[offset : offset + stride * height]
        if len(px) != stride * height:
            raise BmpError("truncated BMP pixel data")
        if top_down:
            # _dib_to_rgb assumes bottom-up; pre-flip the rows
            px = b"".join(
                px[r * stride : (r + 1) * stride]
                for r in range(height - 1, -1, -1)
            )
        return width, height, _dib_to_rgb(width, height, px)
    if bpp == 8:
        import numpy as np

        n_colors = struct.unpack_from("<I", blob, 14 + 32)[0] or 256
        pal_at = 14 + hdr_size
        pal = np.frombuffer(
            blob[pal_at : pal_at + 4 * n_colors], dtype=np.uint8
        ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRX → RGB
        stride = (width + 3) & ~3
        px = blob[offset : offset + stride * height]
        if len(px) != stride * height:
            raise BmpError("truncated BMP pixel data")
        rows = np.frombuffer(px, np.uint8).reshape(height, stride)[:, :width]
        if not top_down:
            rows = rows[::-1]
        if int(rows.max(initial=0)) >= pal.shape[0]:
            raise BmpError("palette index out of range")
        return width, height, pal[rows].tobytes()
    raise BmpError(f"unsupported bit depth {bpp}")
