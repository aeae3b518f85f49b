"""BMP and AIFF containers (functions/bmp.py, functions/aiff.py):
round-trips, format quirks (80-bit extended sample rate, bottom-up vs
top-down rows, palette expansion), loud failures."""

import struct

import numpy as np
import pytest

from dbimport_spark.functions.aiff import (
    AiffError,
    _pack_extended,
    _unpack_extended,
    decode_aiff,
    encode_aiff,
)
from dbimport_spark.functions.bmp import BmpError, decode_bmp, encode_bmp


class TestBmp:
    def test_roundtrip_various_widths(self):
        # widths 1..5 exercise every 4-byte stride-padding remainder
        rng = np.random.default_rng(0)
        for w in (1, 2, 3, 4, 5, 16, 33):
            for h in (1, 3, 8):
                rgb = rng.integers(0, 256, w * h * 3).astype(np.uint8).tobytes()
                assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb), (w, h)

    def test_top_down_negative_height_decodes(self):
        rng = np.random.default_rng(1)
        w, h = 5, 4
        rgb = rng.integers(0, 256, w * h * 3).astype(np.uint8).tobytes()
        blob = bytearray(encode_bmp(w, h, rgb))
        # flip to top-down: negate biHeight and pre-flip the payload rows
        struct.pack_into("<i", blob, 14 + 8, -h)
        stride = (3 * w + 3) & ~3
        off = 54
        payload = bytes(blob[off:])
        flipped = b"".join(
            payload[r * stride : (r + 1) * stride] for r in range(h - 1, -1, -1)
        )
        blob[off:] = flipped
        assert decode_bmp(bytes(blob)) == (w, h, rgb)

    def test_8bit_palette_decodes_to_rgb(self):
        # hand-build an 8-bit grayscale-palette BMP
        w, h = 6, 3
        idx = np.arange(w * h, dtype=np.uint8).reshape(h, w)
        stride = (w + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = idx
        payload = rows[::-1].tobytes()  # bottom-up
        pal = b"".join(bytes((i, i, i, 0)) for i in range(256))
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(payload), 0, 0, 256, 0)
        off = 14 + 40 + len(pal)
        hdr = struct.pack("<2sIHHI", b"BM", off + len(payload), 0, 0, off)
        gw, gh, rgb = decode_bmp(hdr + info + pal + payload)
        want = np.repeat(idx.reshape(h, w, 1), 3, axis=2).tobytes()
        assert (gw, gh, rgb) == (w, h, want)

    def test_malformed_loud(self):
        with pytest.raises(BmpError, match="not a BMP"):
            decode_bmp(b"XX" + b"\x00" * 60)
        blob = bytearray(encode_bmp(4, 4, bytes(48)))
        struct.pack_into("<I", blob, 14 + 16, 1)  # compression = RLE8
        with pytest.raises(BmpError, match="compression"):
            decode_bmp(bytes(blob))
        with pytest.raises(BmpError, match="truncated"):
            decode_bmp(bytes(encode_bmp(4, 4, bytes(48)))[:-5])
        with pytest.raises(BmpError, match="size mismatch"):
            encode_bmp(4, 4, bytes(47))


class TestAiff:
    def test_extended_float_rates_exact(self):
        for rate in (1, 8000, 11025, 22050, 44100, 48000, 96000, 192000):
            assert _unpack_extended(_pack_extended(rate)) == rate

    def test_mono_and_stereo_roundtrip(self):
        rng = np.random.default_rng(2)
        x = rng.integers(-32768, 32767, 5000).astype(np.int16)
        rate, y = decode_aiff(encode_aiff(x, 44100))
        assert rate == 44100 and (y == x).all()
        st = rng.integers(-32768, 32767, (3000, 2)).astype(np.int16)
        rate, y2 = decode_aiff(encode_aiff(st, 8000))
        assert rate == 8000 and y2.shape == st.shape and (y2 == st).all()

    def test_unknown_chunks_skipped(self):
        x = np.arange(100, dtype=np.int16)
        blob = bytearray(encode_aiff(x, 8000))
        # splice an odd-sized ANNO chunk (word-aligned per IFF) after COMM
        comm_end = bytes(blob).index(b"SSND")
        extra = b"ANNO" + struct.pack(">I", 5) + b"hello" + b"\x00"
        blob2 = bytes(blob[:comm_end]) + extra + bytes(blob[comm_end:])
        blob2 = (
            blob2[:4]
            + struct.pack(">I", len(blob2) - 8)
            + blob2[8:]
        )
        rate, y = decode_aiff(blob2)
        assert rate == 8000 and (y == x).all()

    def test_malformed_loud(self):
        with pytest.raises(AiffError, match="not an AIFF"):
            decode_aiff(b"RIFF" + b"\x00" * 20)
        x = np.arange(10, dtype=np.int16)
        blob = bytearray(encode_aiff(x, 8000))
        at = bytes(blob).index(b"COMM") + 8
        struct.pack_into(">h", blob, at, 4)  # 4 channels
        with pytest.raises(AiffError, match="unsupported"):
            decode_aiff(bytes(blob))
        with pytest.raises(AiffError):
            decode_aiff(bytes(encode_aiff(x, 8000))[:-8])
        with pytest.raises(AiffError, match="empty"):
            encode_aiff(np.zeros(0, dtype=np.int16), 8000)
