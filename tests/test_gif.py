"""GIF codec tests: container roundtrip, the public 1×1 spec vector, and
a REAL compressing LZW encoder (written here, textbook algorithm) driving
the decoder through dictionary growth, width growth, and the KwKwK case
that the literal-mode product encoder never produces."""

import pytest

from dbimport_spark.functions.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode_literal,
)

# widely-published minimal GIF: 1×1 white pixel, 2-entry GCT
ONE_PX = bytes.fromhex(
    "474946383961010001008000"
    "00ffffff000000"
    "2c000000000100010000"
    "0202440100"
    "3b"
)


def _lzw_encode_real(data: bytes, min_code_size: int) -> bytes:
    """Reference compressing LZW encoder (variable width, dict to 4096)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


class TestGif:
    def test_spec_vector_one_pixel(self):
        w, h, frames = decode_gif(ONE_PX)
        assert (w, h) == (1, 1)
        assert frames == [b"\x00"]

    def test_container_roundtrip_multiframe(self):
        frames = [bytes(range(64)), bytes(reversed(range(64))), bytes([7]) * 64]
        w, h, back = decode_gif(encode_gif(frames, 8, 8))
        assert (w, h) == (8, 8)
        assert back == frames

    @pytest.mark.parametrize("min_code", [2, 4, 8])
    def test_real_lzw_roundtrip_with_growth(self, min_code):
        alphabet = 1 << min_code
        # long repetitive data → dictionary growth through several widths
        data = bytes((i * 7 + i // 3) % alphabet for i in range(20000))
        assert lzw_decode(_lzw_encode_real(data, min_code), min_code) == data

    def test_kwkwk_case(self):
        # 'ababab...' produces the code==next_code corner immediately
        data = b"\x00\x01" * 50
        assert lzw_decode(_lzw_encode_real(data, 2), 2) == data

    def test_literal_encoder_is_valid_lzw(self):
        data = bytes(range(256)) * 10
        assert lzw_decode(lzw_encode_literal(data, 8), 8) == data

    def test_extension_blocks_skipped(self):
        blob = bytearray(encode_gif([bytes(4)], 2, 2))
        # splice a graphic-control extension before the image separator
        idx = blob.index(0x2C, 13 + 768)
        ext = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
        spliced = bytes(blob[:idx]) + ext + bytes(blob[idx:])
        w, h, frames = decode_gif(spliced)
        assert frames == [bytes(4)]

    def test_malformed_rejected(self):
        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"PNG....")
        blob = bytearray(encode_gif([bytes(9)], 3, 3))
        blob[13 + 768] = 0x99  # clobber the image separator
        with pytest.raises(ValueError, match="unknown GIF block"):
            decode_gif(bytes(blob))


def _old_loop_encode_literal(pixels, mcs):
    """The pre-vectorization per-pixel literal encoder, kept as a byte-
    identity oracle for the numpy fast path."""
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    cap = (1 << width) - 1
    out = bytearray()
    acc = nbits = 0

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


class TestVectorizedLzwEquivalence:
    @pytest.mark.parametrize("n", [0, 1, 63, 253, 254, 506, 5000])
    @pytest.mark.parametrize("mcs", [2, 4, 8])
    def test_literal_encoder_byte_identical_to_loop_form(self, n, mcs):
        import random

        rnd = random.Random(n * 31 + mcs)
        px = bytes(rnd.randrange(1 << mcs) for _ in range(n))
        assert lzw_encode_literal(px, mcs) == _old_loop_encode_literal(px, mcs)
        assert lzw_decode(lzw_encode_literal(px, mcs), mcs) == px

    def test_decoder_on_random_compressed_streams(self):
        import random

        rnd = random.Random(99)
        for kind in range(12):
            n = rnd.choice([10, 500, 3000, 20000])
            if kind % 3 == 0:
                px = bytes([kind * 17 % 256]) * n
            elif kind % 3 == 1:
                px = bytes((i * 7) % 256 for i in range(n))
            else:
                px = bytes(rnd.randrange(256) for _ in range(n))
            assert lzw_decode(_lzw_encode_real(px, 8), 8) == px


def test_interlaced_gif_roundtrip():
    """GIF89a 4-pass interlacing: encode permutes rows into transmission
    order and sets the flag; decode scatters them back — identity for
    every geometry including heights where late passes are empty."""
    import numpy as np

    from dbimport_spark.functions.gif import decode_gif, encode_gif

    rng = np.random.default_rng(3)
    for (w, h, n) in [(13, 9, 2), (8, 8, 1), (1, 1, 1), (20, 17, 3), (5, 2, 2)]:
        frames = [rng.integers(0, 256, w * h).astype(np.uint8).tobytes() for _ in range(n)]
        plain = decode_gif(encode_gif(frames, w, h))
        inter = decode_gif(encode_gif(frames, w, h, interlace=True))
        assert plain == inter == (w, h, frames)


class TestGifPalette:
    """Non-identity palettes: decode must map indices through the color
    table so downstream stats see pixel VALUES (r4 ADVICE)."""

    def _non_identity_gif(self):
        """A 2x2 GIF whose global color table maps index i → reversed
        gray (255-i): identity-palette assumptions break loudly."""
        blob = bytearray(encode_gif([bytes([0, 1, 2, 3])], 2, 2))
        # rewrite the 256-entry grayscale GCT in place (starts at byte 13)
        for i in range(256):
            g = 255 - i
            blob[13 + 3 * i : 13 + 3 * i + 3] = bytes((g, g, g))
        return bytes(blob)

    def test_decode_gif_rgb_applies_palette(self):
        from dbimport_spark.functions.gif import decode_gif_rgb

        w, h, frames = decode_gif_rgb(self._non_identity_gif())
        assert (w, h) == (2, 2)
        px = frames[0]
        # index 0 → (255,255,255), index 3 → (252,252,252)
        assert px[:3] == bytes((255, 255, 255))
        assert px[9:12] == bytes((252, 252, 252))

    def test_decode_pixels_uses_palette(self):
        from dbimport_spark.functions.multimodal import _decode_pixels

        w, h, ch, px = _decode_pixels(self._non_identity_gif())
        assert ch == 3  # non-identity palette → RGB values, not indices
        assert px[:3] == bytes((255, 255, 255))

    def test_identity_palette_stays_single_channel(self):
        from dbimport_spark.functions.multimodal import _decode_pixels

        blob = encode_gif([bytes([0, 1, 2, 3])], 2, 2)
        w, h, ch, px = _decode_pixels(blob)
        # encode_gif's identity grayscale palette: unchanged fast path,
        # index == intensity, so existing fixture hashes are stable
        assert ch == 1 and px == bytes([0, 1, 2, 3])

    def test_local_color_table_preferred(self):
        from dbimport_spark.functions.gif import decode_gif_full

        import struct as _s

        # hand-build a GIF with NO global table and a 4-entry local one
        out = bytearray(b"GIF89a")
        out += _s.pack("<HHBBB", 2, 1, 0x00, 0, 0)  # no GCT
        out.append(0x2C)
        out += _s.pack("<HHHHB", 0, 0, 2, 1, 0x81)  # LCT present, 4 entries
        out += bytes((10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40))
        out.append(2)  # LZW min code size
        from dbimport_spark.functions.gif import lzw_encode_literal

        data = lzw_encode_literal(bytes([1, 3]), 2)
        out.append(len(data))
        out += data
        out.append(0)  # sub-block terminator
        out.append(0x3B)
        w, h, frames_pal = decode_gif_full(bytes(out))
        px, pal = frames_pal[0]
        assert px == bytes([1, 3])
        assert pal[3:6] == bytes((20, 20, 20))  # the LOCAL table
