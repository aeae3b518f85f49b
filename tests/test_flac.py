"""From-scratch FLAC codec: bit-exact round-trips, integrity checks are
loud, every subframe type and multi-byte frame numbers exercised."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dbimport_spark.functions.flac import (
    FlacError,
    _BitReader,
    _BitWriter,
    _read_utf8_number,
    _write_utf8_number,
    crc8,
    crc16,
    flac_decode,
    flac_encode,
)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=700),
    st.sampled_from([256, 1024, 4096]),
)
def test_roundtrip_property(samples, block_size):
    x = np.asarray(samples, dtype=np.int16)
    rate, y = flac_decode(flac_encode(x, 44100, block_size))
    assert rate == 44100
    assert y.dtype == np.int16 and (y == x).all()


def test_subframe_types_all_hit():
    # constant, smooth ramp (fixed predictors), full-range noise (verbatim
    # or high-k rice) — all must round-trip exactly
    rng = np.random.default_rng(7)
    cases = {
        "constant": np.full(1000, -12345, dtype=np.int16),
        "ramp": np.arange(-500, 500, dtype=np.int16),
        "sine": (3000 * np.sin(np.arange(3000) / 25)).astype(np.int16),
        "noise": rng.integers(-32768, 32767, size=2000).astype(np.int16),
        "alternating": np.tile([32767, -32768], 500).astype(np.int16),
    }
    for name, x in cases.items():
        _, y = flac_decode(flac_encode(x, 8000, 1024))
        assert (y == x).all(), name


def test_compression_actually_compresses():
    x = (2000 * np.sin(np.arange(20000) / 50)).astype(np.int16)
    blob = flac_encode(x, 8000, 4096)
    assert len(blob) < 0.5 * 2 * x.size  # smooth signal: > 2x smaller


def test_multibyte_frame_numbers():
    # >128 frames forces the UTF-8-style two-byte frame-number coding
    x = np.arange(140 * 256, dtype=np.int64)
    x = (x % 200 - 100).astype(np.int16)
    _, y = flac_decode(flac_encode(x, 8000, 256))
    assert (y == x).all()


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_utf8_number_roundtrip(n):
    w = _BitWriter()
    _write_utf8_number(w, n)
    w.align()
    assert _read_utf8_number(_BitReader(w.getvalue())) == n


def test_crc_tables_match_reference_vectors():
    # CRC-8 poly 0x07 ("123456789" -> 0xF4) and CRC-16/BUYPASS poly
    # 0x8005 init 0 non-reflected ("123456789" -> 0xFEE8) — published
    # check values for these generator polynomials
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_corruption_is_loud():
    x = (1000 * np.sin(np.arange(2000) / 30)).astype(np.int16)
    blob = flac_encode(x, 8000, 1024)

    with pytest.raises(FlacError, match="not a FLAC"):
        flac_decode(b"fLaX" + blob[4:])
    with pytest.raises(FlacError):
        flac_decode(blob[:-7])  # truncated final frame

    # flip one payload byte mid-frame: CRC-16 (or header CRC-8 / MD5)
    # must catch it — never a quiet wrong answer
    for at in (len(blob) // 2, len(blob) - 20):
        bad = bytearray(blob)
        bad[at] ^= 0x40
        with pytest.raises(FlacError):
            flac_decode(bytes(bad))

    # corrupt the embedded MD5: samples decode fine but the stream-level
    # integrity check fires
    bad = bytearray(blob)
    md5_at = blob.index(b"\xff\xf8") - 16  # last 16 bytes of STREAMINFO
    bad[md5_at] ^= 0xFF
    with pytest.raises(FlacError, match="MD5"):
        flac_decode(bytes(bad))


def test_multichannel_beyond_stereo_rejected():
    x = np.arange(10, dtype=np.int16)
    blob = bytearray(flac_encode(x, 8000, 1024))
    # STREAMINFO bit layout: 16+16+24+24+20 = 100 bits, so the 3 channel
    # bits sit at mask 0b00001110 of body byte 12 (blob byte 4+4+12)
    byte_at = 4 + 4 + 12
    blob[byte_at] = (blob[byte_at] & 0b11110001) | (2 << 1)  # channels=3
    with pytest.raises(FlacError, match="mono/stereo"):
        flac_decode(bytes(blob))


def test_encode_validates_inputs():
    with pytest.raises(FlacError, match="empty"):
        flac_encode([], 8000)
    with pytest.raises(FlacError, match="block size"):
        flac_encode([1, 2], 8000, block_size=1000)


def test_lpc_subframes_win_on_correlated_signals_and_stay_lossless():
    rng = np.random.default_rng(0)
    t = np.arange(20000)
    x = (
        8000 * np.sin(t / 100) + 2000 * np.sin(t / 13) + rng.normal(0, 30, t.size)
    ).astype(np.int16)
    blob_lpc = flac_encode(x, 8000, 4096, use_lpc=True)
    blob_fix = flac_encode(x, 8000, 4096, use_lpc=False)
    # the quantized-integer LPC predictor must (a) be chosen when it is
    # cheaper, (b) never cost losslessness
    assert len(blob_lpc) < len(blob_fix)
    _, y = flac_decode(blob_lpc)
    assert (y == x).all()
    _, y2 = flac_decode(blob_fix)
    assert (y2 == x).all()


class TestStereo:
    """Stereo FLAC: mid/side decorrelation (17-bit side channel) chosen
    against independent coding by actual size; all three decorrelated
    channel assignments decode."""

    def test_stereo_roundtrip_correlated_and_noise(self):
        rng = np.random.default_rng(0)
        t = np.arange(8000)
        l = (6000 * np.sin(t / 60) + rng.normal(0, 40, t.size)).astype(np.int16)
        r = (
            (l.astype(np.int32) + rng.integers(-60, 60, t.size))
            .clip(-32768, 32767)
            .astype(np.int16)
        )
        st = np.stack([l, r], axis=1)
        rate, y = flac_decode(flac_encode(st, 44100, 1024))
        assert rate == 44100 and y.shape == st.shape and (y == st).all()
        noise = rng.integers(-32768, 32767, (3000, 2)).astype(np.int16)
        _, y2 = flac_decode(flac_encode(noise, 8000, 256))
        assert (y2 == noise).all()

    def test_midside_actually_engages_and_wins(self):
        # identical channels: side ≡ 0 (one CONSTANT subframe), so
        # mid/side must cost barely more than mono while independent
        # coding would pay for the sine twice
        l = (5000 * np.sin(np.arange(6000) / 50)).astype(np.int16)
        st = np.stack([l, l], axis=1)
        blob = flac_encode(st, 8000, 1024)
        mono = flac_encode(l, 8000, 1024)
        assert len(blob) < 1.25 * len(mono), (len(blob), len(mono))
        _, y = flac_decode(blob)
        assert (y == st).all()

    def test_left_side_and_right_side_assignments_decode(self):
        # hand-build frames with ch_code 0b1000 (left/side) and 0b1001
        # (right/side) — our encoder never emits them, real encoders do
        import dbimport_spark.functions.flac as FL

        rng = np.random.default_rng(2)
        l = rng.integers(-1000, 1000, 256).astype(np.int64)
        r = rng.integers(-1000, 1000, 256).astype(np.int64)
        side = l - r
        md5 = __import__("hashlib").md5(
            np.stack([l, r], axis=1).astype("<i2").tobytes()
        ).digest()
        for ch_code, blks, bits in [
            (0b1000, [l, side], (16, 17)),
            (0b1001, [side, r], (17, 16)),
        ]:
            frame = FL._encode_frame(
                blks, 0, 256, 8000, True, ch_code=ch_code, side_bits=bits
            )
            streaminfo = FL._pack_streaminfo(256, 8000, 16, 256, md5, channels=2)
            blob = (
                b"fLaC"
                + __import__("struct").pack(">I", (1 << 31) | len(streaminfo))
                + streaminfo
                + frame
            )
            rate, y = flac_decode(blob)
            assert (y[:, 0] == l).all() and (y[:, 1] == r).all(), bin(ch_code)

    def test_bad_channel_shapes_rejected(self):
        with pytest.raises(FlacError, match="stereo"):
            flac_encode(np.zeros((4, 3), dtype=np.int16), 8000)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-32768, 32767), st.integers(-32768, 32767)),
        min_size=1,
        max_size=400,
    ),
    st.sampled_from([256, 1024]),
)
def test_stereo_roundtrip_property(pairs, block_size):
    x = np.asarray(pairs, dtype=np.int16)
    rate, y = flac_decode(flac_encode(x, 22050, block_size))
    assert rate == 22050 and y.shape == x.shape and (y == x).all()
