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


def test_stereo_and_wide_samples_rejected():
    x = np.arange(10, dtype=np.int16)
    blob = bytearray(flac_encode(x, 8000, 1024))
    # STREAMINFO bit layout: 16+16+24+24+20 = 100 bits, so the 3 channel
    # bits sit at mask 0b00001110 of body byte 12 (blob byte 4+4+12)
    byte_at = 4 + 4 + 12
    blob[byte_at] = (blob[byte_at] & 0b11110001) | (1 << 1)  # channels=2
    with pytest.raises(FlacError, match="mono"):
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
