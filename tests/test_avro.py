"""Tests for the from-scratch Avro object-container codec.

Zigzag-varint vectors come from the Avro specification's encoding table
(https://avro.apache.org/docs/1.11.1/specification/ — "the value is
encoded as long using variable-length zig-zag coding")."""

import io
import math

import pytest

from dbimport_spark.sources.avro import (
    MAGIC,
    _zigzag_decode,
    _zigzag_encode,
    read_container,
    write_container,
)

# (value, encoded bytes) straight from the spec's example table.
SPEC_VECTORS = [
    (0, b"\x00"),
    (-1, b"\x01"),
    (1, b"\x02"),
    (-2, b"\x03"),
    (2, b"\x04"),
    (-64, b"\x7f"),
    (64, b"\x80\x01"),
    (-65, b"\x81\x01"),
    (65, b"\x82\x01"),
]


@pytest.mark.parametrize("value,enc", SPEC_VECTORS)
def test_zigzag_spec_vectors(value, enc):
    assert _zigzag_encode(value) == enc
    assert _zigzag_decode(io.BytesIO(enc)) == value


def test_zigzag_int64_extremes():
    for v in (2**63 - 1, -(2**63), 123456789012345, -987654321098765):
        assert _zigzag_decode(io.BytesIO(_zigzag_encode(v))) == v


FIELDS = [
    ("k", "long", False),
    ("name", "string", True),
    ("score", "double", False),
    ("blob", "bytes", True),
    ("flag", "boolean", False),
]

ROWS = [
    (1, "alpha", 1.5, b"\x00\xff", True),
    (-7, None, -0.25, None, False),
    (2**40, "ünïcodé 中文", math.pi, b"", True),
    (0, "", float("inf"), b"\x01" * 300, False),
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    blob = write_container(ROWS, FIELDS, codec=codec, rows_per_block=3)
    assert blob[:4] == MAGIC
    fields, rows = read_container(blob)
    assert fields == FIELDS
    assert rows == ROWS


def test_container_multi_block_boundaries():
    rows = [(i, f"r{i}", i * 0.5, None, i % 2 == 0) for i in range(1000)]
    blob = write_container(rows, FIELDS, codec="deflate", rows_per_block=64)
    _, back = read_container(blob)
    assert back == rows


def test_corrupt_sync_detected():
    blob = bytearray(write_container(ROWS, FIELDS, codec="null"))
    blob[-1] ^= 0xFF  # flip last sync byte
    with pytest.raises(ValueError, match="sync"):
        read_container(bytes(blob))


def test_nan_double_roundtrip():
    rows = [(1, None, float("nan"), None, True)]
    _, back = read_container(write_container(rows, FIELDS, codec="null"))
    assert math.isnan(back[0][2])


def test_spark_write_read_roundtrip(spark, tmp_path):
    from dbimport_spark.sources.avro import read_avro_dir, write_avro_dir

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, None, -2.5), (3, "チ", 0.0)],
        "id bigint, s string, v double",
    ).repartition(2)
    path = str(tmp_path / "avro_rt")
    write_avro_dir(df, path, codec="deflate")
    back = read_avro_dir(spark, path, "id bigint, s string, v double")
    got = sorted((r["id"], r["s"], r["v"]) for r in back.collect())
    assert got == [(1, "a", 1.0), (2, None, -2.5), (3, "チ", 0.0)]


# ------------------------------------------------------------------ WAV


class TestWavCodec:
    def test_roundtrip_and_stdlib_cross_check(self):
        import io
        import wave as stdwave

        import numpy as np

        from dbimport_spark.functions.wav import decode_wav, encode_wav

        samples = [0, 1, -1, 32767, -32768, 12345, -12345]
        blob = encode_wav(samples, sample_rate=44100)
        rate, ch, pcm = decode_wav(blob)
        assert (rate, ch) == (44100, 1)
        assert pcm.tolist() == samples
        # stdlib wave must accept our bytes and agree on every field
        w = stdwave.open(io.BytesIO(blob))
        assert w.getframerate() == 44100
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        got = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        assert got.tolist() == samples

    def test_decode_stdlib_written_file(self):
        import io
        import wave as stdwave

        import numpy as np

        from dbimport_spark.functions.wav import decode_wav

        buf = io.BytesIO()
        w = stdwave.open(buf, "wb")
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        frames = np.asarray([10, -10, 300, -300], dtype="<i2")
        w.writeframes(frames.tobytes())
        w.close()
        rate, ch, pcm = decode_wav(buf.getvalue())
        assert (rate, ch) == (16000, 2)
        assert pcm.tolist() == frames.tolist()

    def test_unknown_chunks_skipped(self):
        import struct

        from dbimport_spark.functions.wav import decode_wav, encode_wav

        blob = bytearray(encode_wav([5, -5], sample_rate=8000))
        # splice a LIST chunk between fmt and data (fmt ends at 12+8+16)
        insert_at = 12 + 8 + 16
        extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
        blob2 = bytes(blob[:insert_at]) + extra + bytes(blob[insert_at:])
        rate, ch, pcm = decode_wav(blob2)
        assert pcm.tolist() == [5, -5]

    def test_malformed_rejected(self):
        import pytest as _pytest

        from dbimport_spark.functions.wav import decode_wav, encode_wav

        with _pytest.raises(ValueError, match="RIFF"):
            decode_wav(b"nope")
        blob = bytearray(encode_wav([1, 2, 3]))
        blob[20] = 3  # format tag -> IEEE float (unsupported)
        with _pytest.raises(ValueError, match="unsupported"):
            decode_wav(bytes(blob))
        with _pytest.raises(ValueError, match="truncated"):
            decode_wav(bytes(bytearray(encode_wav([1] * 100))[:-10]))


class TestG711:
    """G.711 μ-law/A-law companded audio (ITU-T G.711 segment formulas)."""

    def test_code_identity_all_256(self):
        # each code decodes to its reconstruction level, which compresses
        # back to the same code — for every code except μ-law 0x7F, the
        # spec's "negative zero" (decodes to 0; the canonical encoder maps
        # 0 to positive-zero 0xFF).
        import numpy as np

        from dbimport_spark.functions.wav import g711_decode, g711_encode

        codes = np.arange(256, dtype=np.uint8)
        for law, exceptions in (("mu", {0x7F}), ("a", set())):
            re = np.frombuffer(g711_encode(g711_decode(codes.tobytes(), law), law), np.uint8)
            mismatch = set(np.nonzero(re != codes)[0].tolist())
            assert mismatch == exceptions, (law, mismatch)

    def test_known_extremes_and_zero(self):
        import numpy as np

        from dbimport_spark.functions.wav import g711_decode, g711_encode

        # published extremes: mu +/-32124, A +/-32256 (13-bit x 16 scale)
        mu = g711_decode(bytes(range(256)), "mu")
        al = g711_decode(bytes(range(256)), "a")
        assert (int(mu.min()), int(mu.max())) == (-32124, 32124)
        assert (int(al.min()), int(al.max())) == (-32256, 32256)
        # mu-law zero: code 0xFF decodes to 0; encoding 0 yields 0xFF
        assert int(mu[0xFF]) == 0
        assert g711_encode(np.array([0], dtype=np.int16), "mu") == b"\xff"

    def test_quantization_error_bound(self):
        # compress->expand error is bounded by half the top-segment step:
        # mu 128/2 x 8 = 512... the published worst-case relative error is
        # what matters; assert the absolute bound per segment instead.
        import numpy as np

        from dbimport_spark.functions.wav import g711_decode, g711_encode

        rng = np.random.default_rng(5)
        x = rng.integers(-32124, 32124, size=20000).astype(np.int16)
        for law, step in (("mu", 1024), ("a", 1024)):
            y = g711_decode(g711_encode(x, law), law)
            err = np.abs(x.astype(np.int32) - y.astype(np.int32))
            # worst step: top segment quantum (mu: 256*8/2=1024; A: 1024)
            assert int(err.max()) <= step, (law, int(err.max()))

    def test_wav_container_g711_roundtrip(self):
        import numpy as np

        from dbimport_spark.functions.wav import (
            decode_wav,
            encode_wav_g711,
            g711_decode,
        )

        codes = bytes(range(256)) + b"\x01\x02\x03"  # odd data size
        for law in ("mu", "a"):
            rate, ch, pcm = decode_wav(encode_wav_g711(codes, law, 16000))
            assert (rate, ch, len(pcm)) == (16000, 1, 259)
            assert (pcm == g711_decode(codes, law)).all()

    def test_unknown_law_and_bad_tag_loud(self):
        import struct

        import pytest as _pytest

        from dbimport_spark.functions.wav import decode_wav, encode_wav_g711

        with _pytest.raises(ValueError, match="unknown companding law"):
            encode_wav_g711(b"\x00", "gsm")
        blob = bytearray(encode_wav_g711(b"\x00\x01", "mu", 8000))
        at = bytes(blob).index(b"fmt ") + 8
        struct.pack_into("<H", blob, at, 2)  # tag 2 = ADPCM, unsupported
        with _pytest.raises(ValueError, match="unsupported WAV encoding"):
            decode_wav(bytes(blob))


class TestAdpcm:
    """IMA/DVI ADPCM (format tag 0x11): block-vectorized decoder vs a
    straight scalar transcription of the published pseudocode, encoder
    round-trip error bounds, container fidelity, loud failures."""

    @staticmethod
    def _scalar_decode(data: bytes, block_align: int):
        # independent reference: per-sample transcription of the IMA
        # recommendation's decoder pseudocode (no numpy vector tricks)
        import struct

        from dbimport_spark.functions.wav import ADPCM_STEPS

        adj = [-1, -1, -1, -1, 2, 4, 6, 8]
        out = []
        for off in range(0, len(data), block_align):
            block = data[off : off + block_align]
            pred, idx, _ = struct.unpack_from("<hBB", block, 0)
            out.append(pred)
            for byte in block[4:]:
                for nib in (byte & 0x0F, byte >> 4):
                    step = int(ADPCM_STEPS[idx])
                    diff = step >> 3
                    if nib & 4:
                        diff += step
                    if nib & 2:
                        diff += step >> 1
                    if nib & 1:
                        diff += step >> 2
                    pred = pred - diff if nib & 8 else pred + diff
                    pred = max(-32768, min(32767, pred))
                    idx = max(0, min(88, idx + adj[nib & 7]))
                    out.append(pred)
        return out

    def test_vectorized_decoder_matches_scalar_reference(self):
        import numpy as np

        from dbimport_spark.functions.wav import adpcm_decode

        rng = np.random.default_rng(11)
        for ba in (12, 64, 256):
            n_blocks = 7
            raw = rng.integers(0, 256, size=n_blocks * ba, dtype=np.uint8)
            raw = raw.reshape(n_blocks, ba)
            raw[:, 2] = rng.integers(0, 89, size=n_blocks)  # valid indexes
            raw[:, 3] = 0
            data = raw.tobytes()
            assert adpcm_decode(data, ba).tolist() == self._scalar_decode(data, ba)

    def test_encode_decode_error_bounded_by_step(self):
        # closed-loop quantizer: per-sample error is bounded by the step
        # size active at that sample (the quantizer's cell width); for a
        # smooth signal the step tracks the derivative and stays small.
        import numpy as np

        from dbimport_spark.functions.wav import adpcm_decode, adpcm_encode

        t = np.arange(4003)
        x = (3000 * np.sin(t / 50) + 500 * np.sin(t / 7)).astype(np.int16)
        data, n = adpcm_encode(x, block_align=256)
        y = adpcm_decode(data, 256, n)
        err = np.abs(x.astype(np.int32) - y.astype(np.int32))
        assert n == x.size and y.size == x.size
        # derivative <= ~131/sample -> adapted step stays in the low
        # hundreds; allow the adaptation transient at block boundaries
        assert int(err.max()) <= 1000, int(err.max())
        assert float(err.mean()) <= 60, float(err.mean())

    def test_block_independence_matches_concat(self):
        # each block's header restates the full codec state, so decoding
        # the stream equals decoding each block alone (what makes the
        # across-blocks vectorization + distributed chunking sound)
        import numpy as np

        from dbimport_spark.functions.wav import adpcm_decode, adpcm_encode

        rng = np.random.default_rng(3)
        x = rng.integers(-20000, 20000, size=1000).astype(np.int16)
        data, n = adpcm_encode(x, block_align=32)
        whole = adpcm_decode(data, 32)
        parts = [
            adpcm_decode(data[off : off + 32], 32)
            for off in range(0, len(data), 32)
        ]
        assert whole.tolist() == np.concatenate(parts).tolist()

    def test_wav_container_fact_trims_padding(self):
        import numpy as np

        from dbimport_spark.functions.wav import (
            adpcm_encode,
            decode_wav,
            encode_wav_adpcm,
        )

        x = np.arange(-300, 301, dtype=np.int16)  # 601 samples, partial block
        data, n = adpcm_encode(x, block_align=64)
        rate, ch, pcm = decode_wav(encode_wav_adpcm(data, n, 64, 16000))
        assert (rate, ch, pcm.size) == (16000, 1, 601)
        err = np.abs(x.astype(np.int32) - pcm.astype(np.int32))
        assert int(err.max()) <= 16  # ramp of slope 1: minimal steps

    def test_malformed_is_loud(self):
        import numpy as np
        import pytest as _pytest
        import struct

        from dbimport_spark.functions.wav import (
            adpcm_decode,
            adpcm_encode,
            decode_wav,
            encode_wav_adpcm,
        )

        with _pytest.raises(ValueError, match="multiple of block_align"):
            adpcm_decode(b"\x00" * 65, 64)
        with _pytest.raises(ValueError, match="too small"):
            adpcm_decode(b"\x00" * 7, 7)
        bad = bytearray(b"\x00" * 64)
        bad[2] = 90  # step index out of range
        with _pytest.raises(ValueError, match="step index"):
            adpcm_decode(bytes(bad), 64)
        with _pytest.raises(ValueError, match="more samples"):
            adpcm_decode(b"\x00" * 64, 64, n_samples=200)
        with _pytest.raises(ValueError, match="empty"):
            adpcm_encode([], 64)
        # stereo flag in the container is rejected loudly
        data, n = adpcm_encode(np.arange(10, dtype=np.int16), 64)
        blob = bytearray(encode_wav_adpcm(data, n, 64))
        at = bytes(blob).index(b"fmt ") + 8 + 2
        struct.pack_into("<H", blob, at, 2)  # nChannels = 2
        with _pytest.raises(ValueError, match="mono"):
            decode_wav(bytes(blob))
