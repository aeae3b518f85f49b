"""Differential validation of the from-scratch RFC 8878 zstd decoder
against the reference implementation (pyarrow bundles libzstd), plus
format-edge and robustness vectors. No Spark session needed."""

import random

import pyarrow as pa
import pytest

from dbimport_spark.sources.zstd import (
    ZstdError,
    frame_content_size,
    zstd_decompress,
    zstd_decompress_auto,
)

random.seed(20260815)
_WORDS = [w.encode() for w in
          "a an the of to in on at by for with data row key value spark".split()]


def _rnd(n):
    return bytes(random.getrandbits(8) for _ in range(n))


CORPORA = {
    "empty": b"",
    "one_byte": b"a",
    "rle_long": b"x" * 50_000,
    "text": b" ".join(random.choice(_WORDS) for _ in range(20_000)),
    "repetitive": b"abcdefgh" * 5_000,
    "random": _rnd(8_192),
    "json_like": b"".join(
        b'{"id":%d,"name":"user%d","flag":%s}\n'
        % (i, i % 97, b"true" if i % 2 else b"false")
        for i in range(5_000)
    ),
    "mixed": b"".join(
        random.choice(_WORDS) + (_rnd(3) if random.random() < 0.1 else b" ")
        for _ in range(30_000)
    ),
    "multi_block": b" ".join(random.choice(_WORDS) for _ in range(120_000)),
}


@pytest.mark.parametrize("level", [1, 3, 9, 19])
@pytest.mark.parametrize("name", sorted(CORPORA))
def test_differential_vs_libzstd(level, name):
    raw = CORPORA[name]
    comp = bytes(pa.Codec("zstd", compression_level=level).compress(raw))
    assert zstd_decompress(comp) == raw


def test_multi_frame_and_skippable():
    c = pa.Codec("zstd")
    f1 = bytes(c.compress(b"hello "))
    f2 = bytes(c.compress(b"world"))
    skip = (
        (0x184D2A50).to_bytes(4, "little")
        + (5).to_bytes(4, "little")
        + b"xxxxx"
    )
    assert zstd_decompress(f1 + skip + f2) == b"hello world"


def test_empty_stream_decodes_empty():
    assert zstd_decompress(b"") == b""


@pytest.mark.parametrize("mangle", ["bad_magic", "trunc_tail", "trunc_head",
                                    "garbage_header", "partial_magic"])
def test_corrupt_inputs_raise_zstderror(mangle):
    f1 = bytes(pa.Codec("zstd").compress(b"hello "))
    bad = {
        "bad_magic": b"\x00\x01\x02\x03",
        "trunc_tail": f1[:-2],
        "trunc_head": f1[:5],
        "garbage_header": b"\x28\xb5\x2f\xfd" + b"\xff" * 8,
        "partial_magic": f1 + b"\x28",
    }[mangle]
    with pytest.raises(ZstdError):
        zstd_decompress(bad)


def test_bitflip_fuzz_never_hangs_or_leaks_other_exceptions():
    base = bytes(
        pa.Codec("zstd", compression_level=9).compress(
            b"the quick brown fox " * 500
        )
    )
    rng = random.Random(1)
    for _ in range(150):
        b = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            zstd_decompress(bytes(b))  # differing output is fine (no
            # checksum verification); only ZstdError may escape
        except ZstdError:
            pass


def test_dictionary_frames_rejected():
    # hand-build a header declaring Dictionary_ID = 7 (1-byte did field)
    hdr = (0xFD2FB528).to_bytes(4, "little") + bytes([0x01, 0x00, 0x07])
    with pytest.raises(ZstdError, match="dictionar"):
        zstd_decompress(hdr + b"\x01\x00\x00")


def test_content_size_probe_and_auto_path():
    raw = b"payload " * 1000
    comp = bytes(pa.Codec("zstd").compress(raw))
    fcs = frame_content_size(comp)
    assert fcs is None or fcs == len(raw)
    assert zstd_decompress_auto(comp) == raw


def test_fcs_mismatch_detected():
    raw = b"q" * 300
    comp = bytearray(pa.Codec("zstd").compress(raw))
    fcs = frame_content_size(bytes(comp))
    if fcs is None:
        pytest.skip("encoder emitted a streaming frame without FCS")
    # corrupt the declared size field (byte 5 for single-segment 1-byte FCS
    # is format-dependent; instead append a raw bogus frame is complex —
    # simply check the decoder enforces the declared size on a crafted
    # single-segment frame: magic + fhd(single, fcs1=200) + raw block "ab"
    crafted = (
        (0xFD2FB528).to_bytes(4, "little")
        + bytes([0x20, 200])          # single-segment, FCS = 200
        + bytes([(2 << 3) | 1, 0, 0]) # last raw block, size 2
        + b"ab"
    )
    with pytest.raises(ZstdError, match="content size"):
        zstd_decompress(crafted)


def test_envelope_integration(tmp_path):
    from dbimport_spark.sources.compression import (
        decompress_if_needed,
        detect_format,
    )

    text = b"a;b\n1;x\n2;y\n"
    p = tmp_path / "t.csv.zst"
    p.write_bytes(bytes(pa.Codec("zstd", compression_level=19).compress(text)))
    out = decompress_if_needed(str(p), for_spark_text_reader=True)
    assert out.endswith("t.csv")
    with open(out, "rb") as fh:
        assert fh.read() == text
    assert detect_format("data.csv.zst") == "csv"
