"""TFRecord/tf.Example codec tests: published CRC32C vectors, framing
roundtrip + loud corruption, proto wire-format edges (negative int64
two's-complement varints, packed vs unpacked numeric lists, empty
features), and a hypothesis roundtrip."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dbimport_spark.sources.tfrecord import (
    TfRecordError,
    crc32c,
    dict_to_example,
    example_to_dict,
    read_tfrecords,
    write_tfrecords,
)


def test_crc32c_published_vectors():
    # RFC 3720 appendix / universal check value for CRC-32C
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # all-zeros and all-ones 32-byte vectors from the iSCSI spec
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_framing_roundtrip_including_empty_record():
    recs = [b"alpha", b"", b"x" * 1000]
    blob = write_tfrecords(recs)
    assert read_tfrecords(blob) == recs


@pytest.mark.parametrize("offset_kind", ["header_crc", "data", "truncate"])
def test_framing_corruption_is_loud(offset_kind):
    blob = bytearray(write_tfrecords([b"payload-one", b"payload-two"]))
    if offset_kind == "header_crc":
        blob[8] ^= 1  # first record's length CRC
        with pytest.raises(TfRecordError, match="header CRC"):
            read_tfrecords(bytes(blob))
    elif offset_kind == "data":
        blob[14] ^= 1  # inside first record's payload
        with pytest.raises(TfRecordError, match="data CRC"):
            read_tfrecords(bytes(blob))
    else:
        with pytest.raises(TfRecordError, match="truncated"):
            read_tfrecords(bytes(blob[:-3]))


def test_example_negative_ints_twos_complement():
    ex = dict_to_example({"v": [-1, -(2**62), 2**62, 0]})
    assert example_to_dict(ex)["v"] == [-1, -(2**62), 2**62, 0]


def test_example_mixed_feature_types():
    d = {
        "toks": [b"a", b"bb", b""],
        "ids": [7],
        "w": [0.5, -2.0, 1.25],
        "empty_ints": [],
    }
    back = example_to_dict(dict_to_example(d))
    assert back["toks"] == d["toks"]
    assert back["ids"] == d["ids"]
    assert back["w"] == d["w"]
    assert back["empty_ints"] == []


def test_example_accepts_unpacked_numeric_lists():
    """Producers may emit numeric lists unpacked (one tag per element) —
    wire-legal; hand-assemble such an Example and parse it."""

    def varint(v):
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    def ld(field, payload):
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    # Int64List with UNPACKED varints (field 1, wiretype 0) x2
    int64_list = varint(1 << 3) + varint(5) + varint(1 << 3) + varint(600)
    # FloatList with UNPACKED fixed32 (field 1, wiretype 5)
    f = struct.pack("<f", 2.5)
    float_list = varint((1 << 3) | 5) + f
    feature_i = ld(3, int64_list)
    feature_f = ld(2, float_list)
    entry_i = ld(1, b"ints") + ld(2, feature_i)
    entry_f = ld(1, b"fs") + ld(2, feature_f)
    example = ld(1, ld(1, entry_i) + ld(1, entry_f))
    d = example_to_dict(example)
    assert d["ints"] == [5, 600]
    assert d["fs"] == [2.5]


def test_malformed_proto_is_loud():
    with pytest.raises(TfRecordError, match="no features"):
        example_to_dict(b"")
    with pytest.raises(TfRecordError, match="truncated varint"):
        example_to_dict(b"\x0a\xff")
    # length-delimited field claiming more bytes than exist
    with pytest.raises(TfRecordError, match="overruns"):
        example_to_dict(b"\x0a\x7fshort")


@settings(max_examples=60, deadline=None)
@given(
    st.dictionaries(
        st.text(st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=8),
        st.one_of(
            st.lists(st.binary(max_size=20), max_size=5),
            st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=5),
        ),
        max_size=4,
    )
)
def test_example_roundtrip_property(d):
    """Any bytes/int64 feature dict survives encode→decode exactly.
    (Floats excluded here: f32 quantization makes equality conditional —
    covered by the explicit cases above.)"""
    # normalize: empty lists decode as int64 (the encoder's own default)
    back = example_to_dict(dict_to_example(d))
    assert back == d


def test_tfrecord_interop_crc_layout():
    """The framing must match TensorFlow's byte layout exactly: pin a
    whole known-good record file for the bytes b'abc' (computed from the
    spec: masked crc of length-header and of data)."""
    blob = write_tfrecords([b"abc"])
    length_hdr = struct.pack("<Q", 3)
    assert blob[:8] == length_hdr
    (hcrc,) = struct.unpack_from("<I", blob, 8)
    (dcrc,) = struct.unpack_from("<I", blob, 15)
    def masked(data):
        c = crc32c(data)
        return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert hcrc == masked(length_hdr)
    assert blob[12:15] == b"abc"
    assert dcrc == masked(b"abc")
