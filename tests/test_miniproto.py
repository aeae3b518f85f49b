"""Vendored mini-protobuf runtime: wire-format vectors (public spec,
protobuf.dev/programming-guides/encoding/), descriptor parsing, and the
facade executing Spark's real generated StateMessage_pb2 module. The
end-to-end cross-validation against a reference protobuf implementation
is the JVM state server in test_streaming.py::test_user_totals_tws and
the stream_user_totals_tws oracle query."""

import pytest

from dbimport_spark.vendor import miniproto


def _state_message():
    """Import Spark's generated module through the facade (idempotent:
    the facade never shadows a real protobuf install)."""
    from dbimport_spark.vendor import protoshim

    assert protoshim.install()
    from pyspark.sql.streaming.proto import StateMessage_pb2 as sm

    return sm


class TestWire:
    def test_varint_roundtrip_and_spec_vectors(self):
        # spec: 150 encodes as 0x96 0x01
        buf = bytearray()
        miniproto._enc_varint(buf, 150)
        assert bytes(buf) == b"\x96\x01"
        for v in [0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -(2**63)]:
            b = bytearray()
            miniproto._enc_varint(b, v)
            got, pos = miniproto._dec_varint(bytes(b), 0)
            assert pos == len(b)
            assert miniproto._signed(got) == v

    def test_scalar_message_spec_vector(self):
        # spec example: message Test1 { int32 a = 1; } with a=150
        # encodes to 08 96 01
        sm = _state_message()
        msg = sm.StateResponse(statusCode=150)
        assert msg.SerializeToString() == b"\x08\x96\x01"

    def test_string_field_spec_vector(self):
        # spec example: field 2 string "testing" → 12 07 74...67
        sm = _state_message()
        msg = sm.StateResponse(errorMessage="testing")
        assert msg.SerializeToString() == b"\x12\x07testing"

    def test_proto3_defaults_omitted(self):
        sm = _state_message()
        assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""

    def test_negative_int64(self):
        sm = _state_message()
        m = sm.RegisterTimer(expiryTimestampMs=-1)
        data = m.SerializeToString()
        # -1 as 64-bit two's-complement varint: ten 0xFF-ish bytes
        assert data[0] == 0x08 and len(data) == 11
        back = sm.RegisterTimer()
        back.ParseFromString(data)
        assert back.expiryTimestampMs == -1

    def test_oneof_set_clears_siblings(self):
        sm = _state_message()
        r = sm.TimerValueRequest(getProcessingTimer=sm.GetProcessingTime())
        assert r.WhichOneof("method") == "getProcessingTimer"
        r.getWatermark = sm.GetWatermark()
        assert r.WhichOneof("method") == "getWatermark"
        assert not r.HasField("getProcessingTimer")

    def test_empty_submessage_presence_serializes(self):
        sm = _state_message()
        data = sm.ValueStateCall(stateName="s", exists=sm.Exists()).SerializeToString()
        back = sm.ValueStateCall()
        back.ParseFromString(data)
        assert back.HasField("exists") and back.stateName == "s"

    def test_repeated_bytes_and_bool(self):
        sm = _state_message()
        payload = bytes(
            [0x08, 0x07, 0x1A, 0x02, 0x61, 0x62, 0x1A, 0x01, 0x63, 0x20, 0x01]
        )
        r = sm.StateResponseWithListGet()
        r.ParseFromString(payload)
        assert r.statusCode == 7
        assert [bytes(v) for v in r.value] == [b"ab", b"c"]
        assert r.requireNextFetch is True

    def test_repeated_nested_message(self):
        sm = _state_message()
        resp = sm.StateResponseWithTimer(
            statusCode=0,
            timer=[
                sm.TimerInfo(key=b"k1", timestampMs=5),
                sm.TimerInfo(timestampMs=9),
            ],
        )
        back = sm.StateResponseWithTimer()
        back.ParseFromString(resp.SerializeToString())
        assert [(bytes(t.key), t.timestampMs) for t in back.timer] == [
            (b"k1", 5),
            (b"", 9),
        ]

    def test_packed_varint_decode(self):
        # a repeated bool field sent PACKED (wiretype 2) must decode;
        # requireNextFetch is singular, so craft with the repeated-bytes
        # message's field 4 ... use a synthetic descriptor instead
        fd = miniproto.FieldDesc()
        # packed decoding is exercised through MergeFromString on a
        # hand-built message: field 1 repeated int32, packed [3,270]
        import types

        m = miniproto.MessageDesc("P", ".t.P")
        f = miniproto.FieldDesc()
        f.name, f.number, f.type, f.repeated = "xs", 1, 5, True
        m.fields = [f]
        m.by_name = {"xs": f}
        m.by_number = {1: f}
        cls = type("P", (miniproto.MiniMessage,), {"_DESC": m})
        m._cls = cls
        msg = cls()
        msg.ParseFromString(bytes([0x0A, 0x03, 0x03, 0x8E, 0x02]))
        assert list(msg.xs) == [3, 270]

    def test_unknown_fields_skipped(self):
        sm = _state_message()
        # statusCode=1 plus unknown field 15 (varint) and 14 (bytes)
        data = bytes([0x08, 0x01, 0x78, 0x2A, 0x72, 0x02, 0x68, 0x69])
        r = sm.StateResponse()
        r.ParseFromString(data)
        assert r.statusCode == 1

    def test_unknown_attribute_is_loud(self):
        sm = _state_message()
        with pytest.raises(AttributeError):
            sm.StateResponse(nonexistent=1)
        with pytest.raises(AttributeError):
            sm.StateResponse().nonexistent

    def test_top_level_enum_constants(self):
        sm = _state_message()
        assert sm.PRE_INIT == 0 and sm.CLOSED == 5
        assert sm.HandleState.INITIALIZED == 2

    def test_descriptor_parse_shape(self):
        import re

        import pyspark.sql.streaming.proto.StateMessage_pb2 as real

        src = open(real.__file__, "rb").read()
        # the module-level DESCRIPTOR already went through our parser
        # when the facade is active; re-parse to assert the shape
        from dbimport_spark.vendor import protoshim

        assert protoshim.install()
        fd = real.DESCRIPTOR
        assert "StateRequest" in [m.name for m in fd.messages]
        sr = fd.types[f".{fd.package}.StateRequest"]
        assert sr.by_name["version"].number == 1
        assert sr.oneofs == ["method"]


class TestAttachOnWrite:
    """ADVICE r6: reading an unset singular sub-message must hand out a
    child that ATTACHES on first mutation (real protobuf semantics) —
    not a throwaway whose writes are silently lost."""

    def test_write_through_unset_submessage_attaches(self):
        sm = _state_message()
        c = sm.ValueStateCall(stateName="s")
        c.valueStateUpdate.value = b"x"  # was silently lost before r7
        assert c.HasField("valueStateUpdate")
        assert c.WhichOneof("method") == "valueStateUpdate"
        back = sm.ValueStateCall()
        back.ParseFromString(c.SerializeToString())
        assert bytes(back.valueStateUpdate.value) == b"x"
        assert back.stateName == "s"

    def test_attach_clears_oneof_siblings(self):
        sm = _state_message()
        c = sm.ValueStateCall(stateName="s", exists=sm.Exists())
        assert c.WhichOneof("method") == "exists"
        c.valueStateUpdate.value = b"y"
        assert c.WhichOneof("method") == "valueStateUpdate"
        assert not c.HasField("exists")

    def test_unmutated_read_stays_absent(self):
        sm = _state_message()
        c = sm.ValueStateCall()
        _ = c.valueStateUpdate  # read-only peek
        assert not c.HasField("valueStateUpdate")
        assert c.SerializeToString() == b""

    def test_three_level_chain_attaches_to_root(self):
        sm = _state_message()
        req = sm.StateRequest()
        req.stateVariableRequest.valueStateCall.stateName = "deep"
        assert req.HasField("stateVariableRequest")
        assert req.stateVariableRequest.HasField("valueStateCall")
        back = sm.StateRequest()
        back.ParseFromString(req.SerializeToString())
        assert back.stateVariableRequest.valueStateCall.stateName == "deep"


class TestOneofMergeLastWins:
    """ADVICE r6: decoding a oneof member from the wire must evict a
    previously-set sibling — last arm on the wire wins, mirroring
    __setattr__ (and real protobuf MergeFromString)."""

    def test_merge_evicts_preset_sibling(self):
        sm = _state_message()
        c = sm.ValueStateCall(exists=sm.Exists())
        wire = sm.ValueStateCall(
            valueStateUpdate=sm.ValueStateUpdate(value=b"z")
        ).SerializeToString()
        c.MergeFromString(wire)
        assert c.WhichOneof("method") == "valueStateUpdate"
        assert not c.HasField("exists")
        assert bytes(c.valueStateUpdate.value) == b"z"

    def test_two_arms_on_wire_last_wins(self):
        sm = _state_message()
        wire = (
            sm.ValueStateCall(exists=sm.Exists()).SerializeToString()
            + sm.ValueStateCall(
                valueStateUpdate=sm.ValueStateUpdate(value=b"w")
            ).SerializeToString()
        )
        c = sm.ValueStateCall()
        c.ParseFromString(wire)
        assert c.WhichOneof("method") == "valueStateUpdate"
        assert not c.HasField("exists")
