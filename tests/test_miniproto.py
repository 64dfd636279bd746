"""Unit tests for the vendored mini-protobuf runtime (_vendor/miniproto).

The shim carries pyspark's transformWithStateInPandas state-server protocol
when the real protobuf package is absent, so its wire encoding must be
byte-exact against the PUBLIC protobuf spec. Golden vectors here are
hand-derived from https://protobuf.dev/programming-guides/encoding/ (varint
tags, length-delimited nesting); the independent re-encoder in
test_wire_roundtrip_property cross-checks serialization without reusing the
shim's own writer.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rugpull_data_pipeline_spark._vendor import ensure_protobuf

ensure_protobuf()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402
from google.protobuf.internal import _mini_runtime as rt  # noqa: E402


# ---------------------------------------------------------------------------
# Golden wire vectors (hand-derived from the public encoding spec)
# ---------------------------------------------------------------------------


def test_golden_set_handle_state():
    # StateRequest.statefulProcessorCall (field 2, LEN) wrapping
    # StatefulProcessorCall.setHandleState (field 1, LEN) wrapping
    # SetHandleState.state = INITIALIZED(2) (field 1, varint).
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020802")


def test_golden_default_enum_value_is_skipped():
    # proto3: state = PRE_INIT(0) is the default -> empty SetHandleState
    # payload; the enclosing LEN fields still mark the oneof choice.
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.PRE_INIT)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12020a00")


def test_golden_string_and_int64():
    # ExpiryTimerRequest{iteratorId="ab" (field 1, LEN), expiryTimestampMs=300
    # (field 2, varint 0xAC 0x02)}
    msg = sm.ExpiryTimerRequest(iteratorId="ab", expiryTimestampMs=300)
    assert msg.SerializeToString() == bytes.fromhex("0a026162" + "10ac02")


def test_golden_repeated_bytes():
    # ListStatePut.value = [b"a", b"bb"] -> two LEN fields number 1;
    # fetchWithArrow False is default -> omitted.
    msg = sm.ListStatePut(value=[b"a", b"bb"], fetchWithArrow=False)
    assert msg.SerializeToString() == bytes.fromhex("0a0161" + "0a026262")


def test_golden_negative_int64_ten_bytes():
    # value = -1 on an int64 field -> 64-bit two's complement varint
    # (10 bytes of 0xFF... then 0x01).
    msg = sm.StateResponseWithLongTypeVal(value=-1)
    assert msg.SerializeToString() == bytes.fromhex("18" + "ff" * 9 + "01")
    back = sm.StateResponseWithLongTypeVal()
    back.ParseFromString(msg.SerializeToString())
    assert back.value == -1


def test_nested_vivify_and_roundtrip():
    cmd = sm.StateCallCommand()
    cmd.stateName = "st"
    cmd.schema = '{"fields":[]}'
    cmd.ttl.durationMs = 5000
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    got = back.statefulProcessorCall.getValueState
    assert got.stateName == "st"
    assert got.schema == '{"fields":[]}'
    assert got.ttl.durationMs == 5000
    # unset scalar on a parsed message -> proto3 default
    assert got.mapStateValueSchema == ""


def test_oneof_assignment_clears_siblings():
    call = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    assert call.WhichOneof("method") == "exists"
    call.get.SerializeToString()  # vivify 'get' -> switches the oneof
    assert call.WhichOneof("method") == "get"
    assert not call.HasField("exists")


def test_repeated_message_field():
    resp = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    assert back.requireNextFetch is True
    assert back.statusCode == 0 and back.errorMessage == ""


def test_singular_message_repeated_on_wire_merges():
    # Spec: a non-repeated embedded message appearing twice on the wire
    # MERGES occurrences (round-9 ADVICE — replace semantics dropped the
    # first fragment's scalars). Two ValueStateCall fragments, one
    # carrying stateName, the other carrying the get sub-message: the
    # merged parse must keep BOTH.
    frag1 = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(stateName="prices")
        )
    ).SerializeToString()
    frag2 = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(get=sm.Get())
        )
    ).SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(frag1 + frag2)
    call = back.stateVariableRequest.valueStateCall
    assert call.stateName == "prices"
    assert call.HasField("get")


def test_unknown_fields_are_skipped():
    # Field 15 (varint) does not exist on StateResponse; parser must skip it
    # and still read the known fields after it.
    payload = bytes.fromhex("7807") + sm.StateResponse(
        statusCode=3, errorMessage="boom"
    ).SerializeToString()
    back = sm.StateResponse()
    back.ParseFromString(payload)
    assert back.statusCode == 3 and back.errorMessage == "boom"


def test_module_level_enum_constants():
    assert sm.PRE_INIT == 0
    assert sm.CREATED == 1
    assert sm.INITIALIZED == 2
    assert sm.DATA_PROCESSED == 3
    assert sm.TIMER_PROCESSED == 4
    assert sm.CLOSED == 5
    assert sm.HandleState.Name(4) == "TIMER_PROCESSED"
    assert sm.HandleState.Value("CLOSED") == 5


def test_descriptor_parsing_matches_proto():
    # Spot-check the parsed FileDescriptorProto against the public
    # StateMessage.proto shape: field numbers, labels, oneof wiring.
    desc = sm.StateRequest.DESCRIPTOR
    assert desc.fields_by_name["version"].number == 1
    assert desc.fields_by_name["timerRequest"].number == 5
    assert [o.name for o in desc.oneofs] == ["method"]
    assert all(
        f.oneof_index == 0
        for f in desc.fields
        if f.name != "version"
    )
    lsc = sm.ListStateCall.DESCRIPTOR
    assert lsc.fields_by_name["clear"].number == 7
    pair = sm.KeyAndValuePair.DESCRIPTOR
    assert pair.fields_by_name["key"].type == rt.T_BYTES
    timer = sm.TimerInfo.DESCRIPTOR
    assert timer.fields_by_name["key"].proto3_optional


# ---------------------------------------------------------------------------
# Independent re-encoder cross-check (property-based)
# ---------------------------------------------------------------------------


def _ref_varint(v: int) -> bytes:
    if v < 0:
        v &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _ref_len(num: int, payload: bytes) -> bytes:
    return _ref_varint((num << 3) | 2) + _ref_varint(len(payload)) + payload


@settings(max_examples=200, deadline=None)
@given(
    status=st.integers(min_value=-(2**31), max_value=2**31 - 1),
    err=st.text(max_size=40),
    values=st.lists(st.binary(max_size=24), max_size=6),
    fetch=st.booleans(),
)
def test_wire_roundtrip_property(status, err, values, fetch):
    """Shim encoding == an independent minimal encoder, and parse(encode(x))
    restores every field, over randomized StateResponseWithListGet values."""
    msg = sm.StateResponseWithListGet(
        statusCode=status, errorMessage=err, value=values, requireNextFetch=fetch
    )
    got = msg.SerializeToString()

    expect = bytearray()
    if status != 0:
        expect += _ref_varint(1 << 3) + _ref_varint(status)
    if err:
        expect += _ref_len(2, err.encode("utf-8"))
    for v in values:
        expect += _ref_len(3, v)
    if fetch:
        expect += _ref_varint(4 << 3) + _ref_varint(1)
    assert got == bytes(expect)

    back = sm.StateResponseWithListGet()
    back.ParseFromString(got)
    assert back.statusCode == status
    assert back.errorMessage == err
    assert list(back.value) == values
    assert back.requireNextFetch is fetch


@settings(max_examples=100, deadline=None)
@given(ms=st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_int64_roundtrip_full_range(ms):
    msg = sm.TimerInfo(timestampMs=ms)
    back = sm.TimerInfo()
    back.ParseFromString(msg.SerializeToString())
    assert back.timestampMs == ms


def test_unknown_field_name_raises():
    with pytest.raises(AttributeError):
        sm.StateResponse(nonexistent=1)
    msg = sm.StateResponse()
    with pytest.raises(AttributeError):
        msg.nonexistent = 1
