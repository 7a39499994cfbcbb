"""Vendored mini protobuf runtime (vendor/miniproto): wire-format and
generated-module-compat checks. The end-to-end proof is
test_streaming.py::test_transform_with_state_converges_to_batch, which
drives the real transformWithStateInPandas state protocol through it."""

from __future__ import annotations

import sys

import pytest

from etl_pipeline_orchestration_spark.streaming.stateful import (
    ensure_protobuf_runtime,
)


@pytest.fixture(scope="module")
def sm():
    ensure_protobuf_runtime()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as mod

    return mod


def test_generated_module_imports_and_builds(sm):
    # message classes, enum wrapper, and bare enum constants all land
    for name in (
        "StateRequest",
        "StateResponse",
        "ValueStateCall",
        "SetHandleState",
        "TTLConfig",
        "HandleState",
    ):
        assert hasattr(sm, name), name
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED) == (0, 1, 2)
    assert (sm.DATA_PROCESSED, sm.TIMER_PROCESSED, sm.CLOSED) == (3, 4, 5)
    assert sm.HandleState.TIMER_PROCESSED == 4


def test_wire_golden_bytes(sm):
    """Known-good proto3 encoding, byte for byte: field tags, varints,
    nested length-delimited framing, empty-message oneof arms."""
    req = sm.StateRequest(
        version=2,
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(
                stateName="counts", exists=sm.Exists()
            )
        ),
    )
    assert req.SerializeToString() == bytes.fromhex(
        "08021a0c0a0a0a06636f756e74731200"
    )


def test_roundtrip_defaults_repeated_negative(sm):
    r = sm.StateResponseWithListGet()
    r.ParseFromString(b"")  # JVM omits zero/default fields
    assert (r.statusCode, r.errorMessage, r.value, r.requireNextFetch) == (
        0,
        "",
        [],
        False,
    )
    src = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"bb", b""], requireNextFetch=True
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(src.SerializeToString())
    assert back.value == [b"a", b"bb", b""]
    assert back.requireNextFetch is True
    # negative int64 → 10-byte varint two's complement
    t = sm.TimerInfo(timestampMs=-5)
    t2 = sm.TimerInfo()
    t2.ParseFromString(t.SerializeToString())
    assert t2.timestampMs == -5
    # repeated message fields
    resp = sm.StateResponseWithTimer(
        timer=[sm.TimerInfo(timestampMs=7), sm.TimerInfo(timestampMs=9)]
    )
    b2 = sm.StateResponseWithTimer()
    b2.ParseFromString(resp.SerializeToString())
    assert [x.timestampMs for x in b2.timer] == [7, 9]


def test_unknown_fields_skipped_and_typos_loud(sm):
    msg = sm.StateResponse()
    # field 99 varint (tag 792 → two-byte varint B8 06) + field 1
    # (statusCode) = 3: unknown field skipped, known one decoded
    msg.ParseFromString(bytes([0xB8, 0x06, 1, 0x08, 3]))
    assert msg.statusCode == 3
    with pytest.raises(AttributeError):
        sm.StateResponse(statuscode=1)  # typo'd field name fails loudly
    with pytest.raises(AttributeError):
        _ = sm.StateResponse().no_such_field


def test_vendor_path_not_injected_when_real_protobuf_present():
    """The shim must never shadow a real protobuf install: when
    google.protobuf is already importable the vendor dir is not
    (re-)inserted at the head of sys.path by a fresh check."""
    import importlib.util

    from etl_pipeline_orchestration_spark.streaming import stateful

    # after ensure_protobuf_runtime() ran, google.protobuf IS importable
    ensure_protobuf_runtime()
    assert importlib.util.find_spec("google.protobuf") is not None
    vendor_hits = [p for p in sys.path if "miniproto" in p]
    assert len(vendor_hits) <= 1  # inserted at most once, ever
    # bookkeeping marks which runtime is active
    assert stateful._MINIPROTO_DIR is None or stateful._MINIPROTO_DIR.endswith(
        "miniproto"
    )


def test_nested_inplace_mutation_persists(sm):
    """ADVICE r6: writing through a lazily-created submessage
    (msg.sub.x = 1) must persist — real protobuf attaches the default
    submessage to its parent on first write. A detached default that
    silently discards the write would corrupt any state client that
    mutates nested messages in place."""
    req = sm.StateRequest()
    req.stateVariableRequest.valueStateCall.stateName = "counts"
    assert req.stateVariableRequest.valueStateCall.stateName == "counts"
    # the whole chain survives a wire round trip
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.stateVariableRequest.valueStateCall.stateName == "counts"


def test_read_of_unset_submessage_does_not_mark_presence(sm):
    """Attach-on-WRITE, not cache-on-read: merely reading an unset
    nested field must not change the serialized bytes (presence), so
    golden wire outputs stay stable under incidental reads."""
    req = sm.StateRequest(version=2)
    before = req.SerializeToString()
    _ = req.stateVariableRequest.valueStateCall.stateName  # read only
    assert req.SerializeToString() == before


def test_detached_submessage_aliasing_and_repeated_append(sm):
    """Review r7: repeated reads of an unset message field must alias
    ONE detached instance (two references must not overwrite each
    other at attach time), and appends to a nested repeated field must
    persist."""
    req = sm.StateRequest()
    a = req.stateVariableRequest
    b = req.stateVariableRequest
    assert a is b  # same detached instance on every read
    a.valueStateCall.stateName = "x"
    assert req.stateVariableRequest.valueStateCall.stateName == "x"
    # nested repeated append persists through the attach chain
    resp = sm.StateResponseWithTimer()
    resp.timer.append(sm.TimerInfo(timestampMs=7))
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [t.timestampMs for t in back.timer] == [7]


def test_parse_into_detached_submessage_marks_presence(sm):
    """Review r7: msg.sub.ParseFromString(data) must attach sub to its
    parent (real protobuf sets presence on parse, even empty)."""
    req = sm.StateRequest()
    req.stateVariableRequest.ParseFromString(b"")
    assert "stateVariableRequest" in req._values
