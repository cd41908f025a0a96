"""Wire-format unit tests for the vendored minimal protobuf runtime
(vendor/google/protobuf) against HAND-COMPUTED byte strings from the
public proto3 wire spec — independent of both the runtime under test
and the JVM. The end-to-end validation (JVM parses our requests, we
parse its responses, state results equal the batch twin) is
tests/test_stateful.py::test_transform_with_state_running_totals_matches_batch.

Skipped wholesale when the REAL protobuf package is installed: then
the vendor dir never enters sys.path (conftest gate) and these
expectations run against Google's runtime anyway via the pb2 module —
still valid, so we keep them running in that case too; only the
mini-runtime-internal checks are gated.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def sm():
    return pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_nested_oneof_request_bytes(sm):
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    # StateRequest.statefulProcessorCall = field 2 (msg) → tag 0x12;
    # StatefulProcessorCall.setHandleState = field 1 → 0x0a;
    # SetHandleState.state = field 1 enum CREATED=1 → 08 01
    assert m.SerializeToString() == bytes.fromhex("12040a020801")


def test_write_through_submessage_chain_registers_presence(sm):
    cmd = sm.StateCallCommand()
    cmd.stateName = "st"
    cmd.schema = "sch"
    cmd.ttl.durationMs = 300
    assert cmd.SerializeToString() == bytes.fromhex(
        "0a0273741203736368220308ac02"
    )


def test_empty_submessage_is_emitted(sm):
    r = sm.ImplicitGroupingKeyRequest(removeImplicitKey=sm.RemoveImplicitKey())
    # oneof arm selection relies on the empty message surviving the wire
    assert r.SerializeToString() == bytes.fromhex("1200")


def test_negative_int64_roundtrip(sm):
    enc = sm.RegisterTimer(expiryTimestampMs=-1).SerializeToString()
    back = sm.RegisterTimer()
    back.ParseFromString(enc)
    assert back.expiryTimestampMs == -1


def test_repeated_bytes_and_default_bool_omitted(sm):
    p = sm.ListStatePut(value=[b"ab", b"cd"], fetchWithArrow=False)
    assert p.SerializeToString() == bytes.fromhex("0a0261620a026364")


def test_parse_repeated_nested_and_unknown_field_skip(sm):
    ti = sm.TimerInfo(key=b"k", timestampMs=5).SerializeToString()
    payload = (bytes([0x1A, len(ti)]) + ti) * 2 + bytes.fromhex("2001")
    resp = sm.StateResponseWithTimer()
    resp.ParseFromString(payload)
    assert resp.statusCode == 0
    assert resp.requireNextFetch is True
    assert [(x.key, x.timestampMs) for x in resp.timer] == [(b"k", 5), (b"k", 5)]

    lr = sm.StateResponseWithListGet()
    # statusCode 0, errorMessage "oo", values a/b, then unknown field 110
    lr.ParseFromString(bytes.fromhex("080012026f6f1a01611a0162f20601ff"))
    assert list(lr.value) == [b"a", b"b"]
    assert lr.errorMessage == "oo"


def test_mini_runtime_internal_varints():
    mini = pytest.importorskip("google.protobuf.internal.mini_runtime")
    buf = bytearray()
    mini.encode_varint(300, buf)
    assert bytes(buf) == bytes.fromhex("ac02")
    v, pos = mini.decode_varint(bytes(buf), 0)
    assert (v, pos) == (300, 2)
    # int64 two's complement sign handling
    buf2 = bytearray()
    mini.encode_varint(-2, buf2)
    v2, _ = mini.decode_varint(bytes(buf2), 0)
    assert mini._zigzag_free_signed(v2) == -2


def test_bare_read_of_unset_fields_does_not_register(sm):
    """Round-5 lazy-view semantics, byte-pinned: merely READING an
    unset sub-message (even chaining into its scalars) or an unset
    repeated field must not register presence — only the set fields
    reach the wire."""
    cmd = sm.StateCallCommand()
    cmd.stateName = "st"
    _ = cmd.ttl
    _ = cmd.ttl.durationMs
    lp = sm.ListStatePut()
    assert list(lp.value) == []
    assert not cmd.HasField("ttl")
    # only stateName (field 1, "st") serializes
    assert cmd.SerializeToString() == bytes.fromhex("0a027374")
    assert lp.SerializeToString() == b""


def test_oneof_set_clears_siblings_on_wire(sm):
    """Round-5 oneof semantics, byte-pinned on StateRequest.method:
    a bare read of another arm never clears the set arm; switching
    arms (here via CopyFrom through the lazy view — a parse IS a
    write) drops the old arm from the wire entirely."""
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020801")
    _ = req.implicitGroupingKeyRequest  # bare read: no clearing
    assert req.SerializeToString() == bytes.fromhex("12040a020801")
    req.implicitGroupingKeyRequest.CopyFrom(
        sm.ImplicitGroupingKeyRequest(removeImplicitKey=sm.RemoveImplicitKey())
    )
    # implicitGroupingKeyRequest = field 4 → tag 0x22, payload "1200";
    # the statefulProcessorCall bytes are GONE (last-set arm wins)
    assert req.SerializeToString() == bytes.fromhex("22021200")
    assert not req.HasField("statefulProcessorCall")
    assert req.HasField("implicitGroupingKeyRequest")
