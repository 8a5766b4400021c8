"""Vendored minimal protobuf runtime (_vendor/protoshim): wire-format
properties, generated-module loading, and the live-path availability gate.

The shim exists so transformWithStateInPandas (qs07) can run where no
google.protobuf distribution is installed; the JVM interop itself is
covered by the live streaming test (tests/test_streaming.py). These tests
pin the codec against the public wire-format spec so a regression fails
here with a pointer instead of as a hung state server."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from highs_duckdb_spark.streaming.protoshim import enable_protoshim

pytestmark = pytest.mark.skipif(
    not enable_protoshim(), reason="no protobuf runtime (real or shim)"
)


def _sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def _rt():
    from google.protobuf import _shim_runtime as rt

    return rt


def test_generated_module_loads_and_exports():
    sm = _sm()
    # top-level messages, enum wrapper, and proto3 enum value constants
    assert sm.StateRequest and sm.StateResponse and sm.KeyAndValuePair
    assert sm.HandleState.Value("INITIALIZED") == sm.INITIALIZED
    assert sm.HandleState.Name(sm.CLOSED) == "CLOSED"


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
def test_varint_roundtrip(v):
    rt = _rt()
    out = bytearray()
    rt.encode_varint(out, v)
    got, pos = rt.decode_varint(bytes(out), 0)
    assert got == v and pos == len(out)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1))
def test_int64_field_roundtrip(v):
    sm = _sm()
    t = sm.TimerInfo(timestampMs=v)
    back = sm.TimerInfo.FromString(t.SerializeToString())
    assert back.timestampMs == v


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=64), st.binary(max_size=64))
def test_repeated_bytes_and_message_roundtrip(a, b):
    sm = _sm()
    r = sm.StateResponseWithMapIterator(
        statusCode=3,
        kvPair=[sm.KeyAndValuePair(key=a, value=b)],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithMapIterator.FromString(r.SerializeToString())
    assert back.statusCode == 3 and back.requireNextFetch is True
    assert [(p.key, p.value) for p in back.kvPair] == [(a, b)]


def test_proto3_default_scalars_not_serialized():
    sm = _sm()
    # implicit presence: zero-valued plain scalars vanish on the wire
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""
    assert sm.RemoveImplicitKey().SerializeToString() == b""


def test_oneof_set_then_overwrite_keeps_last():
    sm = _sm()
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    req.implicitGroupingKeyRequest = sm.ImplicitGroupingKeyRequest(
        setImplicitKey=sm.SetImplicitKey(key=b"k")
    )
    assert req.WhichOneof("method") == "implicitGroupingKeyRequest"
    back = sm.StateRequest.FromString(req.SerializeToString())
    assert back.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert back.implicitGroupingKeyRequest.setImplicitKey.key == b"k"


def test_unknown_fields_skipped_on_parse():
    rt = _rt()
    sm = _sm()
    known = sm.StateResponse(statusCode=7).SerializeToString()
    # append an unknown varint field (#15) and an unknown length-delimited
    # field (#14) — a newer peer may send fields this gencode lacks
    extra = bytearray(known)
    rt.encode_tag(extra, 15, rt.WIRETYPE_VARINT)
    rt.encode_varint(extra, 12345)
    rt.encode_tag(extra, 14, rt.WIRETYPE_LENGTH_DELIMITED)
    rt.encode_varint(extra, 3)
    extra.extend(b"xyz")
    back = sm.StateResponse.FromString(bytes(extra))
    assert back.statusCode == 7


def test_proto3_optional_presence():
    sm = _sm()
    t = sm.TimerInfo(timestampMs=5)
    assert not t.HasField("key")
    t.key = b""  # explicitly-set empty optional MUST serialize (presence)
    assert t.HasField("key")
    back = sm.TimerInfo.FromString(t.SerializeToString())
    assert back.HasField("key") and back.key == b""


def test_wire_bytes_match_spec_example():
    """Pin exact bytes for a nested oneof message against the public
    encoding spec (field 2 LEN{field 1 LEN{field 1 VARINT 2}})."""
    sm = _sm()
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020802")


def test_imports_rejected_not_mis_parsed():
    """A FileDescriptorProto with dependencies is out of the shim's scope
    and must raise, not silently produce wrong descriptors."""
    rt = _rt()
    out = bytearray()
    rt.encode_tag(out, 1, rt.WIRETYPE_LENGTH_DELIMITED)
    rt.encode_varint(out, 7)
    out.extend(b"a.proto")
    rt.encode_tag(out, 3, rt.WIRETYPE_LENGTH_DELIMITED)  # dependency
    rt.encode_varint(out, 7)
    out.extend(b"b.proto")
    with pytest.raises(rt.UnsupportedProtoFeature):
        rt.parse_file_descriptor(bytes(out))


def test_real_protobuf_would_win_path_order():
    """The shim dir is APPENDED to sys.path, never prepended — a real
    google.protobuf install must always shadow the shim."""
    import sys

    from highs_duckdb_spark.streaming import protoshim

    assert enable_protoshim()
    if protoshim.real_protobuf_present():
        pytest.skip("real protobuf installed; shim inert by construction")
    idx = sys.path.index(protoshim._SHIM_DIR)
    assert idx > 0  # not at the front
