"""Clean-room protobuf mini-runtime (protoshim/minipb.py): golden wire
bytes hand-computed from the public encoding spec, proto3 presence and
oneof semantics, parse/merge behavior, and the generated-module surface
pyspark's TWS state clients use.  The end-to-end differential against
the real JAVA protobuf parser is tests/test_streaming_stateful.py's TWS
integration pair (the JVM state server parses these encodings live)."""

from __future__ import annotations

import pytest

from substreams_sink_graph_load_spark import protoshim
from substreams_sink_graph_load_spark.protoshim import minipb

pytestmark = pytest.mark.skipif(
    not protoshim.activate(), reason="protoshim failed to activate"
)


@pytest.fixture(scope="module")
def sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


# -- golden wire bytes (hand-computed per protobuf.dev/encoding) ---------

def test_varint_scalar(sm):
    assert sm.StateRequest(version=1).SerializeToString() == b"\x08\x01"
    assert sm.StateRequest(version=300).SerializeToString() == b"\x08\xac\x02"
    assert sm.StateRequest().SerializeToString() == b""  # default elided


def test_negative_int64_ten_byte_varint(sm):
    got = sm.RegisterTimer(expiryTimestampMs=-1).SerializeToString()
    assert got == b"\x08" + b"\xff" * 9 + b"\x01"
    rt = sm.RegisterTimer()
    rt.ParseFromString(got)
    assert rt.expiryTimestampMs == -1


def test_bytes_and_nested_message(sm):
    req = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            setImplicitKey=sm.SetImplicitKey(key=b"ab")
        )
    )
    # field 4 (len 6) > field 1 (len 4) > field 1 bytes "ab"
    assert req.SerializeToString() == bytes.fromhex("22060a040a026162")


def test_string_utf8(sm):
    s = sm.ParseStringSchema(schema="héllo")
    body = "héllo".encode("utf-8")
    assert s.SerializeToString() == b"\x0a" + bytes([len(body)]) + body
    s2 = sm.ParseStringSchema()
    s2.ParseFromString(s.SerializeToString())
    assert s2.schema == "héllo"


def test_empty_message_in_oneof_still_emitted(sm):
    # presence, not value, drives emission inside a oneof: deleteIfExists
    # is field 6 with an EMPTY StateCallCommand payload
    c = sm.StatefulProcessorCall(deleteIfExists=sm.StateCallCommand())
    assert c.SerializeToString() == b"\x32\x00"


def test_enum_plain_field_default_elided(sm):
    assert sm.SetHandleState(state=sm.PRE_INIT).SerializeToString() == b""
    assert sm.SetHandleState(state=sm.INITIALIZED).SerializeToString() == (
        b"\x08\x02"
    )


def test_bool_true_emitted_false_elided(sm):
    assert sm.ListStatePut(fetchWithArrow=False).SerializeToString() == b""
    assert sm.ListStatePut(fetchWithArrow=True).SerializeToString() == (
        b"\x10\x01"
    )


def test_repeated_bytes_per_element(sm):
    r = sm.StateResponseWithListGet(value=[b"x", b"yz"])
    assert r.SerializeToString() == bytes.fromhex("1a01781a02797a")


# -- presence / vivification / oneof semantics ---------------------------

def test_submessage_vivification_marks_presence_only_on_write(sm):
    c = sm.StateCallCommand()
    c.stateName = "s"
    _ = c.ttl.durationMs  # pure read: no presence
    assert c.SerializeToString() == b"\x0a\x01s"
    c.ttl.durationMs = 100
    assert c.SerializeToString() == bytes.fromhex("0a017322020864")


def test_oneof_last_set_wins(sm):
    r = sm.StateRequest(
        timerRequest=sm.TimerRequest(
            timerValueRequest=sm.TimerValueRequest(
                getWatermark=sm.GetWatermark()
            )
        )
    )
    assert r.WhichOneof("method") == "timerRequest"
    r2 = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(),
    )
    r2.MergeFromString(r.SerializeToString())
    assert r2.WhichOneof("method") == "timerRequest"


def test_has_field_and_clear(sm):
    c = sm.StateCallCommand()
    assert not c.HasField("ttl")
    c.ttl.durationMs = 1
    assert c.HasField("ttl")
    c.Clear()
    assert not c.HasField("ttl")
    with pytest.raises(ValueError):
        c.HasField("stateName")  # plain proto3 scalar: no presence API


def test_copy_from(sm):
    a = sm.StateCallCommand(stateName="n", schema="sch")
    b = sm.StateCallCommand()
    b.CopyFrom(a)
    assert b.stateName == "n" and b.schema == "sch"
    assert a.SerializeToString() == b.SerializeToString()


# -- parse robustness ----------------------------------------------------

def test_unknown_fields_skipped(sm):
    base = sm.SetImplicitKey(key=b"k").SerializeToString()
    # append unknown field 15 (varint 7) and field 14 (len-delimited "zz")
    extra = base + bytes([15 << 3]) + b"\x07" + bytes(
        [(14 << 3) | 2]
    ) + b"\x02zz"
    m = sm.SetImplicitKey()
    m.ParseFromString(extra)
    assert m.key == b"k"


def test_truncated_raises(sm):
    good = sm.SetImplicitKey(key=b"abcd").SerializeToString()
    m = sm.SetImplicitKey()
    with pytest.raises(ValueError):
        m.ParseFromString(good[:-2])


def test_parse_replaces_merge_appends(sm):
    r = sm.StateResponseWithListGet(value=[b"a"])
    data = sm.StateResponseWithListGet(value=[b"b"]).SerializeToString()
    r.MergeFromString(data)
    assert list(r.value) == [b"a", b"b"]
    r.ParseFromString(data)
    assert list(r.value) == [b"b"]


def test_repeated_message_parse(sm):
    resp = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    out = sm.StateResponseWithMapIterator()
    out.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in out.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    assert out.requireNextFetch is True


def test_proto3_optional_presence(sm):
    # TimerInfo.key is `optional bytes` (synthetic oneof): absent unless set
    t = sm.TimerInfo(timestampMs=5)
    assert t.SerializeToString() == b"\x10\x05"
    assert not t.HasField("key")
    t2 = sm.TimerInfo(key=b"", timestampMs=5)  # EXPLICIT empty: emitted
    assert t2.HasField("key")
    assert t2.SerializeToString() == b"\x0a\x00\x10\x05"


# -- module surface the pyspark clients rely on --------------------------

def test_module_level_enum_constants(sm):
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED, sm.DATA_PROCESSED,
            sm.TIMER_PROCESSED, sm.CLOSED) == (0, 1, 2, 3, 4, 5)
    assert sm.HandleState.Value("CLOSED") == 5
    assert sm.HandleState.Name(2) == "INITIALIZED"


def test_unknown_kwarg_and_bad_types_rejected(sm):
    with pytest.raises(ValueError):
        sm.SetImplicitKey(nope=1)
    with pytest.raises(TypeError):
        sm.SetImplicitKey(key="not-bytes")
    with pytest.raises(TypeError):
        sm.ParseStringSchema(schema=b"not-str")
    with pytest.raises(AttributeError):
        sm.StateRequest().timerRequest = sm.TimerRequest()  # message assign


def test_int32_sign_extension_roundtrip(sm):
    r = sm.StateResponse(statusCode=-2)
    out = sm.StateResponse()
    out.ParseFromString(r.SerializeToString())
    assert out.statusCode == -2


# -- raw varint layer ----------------------------------------------------

def test_varint_edges():
    for v in (0, 1, 127, 128, 300, 2 ** 32 - 1, 2 ** 63, 2 ** 64 - 1):
        buf = bytearray()
        minipb.write_varint(buf, v)
        got, pos = minipb.read_varint(bytes(buf), 0)
        assert got == v and pos == len(buf)
    with pytest.raises(ValueError):
        minipb.read_varint(b"\xff" * 11, 0)
    with pytest.raises(ValueError):
        minipb.read_varint(b"\x80", 0)


# -- property: random message trees round-trip bit-stably ----------------

from hypothesis import given, settings
from hypothesis import strategies as hst

_i32 = hst.integers(-(2 ** 31), 2 ** 31 - 1)
_i64 = hst.integers(-(2 ** 63), 2 ** 63 - 1)
_txt = hst.text(max_size=40)
_blob = hst.binary(max_size=40)


@given(
    code=_i32,
    err=_txt,
    vals=hst.lists(_blob, max_size=8),
    more=hst.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_property_list_response_roundtrip(code, err, vals, more):
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    msg = sm.StateResponseWithListGet(
        statusCode=code, errorMessage=err, value=vals, requireNextFetch=more
    )
    wire = msg.SerializeToString()
    out = sm.StateResponseWithListGet()
    out.ParseFromString(wire)
    assert (out.statusCode, out.errorMessage, list(out.value),
            out.requireNextFetch) == (code, err, vals, more)
    assert out.SerializeToString() == wire  # canonical re-encode


@given(
    name=_txt,
    schema=_txt,
    ttl_ms=hst.one_of(hst.none(), _i64),
    pairs=hst.lists(hst.tuples(_blob, _blob), max_size=6),
)
@settings(max_examples=60, deadline=None)
def test_property_nested_and_repeated_message_roundtrip(
    name, schema, ttl_ms, pairs
):
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    cmd = sm.StateCallCommand(stateName=name, schema=schema)
    if ttl_ms is not None:
        cmd.ttl.durationMs = ttl_ms
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
    )
    wire = req.SerializeToString()
    out = sm.StateRequest()
    out.ParseFromString(wire)
    got = out.statefulProcessorCall.getValueState
    assert (got.stateName, got.schema) == (name, schema)
    assert got.HasField("ttl") == (ttl_ms is not None)
    if ttl_ms is not None:
        assert got.ttl.durationMs == ttl_ms
    assert out.WhichOneof("method") == "statefulProcessorCall"
    assert out.SerializeToString() == wire

    it = sm.StateResponseWithMapIterator(
        kvPair=[sm.KeyAndValuePair(key=k, value=v) for k, v in pairs]
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(it.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == pairs
