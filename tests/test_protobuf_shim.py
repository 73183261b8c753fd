"""Unit pins for the vendored pure-Python protobuf wire shim
(hive_person_service_spark/vendor/protobuf_shim).

The shim must be WIRE-CORRECT: the JVM state server parses what it
serializes and vice versa, so these tests pin hand-computed encodings
from the public protobuf encoding spec, full round-trips of every
StateMessage type PySpark constructs, proto3 semantics (oneof
exclusivity, defaults, unknown-field skip, packed repeated), and
property-based scalar round-trips.
"""

from __future__ import annotations

import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.conftest import REPO

_SHIM = str(REPO / "hive_person_service_spark" / "vendor" / "protobuf_shim")
if _SHIM not in sys.path:
    sys.path.insert(0, _SHIM)

try:
    import google.protobuf as _gp

    _IS_SHIM = "+shim" in getattr(_gp, "__version__", "")
except ImportError:  # pragma: no cover
    _IS_SHIM = False

pytestmark = pytest.mark.skipif(
    not _IS_SHIM,
    reason="real protobuf wheel present; the shim never activates there",
)


def _wire():
    from google.protobuf.internal import _wire as w

    return w


def _sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


# -- wire primitives ---------------------------------------------------------


def test_varint_vectors():
    w = _wire()
    cases = {
        0: b"\x00",
        1: b"\x01",
        127: b"\x7f",
        128: b"\x80\x01",
        300: b"\xac\x02",
        -1: b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01",  # 64-bit two's compl
    }
    for v, enc in cases.items():
        buf = bytearray()
        w.write_varint(buf, v)
        assert bytes(buf) == enc, (v, bytes(buf))
        dec, pos = w.read_varint(bytes(buf), 0)
        assert pos == len(enc)
        assert w._to_signed64(dec) == v


def test_zigzag():
    w = _wire()
    for v, z in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2147483647, 4294967294)]:
        assert w._zigzag_encode(v) == z
        assert w._zigzag_decode(z) == v


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_varint_roundtrip_property(v):
    w = _wire()
    buf = bytearray()
    w.write_varint(buf, v)
    dec, pos = w.read_varint(bytes(buf), 0)
    assert pos == len(buf)
    assert w._to_signed64(dec) == v


# -- descriptor parsing ------------------------------------------------------


def test_state_message_descriptors():
    sm = _sm()
    d = sm.StateRequest.DESCRIPTOR
    assert d.full_name == (
        "org.apache.spark.sql.execution.streaming.state.StateRequest"
    )
    assert set(d.fields_by_name) == {
        "version",
        "statefulProcessorCall",
        "stateVariableRequest",
        "implicitGroupingKeyRequest",
        "timerRequest",
        "utilsRequest",
    }
    # oneof "method" spans the five call fields
    assert [o.name for o in d.oneofs] == ["method"]
    assert len(d.oneofs[0].fields) == 5
    # enum registered at module level like generated code
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    assert sm.HandleState.Value("INITIALIZED") == 2
    assert sm.HandleState.Name(3) == "DATA_PROCESSED"
    # resolved message-type references
    f = d.fields_by_name["statefulProcessorCall"]
    assert f.message_type is sm.StatefulProcessorCall.DESCRIPTOR


# -- golden encodings (hand-computed from the encoding spec) ----------------


def test_golden_set_handle_state():
    sm = _sm()
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    # SetHandleState.state: field 1 varint 2        -> 08 02
    # StatefulProcessorCall.setHandleState: field 1 -> 0a 02 08 02
    # StateRequest.statefulProcessorCall: field 2   -> 12 04 0a 02 08 02
    assert req.SerializeToString() == bytes.fromhex("12040a020802")


def test_golden_value_state_update():
    sm = _sm()
    upd = sm.ValueStateCall(
        stateName="s", valueStateUpdate=sm.ValueStateUpdate(value=b"\x01\x02")
    )
    # stateName field 1 len 1 "s"          -> 0a 01 73
    # valueStateUpdate field 4: inner value field 1 len 2 0102 -> 0a 02 01 02
    #   outer                              -> 22 04 0a 02 01 02
    assert upd.SerializeToString() == bytes.fromhex("0a017322040a020102")


def test_golden_negative_int64():
    sm = _sm()
    t = sm.TimerInfo(timestampMs=-1)
    # field 2, varint, -1 as 10-byte two's complement
    assert t.SerializeToString() == bytes.fromhex("10ffffffffffffffffff01")
    rt = sm.TimerInfo()
    rt.ParseFromString(t.SerializeToString())
    assert rt.timestampMs == -1


# -- round-trips of the shapes PySpark actually sends/receives --------------


def test_roundtrip_every_request_shape():
    sm = _sm()
    shapes = [
        sm.StateRequest(
            stateVariableRequest=sm.StateVariableRequest(
                valueStateCall=sm.ValueStateCall(
                    stateName="v", get=sm.Get()
                )
            )
        ),
        sm.StateRequest(
            stateVariableRequest=sm.StateVariableRequest(
                listStateCall=sm.ListStateCall(
                    stateName="l",
                    listStatePut=sm.ListStatePut(
                        value=[b"a", b"bb"], fetchWithArrow=True
                    ),
                )
            )
        ),
        sm.StateRequest(
            stateVariableRequest=sm.StateVariableRequest(
                mapStateCall=sm.MapStateCall(
                    stateName="m",
                    updateValue=sm.UpdateValue(userKey=b"k", value=b"v"),
                )
            )
        ),
        sm.StateRequest(
            implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
                setImplicitKey=sm.SetImplicitKey(key=b"\x00\x01")
            )
        ),
        sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall(
                getValueState=sm.StateCallCommand(
                    stateName="s",
                    schema="a INT",
                    ttl=sm.TTLConfig(durationMs=1234),
                )
            )
        ),
        sm.StateRequest(
            timerRequest=sm.TimerRequest(
                timerValueRequest=sm.TimerValueRequest(
                    getWatermark=sm.GetWatermark()
                )
            )
        ),
        sm.StateRequest(
            utilsRequest=sm.UtilsRequest(
                parseStringSchema=sm.ParseStringSchema(schema="x LONG")
            )
        ),
    ]
    for req in shapes:
        rt = sm.StateRequest()
        rt.ParseFromString(req.SerializeToString())
        assert rt == req
        assert rt.SerializeToString() == req.SerializeToString()


def test_roundtrip_response_shapes():
    sm = _sm()
    r = sm.StateResponseWithListGet(
        statusCode=0,
        errorMessage="",
        value=[b"one", b"two", b""],
        requireNextFetch=True,
    )
    rt = sm.StateResponseWithListGet()
    rt.ParseFromString(r.SerializeToString())
    assert list(rt.value) == [b"one", b"two", b""]
    assert rt.requireNextFetch is True and rt.statusCode == 0

    m = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=False,
    )
    mt = sm.StateResponseWithMapIterator()
    mt.ParseFromString(m.SerializeToString())
    assert [(p.key, p.value) for p in mt.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]

    t = sm.StateResponseWithTimer(
        statusCode=1,
        errorMessage="boom",
        timer=[sm.TimerInfo(key=b"u", timestampMs=42)],
    )
    tt = sm.StateResponseWithTimer()
    tt.ParseFromString(t.SerializeToString())
    assert tt.errorMessage == "boom"
    assert tt.timer[0].timestampMs == 42 and tt.timer[0].key == b"u"


# -- proto3 semantics --------------------------------------------------------


def test_oneof_exclusivity_and_whichoneof():
    sm = _sm()
    v = sm.StateVariableRequest(
        valueStateCall=sm.ValueStateCall(stateName="a")
    )
    assert v.WhichOneof("method") == "valueStateCall"
    v.mapStateCall = sm.MapStateCall(stateName="b")
    assert v.WhichOneof("method") == "mapStateCall"
    assert not v.HasField("valueStateCall")
    # unset oneof reads return default instances, not errors
    assert v.listStateCall.stateName == ""


def test_defaults_and_empty_serialization():
    sm = _sm()
    assert sm.StateResponse().SerializeToString() == b""
    r = sm.StateResponse()
    assert r.statusCode == 0 and r.errorMessage == "" and r.value == b""


def test_unknown_fields_skipped():
    sm = _sm()
    base = sm.TTLConfig(durationMs=7).SerializeToString()
    # append unknown field 15 (varint) and field 14 (len-delimited)
    extra = base + bytes.fromhex("7801") + bytes.fromhex("72026869")
    t = sm.TTLConfig()
    t.ParseFromString(extra)
    assert t.durationMs == 7


def test_packed_repeated_varint_accepted():
    # StateResponseWithListGet.value is repeated BYTES (never packed), so
    # synthesize a packed int field via the raw parser contract instead:
    # a repeated varint field must accept a LEN-wire packed payload.
    sm = _sm()
    d = sm.StateResponseWithListGet.DESCRIPTOR
    assert d.fields_by_name["value"].is_repeated
    w = _wire()
    # field 1 (statusCode, int32) sent packed: tag (1<<3|2), len 2, [5, 6]
    msg = sm.StateResponseWithListGet()
    msg.ParseFromString(bytes.fromhex("0a020506"))
    assert msg.statusCode == 6  # last value wins for singular


@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.binary(max_size=64),
    st.text(max_size=32),
)
@settings(max_examples=150, deadline=None)
def test_scalar_roundtrip_property(ts, raw, text):
    sm = _sm()
    t = sm.TimerInfo(key=raw, timestampMs=ts)
    rt = sm.TimerInfo()
    rt.ParseFromString(t.SerializeToString())
    assert rt.timestampMs == ts and rt.key == raw
    r = sm.StateResponseWithStringTypeVal(statusCode=-5, value=text)
    rr = sm.StateResponseWithStringTypeVal()
    rr.ParseFromString(r.SerializeToString())
    assert rr.value == text and rr.statusCode == -5
