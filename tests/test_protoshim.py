"""Wire-format unit tests for vendor/protoshim.py (no Spark, no JVM).

Vectors are hand-computed from the public protobuf encoding spec:
tag = (field_number << 3) | wire_type; varints are little-endian
base-128 with the MSB as continuation; length-delimited fields carry
a varint byte length. The JVM state server is the other end of this
wire, so these bytes must match what protoc-generated Java emits —
tests/test_tws.py then certifies that end to end.
"""

from __future__ import annotations

from mapreduceece563_spark.vendor.protoshim import install

install()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


def test_oneof_submessage_serializes_even_when_empty():
    """SetHandleState(state=0) is all-defaults (serializes to 0
    bytes), but the enclosing oneof fields must still appear on the
    wire or the JVM can't resolve which method was called."""
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.PRE_INIT)
        )
    )
    # field 2 (statefulProcessorCall), wt 2, len 2:
    #   field 1 (setHandleState), wt 2, len 0
    assert m.SerializeToString() == bytes.fromhex("12020a00")


def test_nonzero_enum_serializes():
    m = sm.SetHandleState(state=sm.CLOSED)  # CLOSED = 5
    assert m.SerializeToString() == bytes.fromhex("0805")


def test_default_scalar_skipped_outside_presence():
    # statusCode=0 / errorMessage="" / value=b"" -> empty encoding
    assert sm.StateResponse().SerializeToString() == b""
    assert (
        sm.StateResponse(statusCode=0, errorMessage="", value=b"")
        .SerializeToString()
        == b""
    )


def test_bytes_and_string_fields():
    m = sm.StateCallCommand(stateName="agg", schema="n BIGINT")
    # field1 "agg" + field2 "n BIGINT"
    assert m.SerializeToString() == (
        b"\x0a\x03agg" b"\x12\x08n BIGINT"
    )


def test_parse_response_with_missing_fields_defaults():
    r = sm.StateResponse()
    r.ParseFromString(bytes.fromhex("1a03616263"))  # value=b"abc" only
    assert (r.statusCode, r.errorMessage, r.value) == (0, "", b"abc")


def test_parse_skips_unknown_fields():
    r = sm.StateResponse()
    # unknown field 15 (varint), then statusCode=7
    r.ParseFromString(bytes.fromhex("782a" "0807"))
    assert r.statusCode == 7


def test_negative_int64_ten_byte_varint():
    t = sm.RegisterTimer(expiryTimestampMs=-1)
    enc = t.SerializeToString()
    # field1 wt0, then ten 0xff..0x01 bytes (two's complement -1)
    assert enc == bytes.fromhex("08" + "ff" * 9 + "01")
    back = sm.RegisterTimer()
    back.ParseFromString(enc)
    assert back.expiryTimestampMs == -1


def test_large_varint_roundtrip():
    t = sm.RegisterTimer(expiryTimestampMs=1_700_000_000_000)
    back = sm.RegisterTimer()
    back.ParseFromString(t.SerializeToString())
    assert back.expiryTimestampMs == 1_700_000_000_000


def test_repeated_bytes_roundtrip():
    m = sm.StateResponseWithListGet(
        statusCode=1, value=[b"a", b"", b"ccc"], requireNextFetch=True
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(m.SerializeToString())
    assert back.statusCode == 1
    assert list(back.value) == [b"a", b"", b"ccc"]
    assert back.requireNextFetch is True


def test_repeated_message_roundtrip():
    m = sm.StateResponseWithMapIterator(
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ]
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(m.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    assert back.requireNextFetch is False


def test_utf8_string_roundtrip():
    m = sm.ParseStringSchema(schema="n BIGINT, s STRING — «café»")
    back = sm.ParseStringSchema()
    back.ParseFromString(m.SerializeToString())
    assert back.schema == "n BIGINT, s STRING — «café»"


def test_unset_submessage_read_returns_default_without_presence():
    cmd = sm.StateCallCommand(stateName="x")
    assert cmd.ttl.durationMs == 0  # default view
    assert not cmd.HasField("ttl")
    # and the read did not create wire presence
    assert b"\x22" not in cmd.SerializeToString()


def test_install_reports_active_provider():
    """install() is idempotent and must report whichever provider is
    active: True iff the shim owns google.protobuf, False when a real
    runtime is installed (the shim defers). Phrased this way the test
    passes on BOTH environments."""
    import sys

    result = install()
    active = sys.modules["google.protobuf"]
    assert result == getattr(active, "__protoshim__", False)
    assert install() == result  # idempotent


def test_unset_submessage_default_is_frozen():
    """The shim does not auto-vivify nested assignment (real protobuf
    does); writing through an unset sub-message default must raise
    rather than silently discard the write."""
    import pytest as _pytest

    cmd = sm.StateCallCommand(stateName="x")
    with _pytest.raises(AttributeError, match="auto-vivify"):
        cmd.ttl.durationMs = 5
    # reads stay safe and presence-free
    assert cmd.ttl.durationMs == 0
    assert not cmd.HasField("ttl")


# --- property-based round-trip fuzz ----------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st_
    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    @settings(max_examples=200, deadline=None)
    @given(
        status=st_.integers(min_value=-(2**31), max_value=2**31 - 1),
        err=st_.text(max_size=40),
        values=st_.lists(st_.binary(max_size=20), max_size=8),
        more=st_.booleans(),
    )
    def test_fuzz_list_get_roundtrip(status, err, values, more):
        m = sm.StateResponseWithListGet(
            statusCode=status,
            errorMessage=err,
            value=values,
            requireNextFetch=more,
        )
        back = sm.StateResponseWithListGet()
        back.ParseFromString(m.SerializeToString())
        assert back.statusCode == status
        assert back.errorMessage == err
        assert list(back.value) == values
        assert back.requireNextFetch == more

    @settings(max_examples=200, deadline=None)
    @given(ts=st_.integers(min_value=-(2**63), max_value=2**63 - 1))
    def test_fuzz_int64_roundtrip(ts):
        back = sm.RegisterTimer()
        back.ParseFromString(
            sm.RegisterTimer(expiryTimestampMs=ts).SerializeToString()
        )
        assert back.expiryTimestampMs == ts

    @settings(max_examples=100, deadline=None)
    @given(
        pairs=st_.lists(
            st_.tuples(st_.binary(max_size=16), st_.binary(max_size=16)),
            max_size=6,
        )
    )
    def test_fuzz_repeated_message_roundtrip(pairs):
        m = sm.StateResponseWithMapIterator(
            kvPair=[
                sm.KeyAndValuePair(key=k, value=v) for k, v in pairs
            ]
        )
        back = sm.StateResponseWithMapIterator()
        back.ParseFromString(m.SerializeToString())
        assert [(p.key, p.value) for p in back.kvPair] == pairs


def test_registry_import_does_not_claim_google_protobuf():
    """The shim's side effect is scoped to the TWS code path: a plain
    registry import must leave sys.modules['google.protobuf'] alone so
    standard availability probes elsewhere keep working. Subprocess so
    this file's own install() doesn't contaminate the check."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '.');"
        "import mapreduceece563_spark.registry;"
        "assert 'google.protobuf' not in sys.modules, 'shim leaked';"
        "import mapreduceece563_spark.streaming.tws_processor;"
        "assert 'google.protobuf' in sys.modules;"
        "print('scoped-ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=__file__.rsplit("/tests/", 1)[0],
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "scoped-ok" in out.stdout


def test_install_defers_to_real_protobuf_runtime():
    """VERDICT r5 ask #8: the code claims "a real protobuf
    installation wins" — pin it. In a subprocess, fake a REAL runtime
    (a google.protobuf with an importable descriptor module and no
    __protoshim__ marker) before calling install(); install() must
    return False and leave the fake as the active provider."""
    import subprocess
    import sys

    code = (
        "import sys, types\n"
        "g = types.ModuleType('google'); g.__path__ = []\n"
        "pb = types.ModuleType('google.protobuf'); pb.__path__ = []\n"
        "d = types.ModuleType('google.protobuf.descriptor')\n"
        "d._USE_C_DESCRIPTORS = False\n"
        "g.protobuf = pb; pb.descriptor = d\n"
        "sys.modules['google'] = g\n"
        "sys.modules['google.protobuf'] = pb\n"
        "sys.modules['google.protobuf.descriptor'] = d\n"
        "sys.path.insert(0, '.')\n"
        "from mapreduceece563_spark.vendor.protoshim import install\n"
        "assert install() is False, 'shim claimed an occupied runtime'\n"
        "assert sys.modules['google.protobuf'] is pb, 'shim replaced it'\n"
        "assert not getattr(sys.modules['google.protobuf'],"
        " '__protoshim__', False)\n"
        "print('real-wins-ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=__file__.rsplit("/tests/", 1)[0],
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "real-wins-ok" in out.stdout


def test_packed_repeated_scalar_descriptor_rejected():
    """proto3 packs repeated scalars (wire type 2); the shim's parse
    path assumes unpacked varints, so a descriptor that declares a
    repeated scalar field must be rejected at build time rather than
    silently mis-decoding bytes (ADVICE r5)."""
    import pytest

    from mapreduceece563_spark.vendor import protoshim as ps

    # minimal FieldDescriptorProto raw dict: name=1, number=3,
    # label=4 (3 = LABEL_REPEATED), type=5 (3 = TYPE_INT64)
    raw = {1: [b"bad_field"], 3: [7], 4: [3], 5: [3]}
    with pytest.raises(NotImplementedError, match="packed"):
        ps._FieldSpec(raw)
