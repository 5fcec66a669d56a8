"""Property-based robustness for the hand-rolled byte-level layers."""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_metadata_explorer_spark.listing import (
    _java_double_str,
    render_partition_value,
)
from parquet_metadata_explorer_spark.parquet.decode import decode_plain
from parquet_metadata_explorer_spark.parquet.thrift import (
    BytesReadable,
    CompactReader,
)


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _zigzag(v: int) -> bytes:
    return _varint((v << 1) ^ (v >> 63) if v < 0 else v << 1)


@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_varint_roundtrip(n):
    r = CompactReader(BytesReadable(_varint(n)))
    assert r.read_varint() == n


@given(st.integers(min_value=-(2**62), max_value=2**62 - 1))
def test_zigzag_roundtrip(v):
    r = CompactReader(BytesReadable(_zigzag(v)))
    assert r.read_zigzag() == v


@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=50))
def test_plain_int32_roundtrip(vals):
    data = struct.pack(f"<{len(vals)}i", *vals)
    assert decode_plain(data, "INT32") == vals


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=50))
def test_plain_int64_roundtrip(vals):
    data = struct.pack(f"<{len(vals)}q", *vals)
    assert decode_plain(data, "INT64") == vals


@given(st.lists(st.floats(allow_nan=False, width=64), max_size=50))
def test_plain_double_roundtrip(vals):
    data = struct.pack(f"<{len(vals)}d", *vals)
    assert decode_plain(data, "DOUBLE") == vals


@given(st.lists(st.binary(max_size=40), max_size=30))
def test_plain_binary_roundtrip(vals):
    data = b"".join(struct.pack("<I", len(v)) + v for v in vals)
    assert decode_plain(data, "BINARY") == vals


@given(st.lists(st.booleans(), max_size=64))
def test_plain_boolean_roundtrip(vals):
    nbytes = (len(vals) + 7) // 8
    packed = bytearray(nbytes)
    for i, v in enumerate(vals):
        if v:
            packed[i >> 3] |= 1 << (i & 7)
    assert decode_plain(bytes(packed), "BOOLEAN", count=len(vals)) == vals


@given(st.floats(allow_nan=False, allow_infinity=False))
def test_java_double_str_roundtrips(d):
    s = _java_double_str(d)
    assert float(s) == d  # shortest-repr digits must round-trip exactly
    # Java formatting bands
    m = abs(d)
    if m != 0 and 1e-3 <= m < 1e7:
        assert "E" not in s and "." in s
    elif m != 0:
        assert "E" in s


@settings(max_examples=200)
@given(st.text(min_size=0, max_size=30))
def test_render_partition_value_idempotent_and_total(v):
    out = render_partition_value(v)
    assert out is not None
    # rendering is canonicalizing: applying it twice changes nothing
    assert render_partition_value(out) == out


def _field(fid_delta: int, wtype: int) -> bytes:
    return bytes([(fid_delta << 4) | wtype])


@given(
    st.lists(
        st.sampled_from(["i64", "bin", "struct", "list", "double", "bool"]),
        max_size=8,
    )
)
def test_unknown_fields_are_skipped(kinds):
    """A struct with arbitrary unknown fields (ids 20+) must parse:
    forward compatibility of the hand-rolled compact reader."""
    payload = bytes([0x16]) + _zigzag(42)  # field 1: i64 = 42
    fid = 1
    for kind in kinds:
        delta = 20 if fid == 1 else 1  # jump to high unknown ids
        fid += delta
        if kind == "i64":
            payload += _field(min(delta, 15), 6) + _zigzag(7)
        elif kind == "bin":
            payload += _field(min(delta, 15), 8) + _varint(3) + b"abc"
        elif kind == "double":
            payload += _field(min(delta, 15), 7) + struct.pack("<d", 1.5)
        elif kind == "bool":
            payload += _field(min(delta, 15), 1)
        elif kind == "struct":
            payload += _field(min(delta, 15), 12) + bytes([0x16]) + _zigzag(1) + b"\x00"
        elif kind == "list":
            payload += _field(min(delta, 15), 9) + bytes([0x26]) + _zigzag(1) + _zigzag(2)
    payload += b"\x00"
    f = CompactReader(BytesReadable(payload)).read_struct_generic()
    assert f[1] == 42
