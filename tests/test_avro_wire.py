"""Pure-Python Avro OCF codec (decode/avro_wire.py): round-trip
property over adversarial values, blocked-map and multi-block layout,
and loud failures on corruption — the same discipline as the BSON wire
tests."""

import json

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from commons_codec_ray.decode.avro_wire import (
    MAGIC,
    AvroFormatError,
    _zz_decode,
    _zz_encode,
    read_ocf,
    write_ocf,
)

SCHEMA = {
    "type": "record",
    "name": "T",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
    ],
}


def test_zigzag_edge_values():
    for n in (0, -1, 1, 63, -64, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        buf = _zz_encode(n)
        got, pos = _zz_decode(buf, 0)
        assert got == n and pos == len(buf), n


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.text(max_size=40),
            st.floats(allow_nan=False, allow_infinity=True, width=64),
            st.booleans(),
        ),
        max_size=30,
    ),
    st.integers(min_value=1, max_value=7),
)
def test_roundtrip_property(rows_in, block_rows):
    rows = [{"i": i, "s": s, "d": d, "b": b} for i, s, d, b in rows_in]
    blob = write_ocf(SCHEMA, rows, block_rows=block_rows)
    schema, rows_out = read_ocf(blob)
    assert schema == SCHEMA
    assert len(rows_out) == len(rows)
    for a, b in zip(rows, rows_out):
        assert a["i"] == b["i"] and a["s"] == b["s"] and a["b"] == b["b"]
        assert a["d"] == b["d"] or (np.isnan(a["d"]) and np.isnan(b["d"]))


def test_multi_block_layout_and_sync_verified():
    rows = [{"i": k, "s": f"x{k}", "d": k / 3.0, "b": k % 2 == 0} for k in range(10)]
    blob = write_ocf(SCHEMA, rows, sync=b"\xAB" * 16, block_rows=3)
    # 4 data blocks -> 4 sync markers beyond the header's
    assert blob.count(b"\xAB" * 16) == 5
    _, out = read_ocf(blob)
    assert [r["i"] for r in out] == list(range(10))


def test_corruption_is_loud():
    rows = [{"i": 1, "s": "a", "d": 1.0, "b": True}]
    blob = bytearray(write_ocf(SCHEMA, rows))
    with pytest.raises(AvroFormatError, match="magic"):
        read_ocf(b"Nope" + bytes(blob[4:]))
    # flip a byte inside the trailing sync marker
    blob[-1] ^= 0xFF
    with pytest.raises(AvroFormatError, match="sync"):
        read_ocf(bytes(blob))


def test_unsupported_schema_rejected():
    bad = {
        "type": "record",
        "name": "B",
        "fields": [{"name": "x", "type": {"type": "array", "items": "long"}}],
    }
    with pytest.raises(AvroFormatError, match="unsupported"):
        write_ocf(bad, [])
    with pytest.raises(AvroFormatError, match="codec"):
        # hand-build a header claiming an unsupported codec
        meta = {
            "avro.schema": json.dumps(SCHEMA).encode(),
            "avro.codec": b"snappy",
        }
        out = bytearray(MAGIC) + _zz_encode(len(meta))
        for k, v in sorted(meta.items()):
            kb = k.encode()
            out += _zz_encode(len(kb)) + kb + _zz_encode(len(v)) + v
        out += _zz_encode(0) + b"\x00" * 16
        read_ocf(bytes(out))


def test_deflate_codec_roundtrip():
    rows = [
        {"i": k, "s": "repetitive " * 5, "d": 1.5, "b": False} for k in range(200)
    ]
    null_blob = write_ocf(SCHEMA, rows, block_rows=64)
    defl_blob = write_ocf(SCHEMA, rows, block_rows=64, codec="deflate")
    assert len(defl_blob) < len(null_blob) // 2  # it actually compressed
    _, out = read_ocf(defl_blob)
    assert out == rows


def test_deflate_corruption_is_loud():
    rows = [{"i": 1, "s": "abc", "d": 0.5, "b": True}]
    blob = bytearray(write_ocf(SCHEMA, rows, codec="deflate"))
    # corrupt a byte inside the (sole) compressed block, not the sync
    blob[-20] ^= 0xFF
    with pytest.raises(AvroFormatError):
        read_ocf(bytes(blob))
