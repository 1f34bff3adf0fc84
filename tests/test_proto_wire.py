"""Pure-Python protobuf wire codec (decode/proto_wire.py): round-trip
property over adversarial scalars, proto3 semantics (defaults omitted,
last-wins, unknown fields skipped), loud corruption failures."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from commons_codec_ray.decode.proto_wire import (
    ProtoFormatError,
    _varint_encode,
    decode_frames,
    decode_message,
    encode_frames,
    encode_message,
)

FIELDS = {
    1: ("i", "int64"),
    2: ("u", "uint64"),
    3: ("z", "sint64"),
    4: ("d", "double"),
    5: ("s", "string"),
    6: ("b", "bytes"),
    7: ("f", "bool"),
}


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
                "u": st.integers(min_value=0, max_value=2**64 - 1),
                "z": st.integers(min_value=-(2**63), max_value=2**63 - 1),
                "d": st.floats(allow_nan=False, width=64),
                "s": st.text(max_size=30),
                "b": st.binary(max_size=30),
                "f": st.booleans(),
            }
        ),
        max_size=20,
    )
)
def test_roundtrip_property(rows):
    blob = encode_frames(FIELDS, rows)
    out = decode_frames(FIELDS, blob)
    assert out == rows


def test_defaults_omitted_and_backfilled():
    row = {"i": 0, "u": 0, "z": 0, "d": 0.0, "s": "", "b": b"", "f": False}
    assert encode_message(FIELDS, row) == b""
    assert decode_message(FIELDS, b"") == row
    # negative zero double survives (it is NOT the proto3 default)
    neg = dict(row, d=-0.0)
    blob = encode_message(FIELDS, neg)
    assert blob != b""
    assert str(decode_message(FIELDS, blob)["d"]) == "-0.0"


def test_unknown_fields_skipped_last_wins():
    # field 9 (unknown varint), field 10 (unknown length-delimited)
    extra = (
        _varint_encode(9 << 3 | 0) + _varint_encode(12345)
        + _varint_encode(10 << 3 | 2) + _varint_encode(3) + b"xyz"
    )
    twice = encode_message(FIELDS, {"i": 1}) + extra + encode_message(FIELDS, {"i": 7})
    out = decode_message(FIELDS, twice)
    assert out["i"] == 7  # last occurrence wins


def test_corruption_is_loud():
    with pytest.raises(ProtoFormatError, match="truncated"):
        decode_message(FIELDS, _varint_encode(1 << 3 | 0))  # tag, no value
    # wt 5 (I32) on a KNOWN non-float field is a schema violation...
    with pytest.raises(ProtoFormatError, match="wire type 5"):
        decode_message(FIELDS, _varint_encode(1 << 3 | 5) + b"\x00" * 4)
    # ...but on an UNKNOWN field it is skipped (forward compatibility:
    # a producer may add float/fixed32 fields)
    blob = (
        _varint_encode(99 << 3 | 5) + b"\x00" * 4
        + encode_message(FIELDS, {"i": 3})
    )
    assert decode_message(FIELDS, blob)["i"] == 3
    with pytest.raises(ProtoFormatError, match="wire type 3"):
        decode_message(FIELDS, _varint_encode(1 << 3 | 3))  # start-group
    with pytest.raises(ProtoFormatError, match="truncated frame"):
        decode_frames(FIELDS, _varint_encode(10) + b"ab")
