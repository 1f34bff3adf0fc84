"""Extended JSON conformance tests (pattern: the reference's all-BSON-types
corpus, tests/transform/mongodb/data.py:15-224, and converter matrices,
tests/transform/mongodb/test_mongodb_convert.py:102-157)."""

import datetime as dt

import pytest

from commons_codec_ray.decode.extended_json import (
    convert_epoch,
    convert_iso8601,
    decode_document,
    decode_value,
)


ALL_TYPES_IN = {
    "_id": {"$oid": "56e1fc72e0c917e9c4714161"},
    "Symbol": {"$symbol": "symbol"},
    "String": "string",
    "UnicodeString": "Räuber",
    "Int32": {"$numberInt": "-2147483648"},
    "Int64": {"$numberLong": "-9223372036854775808"},
    "Double": {"$numberDouble": "-1.2345678901234568"},
    "Decimal": {"$numberDecimal": "0.000001234567890123456789"},
    "Boolean": True,
    "Null": None,
    "Undefined": {"$undefined": True},
    "DateIso": {"$date": "2015-09-23T10:32:42.330Z"},
    "DateMillis": {"$date": {"$numberLong": "1565545664000"}},
    "DateLegacyInt": {"$date": 1565545664000},
    "Timestamp": {"$timestamp": {"t": 123456789, "i": 42}},
    "BinaryUuid": {
        "$binary": {"base64": "c//SZESzTGmQ6OfR38A11A==", "subType": "04"}
    },
    "BinaryUserDefined": {"$binary": {"base64": "AQIDBAU=", "subType": "80"}},
    "Regex": {"$regularExpression": {"pattern": "pattern", "options": "ix"}},
    "Code": {"$code": "function() {}"},
    "MinKey": {"$minKey": 1},
    "MaxKey": {"$maxKey": 1},
    "List": [1, 2, {"$numberInt": "3"}],
    "Nested": {"inner": {"$numberLong": "7"}},
}


def test_all_types_document():
    out = decode_document(ALL_TYPES_IN)
    assert out["_id"] == "56e1fc72e0c917e9c4714161"
    assert out["Symbol"] == "symbol"
    assert out["UnicodeString"] == "Räuber"  # multi-byte preserved
    assert out["Int32"] == -2147483648
    assert out["Int64"] == -9223372036854775808
    assert out["Double"] == pytest.approx(-1.2345678901234568)
    assert out["Decimal"] == "0.000001234567890123456789"  # arbitrary precision → string
    assert out["Boolean"] is True
    assert out["Null"] is None
    assert out["Undefined"] is None
    assert out["DateIso"] == dt.datetime(2015, 9, 23, 10, 32, 42, 330000)
    assert out["DateMillis"] == dt.datetime(2019, 8, 11, 17, 47, 44)
    assert out["DateLegacyInt"] == dt.datetime(2019, 8, 11, 17, 47, 44)
    assert out["Timestamp"] == dt.datetime(1973, 11, 29, 21, 33, 9)
    assert out["BinaryUuid"] == "73ffd264-44b3-4c69-90e8-e7d1dfc035d4"
    assert out["BinaryUserDefined"] == "AQIDBAU="  # non-UUID stays base64
    assert out["Regex"] == "Regex('pattern', 'ix')"
    assert out["Code"] == "function() {}"
    assert out["MinKey"] == "MinKey()"
    assert out["MaxKey"] == "MaxKey()"
    assert out["List"] == [1, 2, 3]
    assert out["Nested"] == {"inner": 7}


def test_out_of_range_date_clamps_to_zero():
    # ref transform/mongodb.py:130-134
    out = decode_value({"$date": {"$numberLong": str(2**40 * 86400 * 1000)}})
    assert out == dt.datetime(1970, 1, 1)


def test_code_with_scope():
    out = decode_value({"$code": "function() {}", "$scope": {"x": {"$numberInt": "1"}}})
    assert out == {"$code": "function() {}", "$scope": {"x": 1}}


def _dates_to_ms(v):
    """The reference converter renders datetimes as epoch-ms ints in its
    golden corpus; our decoder keeps datetimes and applies this as a
    treatment (converter flag ST5)."""
    if isinstance(v, dict):
        return {k: _dates_to_ms(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_dates_to_ms(x) for x in v]
    if isinstance(v, dt.datetime):
        return convert_epoch(v, milliseconds=True)
    return v


# Full canonical Extended JSON conformance pair, mirroring the reference's
# all-BSON-types corpus (tests/transform/mongodb/data.py:15-224, canonical
# section; itself derived from the public mongo-java-driver / bson-ruby BSON
# corpora). The python/bson sections need the bson lib (absent in this
# environment — M5 is ingested as Extended JSON instead); the anomaly pair
# (:227-249) is treatment-config-specific and covered by the Treatment tests.
CANONICAL_IN = {
    "code_ascii": {"$code": "abab"},
    "code_bytes": {"$code": "ab\x00ab\x00"},
    "code_scope": {"$code": "abab", "$scope": {"x": {"$numberInt": "42"}}},
    "date_iso8601": {"$date": "2015-09-23T10:32:42.33Z"},
    "date_numberlong_valid": {"$date": {"$numberLong": "1356351330000"}},
    "date_numberlong_invalid": {"$date": {"$numberLong": "-9223372036854775808"}},
    "dbref": {"$id": {"$oid": "56027fcae4b09385a85f9344"}, "$ref": "foo", "$db": "bar"},
    "decimal_infinity": {"$numberDecimal": "Infinity"},
    "decimal_largest": {"$numberDecimal": "1234567890123456789012345678901234"},
    "decimal_nan": {"$numberDecimal": "NaN"},
    "decimal_regular": {"$numberDecimal": "0.000001234567890123456789012345678901234"},
    "double_regular": {"$numberDouble": "-1.2345678921232E+18"},
    "int32": {"$numberInt": "-2147483648"},
    "int64": {"$numberLong": "-9223372036854775808"},
    "list_date": [
        {"$date": "2015-09-24T10:32:42.33Z"},
        {"$date": {"$numberLong": "2147483647000"}},
        {"$date": {"$numberLong": "-2147483648000"}},
    ],
    "list_dict": [
        {"id": "bar", "value": {"$date": "2015-09-24T10:32:42.33Z"}},
        {"value": {"$date": "2015-09-24T10:32:42.33Z"}},
    ],
    "list_int": [{"$numberInt": "-2147483648"}],
    "list_oid": [{"$oid": "56027fcae4b09385a85f9344"}],
    "list_uuid": [
        {"$binary": {"base64": "c//SZESzTGmQ6OfR38A11A==", "subType": "01"}},
        {"$binary": {"base64": "c//SZESzTGmQ6OfR38A11A==", "subType": "02"}},
        {"$binary": {"base64": "c//SZESzTGmQ6OfR38A11A==", "subType": "03"}},
        {"$binary": {"base64": "c//AYDC420csII3929483B==", "subType": "04"}},
        {"$binary": {"base64": "c//AYDC420csII3929483B==", "subType": "05"}},
        {"$binary": {"base64": "c//AYDC420csII3929483B==", "subType": "06"}},
        {"$binary": {"base64": "c//AYDC420csII3929483B==", "subType": "80"}},
    ],
    "maxkey": {"$maxKey": 1},
    "minkey": {"$minKey": 1},
    "oid": {"$oid": "56027fcae4b09385a85f9344"},
    "regex": {"$regularExpression": {"pattern": ".*", "options": ""}},
    "symbol": {"$symbol": "foo"},
    "timestamp": {"$timestamp": {"t": 123456789, "i": 42}},
    "undefined": {"$undefined": True},
    "uuid": {"$binary": {"base64": "c//SZESzTGmQ6OfR38A11A==", "subType": "04"}},
}

CANONICAL_OUT = {
    "code_ascii": "abab",
    "code_bytes": "ab\x00ab\x00",
    "code_scope": {"$code": "abab", "$scope": {"x": 42}},
    "date_iso8601": 1443004362000,
    "date_numberlong_valid": 1356351330000,
    "date_numberlong_invalid": 0,  # out-of-range clamps to epoch 0
    "dbref": {"$id": "56027fcae4b09385a85f9344", "$ref": "foo", "$db": "bar"},
    "decimal_infinity": "Infinity",
    "decimal_largest": "1234567890123456789012345678901234",
    "decimal_nan": "NaN",
    "decimal_regular": "0.000001234567890123456789012345678901234",
    "double_regular": -1.2345678921232e18,
    "int32": -2147483648,
    # deviation: the reference emits this as a string and flags it with a
    # TODO ("Representation as string is just fine?"); we keep the int
    "int64": -9223372036854775808,
    "list_date": [1443090762000, 2147483647000, -2147483648000],
    "list_dict": [
        {"id": "bar", "value": 1443090762000},
        {"value": 1443090762000},
    ],
    "list_int": [-2147483648],
    "list_oid": ["56027fcae4b09385a85f9344"],
    "list_uuid": [
        "c//SZESzTGmQ6OfR38A11A==",
        "c//SZESzTGmQ6OfR38A11A==",
        "c//SZESzTGmQ6OfR38A11A==",  # subtype 03 stays base64 (canonical UUID is 04 only)
        "73ffc060-30b8-db47-2c20-8dfddbde3cdc",
        "c//AYDC420csII3929483A==",  # non-canonical base64 normalizes on re-encode
        "c//AYDC420csII3929483A==",
        "c//AYDC420csII3929483A==",
    ],
    "maxkey": "MaxKey()",
    "minkey": "MinKey()",
    "oid": "56027fcae4b09385a85f9344",
    "regex": "Regex('.*', 0)",
    "symbol": "foo",
    "timestamp": 123456789000,
    "undefined": None,
    "uuid": "73ffd264-44b3-4c69-90e8-e7d1dfc035d4",
}


def test_canonical_all_types_conformance():
    got = _dates_to_ms(decode_document(CANONICAL_IN))
    assert got == CANONICAL_OUT


def test_dollar_prefixed_plain_map_passthrough():
    # a map that merely LOOKS like a descriptor must survive
    out = decode_value({"$weird": 1, "other": 2})
    assert out == {"$weird": 1, "other": 2}


@pytest.mark.parametrize(
    "value,expected",
    [
        (dt.datetime(2022, 1, 1), 1640995200),
        (1640995200, 1640995200),
        ("2022-01-01T00:00:00Z", 1640995200),
        (b"2022-01-01T00:00:00Z", 1640995200),
    ],
)
def test_convert_epoch(value, expected):
    assert convert_epoch(value) == expected
    assert convert_epoch(value, milliseconds=True) == expected * 1000


@pytest.mark.parametrize(
    "value,expected",
    [
        (dt.datetime(2022, 1, 1), "2022-01-01T00:00:00"),
        (1640995200, "2022-01-01T00:00:00"),
        ("already-iso", "already-iso"),
        (b"bytes-iso", "bytes-iso"),
    ],
)
def test_convert_iso8601(value, expected):
    assert convert_iso8601(value) == expected


def test_decode_bson_always_available():
    """M5: raw-BSON ingestion works with or without pymongo — the
    pure-Python wire reader (bson_wire.py) backs the path in
    environments without the C codec. Empty doc + nested round-trip."""
    from commons_codec_ray.decode.bson_wire import dumps
    from commons_codec_ray.decode.extended_json import decode_bson

    assert decode_bson(b"\x05\x00\x00\x00\x00") == {}
    doc = {"a": 1, "nested": {"b": [1, 2]}, "s": "x"}
    assert decode_bson(dumps(doc)) == doc


def test_decode_bson_matches_real_library_when_present():
    """Wherever pymongo/bson exists, the C path and the pure reader
    must agree (skipped in-sandbox)."""
    import pytest

    bson = pytest.importorskip("bson")

    from commons_codec_ray.decode import bson_wire
    from commons_codec_ray.decode.extended_json import decode_bson

    raw = bson.BSON.encode({"a": 1, "nested": {"b": [1, 2]}, "s": "x"})
    assert decode_bson(raw) == bson_wire.loads(raw)
