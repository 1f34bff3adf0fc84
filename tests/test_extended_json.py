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
    assert out["Decimal"] == pytest.approx(1.234567890123456789e-6)
    assert out["Boolean"] is True
    assert out["Null"] is None
    assert out["Undefined"] is None
    assert out["DateIso"] == dt.datetime(2015, 9, 23, 10, 32, 42, 330000)
    assert out["DateMillis"] == dt.datetime(2019, 8, 11, 17, 47, 44)
    assert out["DateLegacyInt"] == dt.datetime(2019, 8, 11, 17, 47, 44)
    assert out["Timestamp"] == dt.datetime(1973, 11, 29, 21, 33, 9)
    assert out["BinaryUuid"] == "73ffd264-44b3-4c69-90e8-e7d1dfc035d4"
    assert out["BinaryUserDefined"] == "AQIDBAU="  # non-UUID stays base64
    assert out["Regex"] == "/pattern/ix"
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
    out = decode_value({"$code": "function() {}", "$scope": {"x": 1}})
    assert "function() {}" in out and "scope" in out


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
