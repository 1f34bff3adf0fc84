"""Pure-Python BSON wire codec (decode/bson_wire.py) — the public-spec
reader that un-gates M5 in environments without pymongo.

Exotic element types have no in-sandbox encoder, so their fixtures are
hand-assembled per bsonspec.org v1.1 (little-endian, cstring names)."""

import datetime as dt
import struct

import pytest

from commons_codec_ray.decode import bson_wire
from commons_codec_ray.decode.bson_wire import BSONError, dumps, loads, loads_stream


def _doc(body: bytes) -> bytes:
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


class TestRoundTrip:
    def test_plain_types(self):
        doc = {
            "i32": 7,
            "i64": 2**40,
            "f": 2.5,
            "s": "héllo",
            "b": True,
            "n": None,
            "sub": {"x": [1, "two", {"three": 3.0}]},
            "empty": {},
            "arr": [],
        }
        assert loads(dumps(doc)) == doc

    def test_bytes_to_base64(self):
        # binary subtype 0 decodes to base64 str (Extended JSON shape)
        assert loads(dumps({"raw": b"\x01\x02"})) == {"raw": "AQI="}

    def test_datetime_ms(self):
        d = dt.datetime(2021, 5, 4, 3, 2, 1, 500000)
        assert loads(dumps({"t": d})) == {"t": d}

    def test_int_width_selection(self):
        raw = dumps({"small": 1, "big": 2**40})
        assert raw[4] == 0x10  # int32 element
        assert b"\x12big\x00" in raw  # int64 element

    def test_stream_framing(self):
        docs = [{"a": 1}, {"b": "x"}, {}]
        raw = b"".join(dumps(d) for d in docs)
        assert loads_stream(raw) == docs

    def test_unencodable_type_raises(self):
        with pytest.raises(TypeError, match="set"):
            dumps({"s": {1, 2}})


class TestExoticElements:
    def test_objectid(self):
        oid = bytes(range(12))
        raw = _doc(b"\x07_id\x00" + oid)
        assert loads(raw) == {"_id": oid.hex()}

    def test_decimal128(self):
        # 2.50 = coeff 250, exp -2 → biased 6174; BID: hi = exp << 49
        hi = 6174 << 49
        raw = _doc(b"\x13d\x00" + struct.pack("<QQ", 250, hi))
        assert loads(raw) == {"d": "2.50"}

    def test_decimal128_negative_and_large(self):
        coeff = int("1234567890123456789012345678901234")
        hi = (1 << 63) | (6176 << 49) | (coeff >> 64)
        lo = coeff & ((1 << 64) - 1)
        raw = _doc(b"\x13d\x00" + struct.pack("<QQ", lo, hi))
        assert loads(raw) == {"d": "-1234567890123456789012345678901234"}

    def test_decimal128_specials(self):
        nan_hi = 0b11111 << 58
        inf_hi = 0b11110 << 58
        raw = _doc(
            b"\x13a\x00" + struct.pack("<QQ", 0, nan_hi)
            + b"\x13b\x00" + struct.pack("<QQ", 0, inf_hi)
            + b"\x13c\x00" + struct.pack("<QQ", 0, (1 << 63) | inf_hi)
        )
        assert loads(raw) == {"a": "NaN", "b": "Infinity", "c": "-Infinity"}

    def test_regex(self):
        raw = _doc(b"\x0br\x00^a.*$\x00i\x00")
        assert loads(raw) == {"r": "Regex('^a.*$', 'i')"}
        raw2 = _doc(b"\x0br\x00x\x00\x00")  # no options → 0, like $regularExpression
        assert loads(raw2) == {"r": "Regex('x', 0)"}

    def test_uuid_binary_subtype4(self):
        u = bytes(range(16))
        raw = _doc(b"\x05u\x00" + struct.pack("<i", 16) + b"\x04" + u)
        out = loads(raw)
        assert out == {"u": "00010203-0405-0607-0809-0a0b0c0d0e0f"}

    def test_legacy_old_binary_subtype2(self):
        # subtype 2 wraps the payload in an inner int32 length
        payload = struct.pack("<i", 2) + b"\x01\x02"
        raw = _doc(b"\x05b\x00" + struct.pack("<i", len(payload)) + b"\x02" + payload)
        assert loads(raw) == {"b": "AQI="}

    def test_timestamp(self):
        ts = (1_600_000_000 << 32) | 5  # t=epoch-s high, i=5 low
        raw = _doc(b"\x11t\x00" + struct.pack("<Q", ts))
        assert loads(raw) == {"t": dt.datetime.utcfromtimestamp(1_600_000_000)}

    def test_code_and_code_with_scope(self):
        code = b"f()\x00"
        raw = _doc(b"\x0dc\x00" + struct.pack("<i", len(code)) + code)
        assert loads(raw) == {"c": "f()"}
        scope = dumps({"x": 1})
        body = struct.pack("<i", len(code)) + code + scope
        cws = struct.pack("<i", len(body) + 4) + body
        raw2 = _doc(b"\x0fc\x00" + cws)
        assert loads(raw2) == {"c": {"$code": "f()", "$scope": {"x": 1}}}

    def test_symbol_undefined_minmax_dbpointer(self):
        sym = b"sym\x00"
        name = b"db.c\x00"
        raw = _doc(
            b"\x0es\x00" + struct.pack("<i", len(sym)) + sym
            + b"\x06u\x00"
            + b"\xffmn\x00"
            + b"\x7fmx\x00"
            + b"\x0cp\x00" + struct.pack("<i", len(name)) + name + bytes(12)
        )
        assert loads(raw) == {
            "s": "sym",
            "u": None,
            "mn": "MinKey()",
            "mx": "MaxKey()",
            "p": f"DBPointer('db.c', '{bytes(12).hex()}')",
        }

    def test_datetime_out_of_range_clamps_to_epoch(self):
        raw = _doc(b"\x09t\x00" + struct.pack("<q", 2**62))
        assert loads(raw) == {"t": dt.datetime(1970, 1, 1)}


class TestMalformed:
    def test_truncated_document(self):
        with pytest.raises(BSONError):
            loads(struct.pack("<i", 100) + b"\x00" * 6)

    def test_bad_terminator(self):
        with pytest.raises(BSONError):
            loads(struct.pack("<i", 5) + b"\x01")

    def test_unknown_element_type(self):
        with pytest.raises(BSONError, match="0x42"):
            loads(_doc(b"\x42k\x00"))

    def test_negative_string_length(self):
        with pytest.raises(BSONError, match="< 1"):
            loads(_doc(b"\x02s\x00" + struct.pack("<i", 0)))

    def test_trailing_garbage(self):
        with pytest.raises(BSONError, match="trailing"):
            loads(dumps({}) + b"\x99")

    def test_element_overrun(self):
        # declared doc length ends mid-element
        body = b"\x10k\x00" + struct.pack("<i", 1)
        raw = struct.pack("<i", len(body) + 4) + body[:-1] + b"\x00"
        with pytest.raises((BSONError, ValueError, struct.error)):
            loads(raw)


def test_decimal128_helper_agrees_with_decimal_module():
    # BID-encode a few decimals by construction and compare strings
    from decimal import Decimal

    for coeff, exp in [(0, 0), (1, 3), (105, -1), (99999, -5)]:
        hi = ((exp + 6176) << 49) | (coeff >> 64)
        lo = coeff & ((1 << 64) - 1)
        got = bson_wire._decimal128_to_str(lo, hi)
        assert Decimal(got) == Decimal(coeff).scaleb(exp)
