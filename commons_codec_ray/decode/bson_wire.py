"""Minimal pure-Python BSON wire codec (public spec, bsonspec.org v1.1).

Closes the M5 gap in-environment: the reference ingests native BSON via
pymongo (reference transform/mongodb.py:89-113); this sandbox has no
``bson`` package, so :func:`commons_codec_ray.decode.extended_json.decode_bson`
falls back to this reader. Output shapes match the Extended JSON
decoder exactly (one normal form regardless of ingestion path):

- ObjectId → 24-char hex str, datetime → naive UTC (epoch-ms clamp),
  Decimal128 → decimal STRING (arbitrary precision, like
  ``$numberDecimal``), binary subtype 4 → canonical UUID string, other
  binary → base64 str, regex → ``Regex('pat', opts)`` string, code →
  str, code-with-scope → ``{"$code", "$scope"}``, min/max key →
  ``"MinKey()"``/``"MaxKey()"``, symbol → str, undefined → None,
  timestamp → datetime from epoch seconds.

The writer covers the plain-type subset the engine emits (dict, list,
str, bool, None, int32/int64, float, bytes, datetime) — enough to
round-trip engine documents and to synthesize test corpora without
pymongo. Decimal128 decoding follows the IEEE 754-2008 BID layout
(sign ∥ combination ∥ 110-bit significand; non-canonical > 34-digit
significands read as 0, matching MongoDB's implementation).
"""

from __future__ import annotations

import base64
import datetime as dt
import struct
import decimal
from decimal import Decimal
from uuid import UUID

_EPOCH = dt.datetime(1970, 1, 1)

# epoch-millisecond range representable as datetime (year 1..9999) —
# same clamp as extended_json._ms_to_datetime
_MIN_MS = -62135596800000
_MAX_MS = 253402300799999


class BSONError(ValueError):
    """Malformed BSON bytes."""


def _ms_to_datetime(ms: int) -> dt.datetime:
    if not (_MIN_MS <= ms <= _MAX_MS):
        ms = 0
    return _EPOCH + dt.timedelta(milliseconds=ms)


def _read_cstring(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(b"\x00", pos)
    return buf[pos:end].decode("utf-8"), end + 1


def _read_string(buf: bytes, pos: int) -> tuple[str, int]:
    (n,) = struct.unpack_from("<i", buf, pos)
    if n < 1:
        raise BSONError(f"string length {n} < 1 at byte {pos}")
    s = buf[pos + 4 : pos + 3 + n]
    if buf[pos + 3 + n] != 0:
        raise BSONError(f"string at byte {pos} not NUL-terminated")
    return s.decode("utf-8"), pos + 4 + n


def _decimal128_to_str(lo: int, hi: int) -> str:
    sign = "-" if hi >> 63 else ""
    comb = (hi >> 58) & 0x1F  # 5 bits after the sign
    if comb == 0b11111:
        return "NaN"
    if comb == 0b11110:
        return f"{sign}Infinity"
    if (hi >> 61) & 0b11 == 0b11:
        # 11-prefixed form: implicit (0b100 << 111) significand — always
        # > 34 digits, non-canonical, reads as 0 (MongoDB behavior)
        exp = ((hi >> 47) & 0x3FFF) - 6176
        coeff = 0
    else:
        exp = ((hi >> 49) & 0x3FFF) - 6176
        coeff = ((hi & 0x0001FFFFFFFFFFFF) << 64) | lo
        if coeff >= 10**34:  # non-canonical declet overflow
            coeff = 0
    # decimal128 coefficients reach 34 digits; the default 28-digit
    # context would round them inside scaleb
    with decimal.localcontext() as ctx:
        ctx.prec = 40
        d = Decimal(coeff).scaleb(exp)
    s = format(d, "f") if exp <= 0 else str(d)
    return sign + s


def _read_value(buf: bytes, pos: int, etype: int):
    if etype == 0x01:  # double
        (v,) = struct.unpack_from("<d", buf, pos)
        return v, pos + 8
    if etype == 0x02:  # string
        return _read_string(buf, pos)
    if etype == 0x03:  # embedded document
        doc, end = _read_document(buf, pos)
        return doc, end
    if etype == 0x04:  # array — document with "0","1",... keys
        doc, end = _read_document(buf, pos)
        return [doc[k] for k in sorted(doc, key=int)], end
    if etype == 0x05:  # binary
        (n,) = struct.unpack_from("<i", buf, pos)
        subtype = buf[pos + 4]
        raw = buf[pos + 5 : pos + 5 + n]
        end = pos + 5 + n
        if subtype == 0x02:  # legacy "old binary": payload has inner length
            raw = raw[4:]
        if subtype in (0x03, 0x04):
            return str(UUID(bytes=bytes(raw))), end
        return base64.b64encode(raw).decode("ascii"), end
    if etype == 0x06:  # undefined (deprecated)
        return None, pos
    if etype == 0x07:  # ObjectId
        return buf[pos : pos + 12].hex(), pos + 12
    if etype == 0x08:  # bool
        return buf[pos] == 1, pos + 1
    if etype == 0x09:  # UTC datetime (int64 ms)
        (ms,) = struct.unpack_from("<q", buf, pos)
        return _ms_to_datetime(ms), pos + 8
    if etype == 0x0A:  # null
        return None, pos
    if etype == 0x0B:  # regex: two cstrings
        pat, pos = _read_cstring(buf, pos)
        opts, pos = _read_cstring(buf, pos)
        return f"Regex('{pat}', {0 if not opts else opts!r})", pos
    if etype == 0x0C:  # DBPointer (deprecated): string + 12-byte oid
        name, pos = _read_string(buf, pos)
        oid = buf[pos : pos + 12].hex()
        return f"DBPointer('{name}', '{oid}')", pos + 12
    if etype == 0x0D:  # JavaScript code
        return _read_string(buf, pos)
    if etype == 0x0E:  # symbol (deprecated)
        return _read_string(buf, pos)
    if etype == 0x0F:  # code with scope
        (total,) = struct.unpack_from("<i", buf, pos)
        code, p = _read_string(buf, pos + 4)
        scope, _ = _read_document(buf, p)
        return {"$code": code, "$scope": scope}, pos + total
    if etype == 0x10:  # int32
        (v,) = struct.unpack_from("<i", buf, pos)
        return v, pos + 4
    if etype == 0x11:  # timestamp: uint64, low 32 increment, high 32 epoch-s
        (raw,) = struct.unpack_from("<Q", buf, pos)
        return _EPOCH + dt.timedelta(seconds=raw >> 32), pos + 8
    if etype == 0x12:  # int64
        (v,) = struct.unpack_from("<q", buf, pos)
        return v, pos + 8
    if etype == 0x13:  # decimal128 (BID)
        lo, hi = struct.unpack_from("<QQ", buf, pos)
        return _decimal128_to_str(lo, hi), pos + 16
    if etype == 0xFF:
        return "MinKey()", pos
    if etype == 0x7F:
        return "MaxKey()", pos
    raise BSONError(f"unknown BSON element type 0x{etype:02x} at byte {pos}")


def _read_document(buf: bytes, pos: int) -> tuple[dict, int]:
    (total,) = struct.unpack_from("<i", buf, pos)
    if total < 5 or pos + total > len(buf):
        raise BSONError(f"document length {total} out of bounds at byte {pos}")
    end = pos + total
    if buf[end - 1] != 0:
        raise BSONError("document not NUL-terminated")
    out: dict = {}
    p = pos + 4
    while p < end - 1:
        etype = buf[p]
        name, p = _read_cstring(buf, p + 1)
        out[name], p = _read_value(buf, p, etype)
    if p != end - 1:
        raise BSONError("document elements overrun the declared length")
    return out, end


def loads(raw: bytes) -> dict:
    """One BSON document → dict (Extended-JSON-decoder output shapes)."""
    doc, end = _read_document(bytes(raw), 0)
    if end != len(raw):
        raise BSONError(f"{len(raw) - end} trailing bytes after document")
    return doc


def loads_stream(raw: bytes) -> list[dict]:
    """Concatenated BSON documents (the mongodump on-disk framing) →
    list of dicts."""
    out, pos, raw = [], 0, bytes(raw)
    while pos < len(raw):
        doc, pos = _read_document(raw, pos)
        out.append(doc)
    return out


# --- writer (plain-type subset) ---------------------------------------------


def _write_value(key: bytes, v) -> bytes:
    if isinstance(v, bool):  # before int — bool is an int subclass
        return b"\x08" + key + (b"\x01" if v else b"\x00")
    if v is None:
        return b"\x0a" + key
    if isinstance(v, float):
        return b"\x01" + key + struct.pack("<d", v)
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return b"\x10" + key + struct.pack("<i", v)
        return b"\x12" + key + struct.pack("<q", v)
    if isinstance(v, str):
        s = v.encode("utf-8")
        return b"\x02" + key + struct.pack("<i", len(s) + 1) + s + b"\x00"
    if isinstance(v, (bytes, bytearray)):
        return b"\x05" + key + struct.pack("<i", len(v)) + b"\x00" + bytes(v)
    if isinstance(v, dt.datetime):
        ms = int((v.replace(tzinfo=None) - _EPOCH).total_seconds() * 1000)
        return b"\x09" + key + struct.pack("<q", ms)
    if isinstance(v, dict):
        return b"\x03" + key + dumps(v)
    if isinstance(v, (list, tuple)):
        inner = dumps({str(i): x for i, x in enumerate(v)})
        return b"\x04" + key + inner
    raise TypeError(f"cannot BSON-encode {type(v).__name__}")


def dumps(doc: dict) -> bytes:
    """dict → one BSON document (plain types only)."""
    body = b"".join(
        _write_value(str(k).encode("utf-8") + b"\x00", v) for k, v in doc.items()
    )
    return struct.pack("<i", len(body) + 5) + body + b"\x00"
