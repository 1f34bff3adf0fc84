"""Pure-Python Avro Object Container File codec (public wire spec,
https://avro.apache.org/docs/current/specification/ — the same
no-external-dependency treatment `bson_wire.py` gives MongoDB's wire
format): enough of the OCF grammar to stage and ingest CDC-ecosystem
Avro files in-sandbox.

Supported subset: null-codec container files holding records whose
fields are ``long``, ``int``, ``double``, ``string``, ``bytes`` or
``boolean`` — the shapes Kafka-Connect-style CDC payloads use.

Wire grammar implemented:

- header: magic ``Obj\\x01`` · file-metadata map (blocked map encoding:
  zigzag-varint count per block, negative count ⇒ |count| + byte-size
  follows, 0 terminates) with ``avro.schema`` (JSON) and ``avro.codec``
  · 16-byte sync marker;
- data blocks: object count (long) · serialized size (long) · objects ·
  sync marker, repeated to EOF — the sync marker after every block is
  what makes OCF splittable, and :func:`read_ocf` verifies each one;
- primitives: ``long``/``int`` = zigzag varint, ``string``/``bytes`` =
  length-prefixed, ``double`` = IEEE-754 little-endian, ``boolean`` =
  one byte, record = fields in schema order.

Per-record decoding is a Python loop — the documented irregular-format
exception (same class as the BSON and Extended-JSON codecs); the Ray
side stays batched by decoding whole shard files inside one
``map_batches`` task.
"""

from __future__ import annotations

import json
import struct
from typing import Any

MAGIC = b"Obj\x01"
_SUPPORTED = {"long", "int", "double", "string", "bytes", "boolean", "null"}


class AvroFormatError(ValueError):
    pass


def _zz_encode(n: int) -> bytes:
    """long → zigzag varint bytes."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        if pos >= len(buf):
            raise AvroFormatError("truncated varint")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise AvroFormatError("varint too long")
    return (u >> 1) ^ -(u & 1), pos


def _encode_value(v: Any, typ: str) -> bytes:
    if typ in ("long", "int"):
        return _zz_encode(int(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "string":
        if not isinstance(v, str):
            raise AvroFormatError(
                f"string field got {type(v).__name__} — encode presence "
                "explicitly (has_* flag) instead of relying on coercion"
            )
        b = v.encode("utf-8")
        return _zz_encode(len(b)) + b
    if typ == "bytes":
        return _zz_encode(len(v)) + bytes(v)
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ == "null":
        return b""
    raise AvroFormatError(f"unsupported type {typ!r}")


def _decode_value(buf: bytes, pos: int, typ: str) -> tuple[Any, int]:
    if typ in ("long", "int"):
        return _zz_decode(buf, pos)
    if typ == "double":
        if pos + 8 > len(buf):
            raise AvroFormatError("truncated double")
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ in ("string", "bytes"):
        n, pos = _zz_decode(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise AvroFormatError("bad length prefix")
        raw = buf[pos:pos + n]
        return (raw.decode("utf-8") if typ == "string" else raw), pos + n
    if typ == "boolean":
        if pos >= len(buf):
            raise AvroFormatError("truncated boolean")
        return buf[pos] == 1, pos + 1
    if typ == "null":
        return None, pos
    raise AvroFormatError(f"unsupported type {typ!r}")


def _fields(schema: dict) -> list[tuple[str, str]]:
    if schema.get("type") != "record":
        raise AvroFormatError("only record schemas supported")
    out = []
    for f in schema["fields"]:
        typ = f["type"]
        if not isinstance(typ, str) or typ not in _SUPPORTED:
            raise AvroFormatError(f"unsupported field type {typ!r}")
        out.append((f["name"], typ))
    return out


def write_ocf(
    schema: dict,
    rows: list[dict],
    sync: bytes = b"\x07" * 16,
    block_rows: int = 4096,
    codec: str = "null",
) -> bytes:
    """Serialize ``rows`` as an Avro Object Container File.
    ``codec="deflate"`` compresses each block with raw DEFLATE
    (zlib, wbits=-15 — the spec's no-header form), the codec most
    real-world OCF files ship with."""
    if len(sync) != 16:
        raise AvroFormatError("sync marker must be 16 bytes")
    if codec not in ("null", "deflate"):
        raise AvroFormatError(f"unsupported codec {codec!r}")
    fields = _fields(schema)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(MAGIC)
    out += _zz_encode(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out += _zz_encode(len(kb)) + kb + _zz_encode(len(v)) + v
    out += _zz_encode(0)
    out += sync
    for start in range(0, len(rows), block_rows):
        chunk = rows[start:start + block_rows]
        body = bytearray()
        for row in chunk:
            for name, typ in fields:
                body += _encode_value(row[name], typ)
        payload = bytes(body)
        if codec == "deflate":
            import zlib

            co = zlib.compressobj(wbits=-15)
            payload = co.compress(payload) + co.flush()
        out += _zz_encode(len(chunk)) + _zz_encode(len(payload)) + payload + sync
    return bytes(out)


def read_ocf(data: bytes) -> tuple[dict, list[dict]]:
    """Parse a null-codec OCF; verifies magic and EVERY block's sync
    marker (the splittability anchor). Returns (schema, rows)."""
    if data[:4] != MAGIC:
        raise AvroFormatError("bad magic")
    pos = 4
    n_meta, pos = _zz_decode(data, pos)
    meta: dict[str, bytes] = {}
    while n_meta != 0:
        if n_meta < 0:  # blocked encoding: |count| + byte size
            n_meta = -n_meta
            _, pos = _zz_decode(data, pos)
        for _ in range(n_meta):
            kl, pos = _zz_decode(data, pos)
            key = data[pos:pos + kl].decode()
            pos += kl
            vl, pos = _zz_decode(data, pos)
            meta[key] = data[pos:pos + vl]
            pos += vl
        n_meta, pos = _zz_decode(data, pos)
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b"deflate"):
        raise AvroFormatError(f"unsupported codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    fields = _fields(schema)
    if pos + 16 > len(data):
        raise AvroFormatError("truncated header sync marker")
    sync = data[pos:pos + 16]
    pos += 16
    rows: list[dict] = []
    while pos < len(data):
        count, pos = _zz_decode(data, pos)
        size, pos = _zz_decode(data, pos)
        end = pos + size
        if end + 16 > len(data):
            raise AvroFormatError("truncated block")
        block = data[pos:end]
        if codec == b"deflate":
            import zlib

            try:
                block = zlib.decompress(block, wbits=-15)
            except zlib.error as exc:
                raise AvroFormatError(f"bad deflate block: {exc}") from exc
        bpos = 0
        for _ in range(count):
            row = {}
            for name, typ in fields:
                row[name], bpos = _decode_value(block, bpos, typ)
            rows.append(row)
        if bpos != len(block):
            raise AvroFormatError("block size mismatch")
        pos = end
        if data[pos:pos + 16] != sync:
            raise AvroFormatError("sync marker mismatch")
        pos += 16
    return schema, rows
