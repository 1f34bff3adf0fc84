"""Pure-Python Protocol Buffers wire-format codec (public spec,
https://protobuf.dev/programming-guides/encoding/ — completing the
in-sandbox wire-codec trio next to ``bson_wire.py`` and
``avro_wire.py``): enough of the proto3 encoding to stage and ingest
Kafka-style protobuf event payloads without a protobuf library.

Supported subset — scalar fields of types:

- ``int64`` / ``uint64`` / ``bool`` (wire type 0, base-128 varints;
  int64 negatives use the 10-byte two's-complement varint form),
- ``sint64`` (wire type 0, zigzag),
- ``double`` (wire type 1, 64-bit IEEE LE),
- ``string`` / ``bytes`` (wire type 2, length-delimited).

Messages are described by a field map ``{field_number: (name, type)}``
(the role a compiled descriptor plays). proto3 semantics implemented:
fields may appear in any order, LAST occurrence of a scalar wins,
missing fields take the type's default (0 / "" / b"" / False), unknown
field numbers are SKIPPED by wire type (forward compatibility — the
property that matters for schema evolution on a CDC bus). Unknown wire
types raise loudly.

Per-record decoding is a Python loop — the documented irregular-format
exception; shard files are decoded whole inside one map_batches task.
"""

from __future__ import annotations

import struct
from typing import Any

_DEFAULTS = {
    "int64": 0,
    "uint64": 0,
    "sint64": 0,
    "bool": False,
    "double": 0.0,
    "string": "",
    "bytes": b"",
}


class ProtoFormatError(ValueError):
    pass


def _varint_encode(u: int) -> bytes:
    if u < 0:
        raise ProtoFormatError("varint must be non-negative")
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _varint_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        if pos >= len(buf):
            raise ProtoFormatError("truncated varint")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, pos
        shift += 7
        if shift > 70:
            raise ProtoFormatError("varint too long")


def encode_message(fields: dict[int, tuple[str, str]], row: dict[str, Any]) -> bytes:
    """Encode one message; fields with default values are OMITTED
    (proto3 rule), so defaults round-trip through decode's backfill."""
    out = bytearray()
    for num in sorted(fields):
        name, typ = fields[num]
        v = row.get(name, _DEFAULTS[typ])
        if v == _DEFAULTS[typ] and not (typ == "double" and str(v) == "-0.0"):
            continue
        if typ in ("int64", "uint64", "bool"):
            u = int(v)
            if u < 0:
                u += 1 << 64  # two's-complement 10-byte varint form
            out += _varint_encode(num << 3 | 0) + _varint_encode(u)
        elif typ == "sint64":
            n = int(v)
            out += _varint_encode(num << 3 | 0) + _varint_encode(
                ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
            )
        elif typ == "double":
            out += _varint_encode(num << 3 | 1) + struct.pack("<d", float(v))
        elif typ in ("string", "bytes"):
            b = v.encode("utf-8") if typ == "string" else bytes(v)
            out += _varint_encode(num << 3 | 2) + _varint_encode(len(b)) + b
        else:
            raise ProtoFormatError(f"unsupported type {typ!r}")
    return bytes(out)


def decode_message(fields: dict[int, tuple[str, str]], buf: bytes) -> dict[str, Any]:
    row: dict[str, Any] = {name: _DEFAULTS[typ] for name, typ in fields.values()}
    pos = 0
    while pos < len(buf):
        tag, pos = _varint_decode(buf, pos)
        num, wt = tag >> 3, tag & 7
        spec = fields.get(num)
        if wt == 0:
            u, pos = _varint_decode(buf, pos)
            if spec is None:
                continue
            name, typ = spec
            if typ == "sint64":
                row[name] = (u >> 1) ^ -(u & 1)
            elif typ == "bool":
                row[name] = u != 0
            elif typ in ("int64", "uint64"):
                row[name] = u - (1 << 64) if typ == "int64" and u >= 1 << 63 else u
            else:
                raise ProtoFormatError(f"wire type 0 for {typ}")
        elif wt == 1:
            if pos + 8 > len(buf):
                raise ProtoFormatError("truncated 64-bit field")
            if spec is not None:
                name, typ = spec
                if typ != "double":
                    raise ProtoFormatError(f"wire type 1 for {typ}")
                row[name] = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif wt == 2:
            n, pos = _varint_decode(buf, pos)
            if n < 0 or pos + n > len(buf):
                raise ProtoFormatError("bad length prefix")
            if spec is not None:
                name, typ = spec
                raw = buf[pos:pos + n]
                if typ == "string":
                    row[name] = raw.decode("utf-8")
                elif typ == "bytes":
                    row[name] = raw
                else:
                    raise ProtoFormatError(f"wire type 2 for {typ}")
            pos += n
        elif wt == 5:  # I32: skippable for UNKNOWN fields (forward compat)
            if pos + 4 > len(buf):
                raise ProtoFormatError("truncated 32-bit field")
            if spec is not None:
                name, typ = spec
                raise ProtoFormatError(f"wire type 5 for {typ}")
            pos += 4
        else:
            raise ProtoFormatError(f"unsupported wire type {wt}")
    return row


def encode_frames(
    fields: dict[int, tuple[str, str]], rows: list[dict[str, Any]]
) -> bytes:
    """Length-prefixed message stream (the standard varint framing for
    protobuf on a byte stream / Kafka batch file)."""
    out = bytearray()
    for row in rows:
        msg = encode_message(fields, row)
        out += _varint_encode(len(msg)) + msg
    return bytes(out)


def decode_frames(
    fields: dict[int, tuple[str, str]], data: bytes
) -> list[dict[str, Any]]:
    rows = []
    pos = 0
    while pos < len(data):
        n, pos = _varint_decode(data, pos)
        if pos + n > len(data):
            raise ProtoFormatError("truncated frame")
        rows.append(decode_message(fields, data[pos:pos + n]))
        pos += n
    return rows
