"""Deterministic CDC-envelope synthesis from the driver's `events` table.

The sandbox provides a deterministic `events.parquet`
(event_id, ts, user_id, event_type, value, props). We derive the CDC
change stream from it with a PURE, SQL-expressible mapping so the DuckDB
oracle can compute the expected final lake state independently:

    conv_id  = 'c-' || user_id
    turn_idx = event_id % 40                       (int32)
    op       = DELETE if event_id % 10 == 7 else UPSERT
    role     = event_type
    text     = props            (opaque string payload)
    tool     = 'search' if value >= 50 else NULL
    ts       = ts
    lsn      = event_id         (monotone log sequence number)

Each logical op is then *encoded* into one of three envelope dialects
(chosen by ``event_id % 3``) and later decoded back by the engine's
decoders — a lossless round trip, so correctness of decode+apply is
verifiable against the SQL oracle that skips the envelope hop.

Dialect shapes follow the reference's test corpora (see FIXTURES.md §3):
  - DynamoDB-Streams-style: eventSource/eventName/dynamodb{Keys,NewImage}
    with type descriptors (reference transform/dynamodb.py:173-224,
    tests/transform/test_dynamodb_cdc.py:21-180)
  - Debezium/DMS-style: data/metadata{operation,...}
    (reference transform/aws_dms.py:447-452, tests/transform/test_aws_dms_universal.py:77-160)
  - MySQL-binlog-style: op/table/rows[{before,after}]
    (op taxonomy per reference transform/mongodb.py:304-348)

Duplicate deliveries (same lsn re-sent, ``event_id % 13 == 3``) simulate
Lambda retry storms — the reference handles these with
``ON CONFLICT DO NOTHING`` (transform/dynamodb.py:186-195, CHANGES.md);
our engine dedups them in LWW apply. Optional corruption
(``event_id % 97 == 13``) produces undecodable envelopes for the
dead-letter path (reference raises ValueError,
transform/dynamodb.py:180-214).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

DIALECTS = ("debezium", "binlog", "ddbstream")

# Logical-op intermediate produced by the mapping above.
_UPSERT = "upsert"
_DELETE = "delete"


def logical_ops_from_events(batch: pa.Table) -> dict[str, np.ndarray]:
    """events columns → logical op columns (all numpy / object arrays)."""
    event_id = batch["event_id"].to_numpy(zero_copy_only=False)
    user_id = batch["user_id"].to_numpy(zero_copy_only=False)
    event_type = batch["event_type"].to_numpy(zero_copy_only=False)
    value = batch["value"].to_numpy(zero_copy_only=False)
    props = batch["props"].to_numpy(zero_copy_only=False)
    ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)  # µs since epoch

    conv_id = np.char.add("c-", user_id.astype(str))
    turn_idx = (event_id % 40).astype(np.int32)
    is_delete = (event_id % 10) == 7
    tool = np.where(value >= 50, "search", None)
    return {
        "conv_id": conv_id.astype(object),
        "turn_idx": turn_idx,
        "is_delete": is_delete,
        "role": event_type,
        "text": props,
        "tool": tool,
        "ts_us": ts,
        "lsn": event_id.astype(np.int64),
    }


def _iso_strings(ts_us: np.ndarray) -> np.ndarray:
    return np.datetime_as_string(ts_us.astype("datetime64[us]"), unit="us")


def encode_debezium(conv_id, turn_idx, is_del, role, text, tool, ts_iso, lsn,
                    extra: dict | None = None) -> str:
    if is_del:
        data = {"conv_id": conv_id, "turn_idx": int(turn_idx), "role": None,
                "text": None, "tool": None, "ts": None}
        op = "delete"
    else:
        data = {"conv_id": conv_id, "turn_idx": int(turn_idx), "role": role,
                "text": text, "tool": tool, "ts": ts_iso}
        if extra:
            data.update(extra)
        op = "update" if lsn % 2 else "insert"  # both map to UPSERT (full image)
    return json.dumps(
        {
            "data": data,
            "before-image": {},
            "metadata": {
                "operation": op,
                "schema-name": "public",
                "table-name": "transcripts",
                "commit-timestamp": ts_iso,
                "stream-position": f"{lsn:016x}",
                "transaction-id": int(lsn),
                "record-type": "data",
            },
        },
        separators=(",", ":"),
    )


def encode_binlog(conv_id, turn_idx, is_del, role, text, tool, ts_iso, lsn) -> str:
    key = {"conv_id": conv_id, "turn_idx": int(turn_idx)}
    if is_del:
        body = {"op": "delete_rows", "rows": [{"before": key, "after": None}]}
    else:
        after = dict(key, role=role, text=text, tool=tool, ts=ts_iso)
        op = "update_rows" if lsn % 2 else "write_rows"
        body = {"op": op, "rows": [{"before": None, "after": after}]}
    body.update(
        {
            "table": {"schema": "public", "name": "transcripts"},
            "log_pos": int(lsn),
            "server_id": 1,
        }
    )
    return json.dumps(body, separators=(",", ":"))


def encode_ddbstream(conv_id, turn_idx, is_del, role, text, tool, ts_iso, lsn) -> str:
    keys = {"conv_id": {"S": conv_id}, "turn_idx": {"N": str(int(turn_idx))}}
    ddb: dict = {"Keys": keys, "ApproximateCreationDateTime": int(lsn)}
    if is_del:
        name = "REMOVE"
    else:
        img = dict(keys)
        img["role"] = {"S": role}
        img["text"] = {"S": text}
        img["tool"] = {"NULL": True} if tool is None else {"S": tool}
        img["ts"] = {"S": ts_iso}
        ddb["NewImage"] = img
        name = "MODIFY" if lsn % 2 else "INSERT"
    return json.dumps(
        {"eventSource": "aws:dynamodb", "eventName": name, "dynamodb": ddb},
        separators=(",", ":"),
    )


def encode_maxwell(conv_id, turn_idx, is_del, role, text, tool, ts_iso, lsn) -> str:
    """Maxwell's daemon JSON envelope (public format: database/table/
    type/ts/xid/data, full new image on insert/update, key row on
    delete)."""
    key = {"conv_id": conv_id, "turn_idx": int(turn_idx)}
    if is_del:
        data = key
        typ = "delete"
    else:
        data = dict(key, role=role, text=text, tool=tool, ts=ts_iso)
        typ = "update" if lsn % 2 else "insert"
    return json.dumps(
        {
            "database": "public",
            "table": "transcripts",
            "type": typ,
            "ts": int(lsn),
            "xid": int(lsn),
            "commit": True,
            "data": data,
        },
        separators=(",", ":"),
    )


# Canal serializes every cell as a STRING (JDBC-typed via sqlType);
# the decoder recovers native types from the sqlType map.
CANAL_SQLTYPE = {"conv_id": 12, "turn_idx": 4, "role": 12, "text": 12, "tool": 12, "ts": 93}
_CANAL_MYSQLTYPE = {
    "conv_id": "varchar(64)", "turn_idx": "int(11)", "role": "varchar(32)",
    "text": "mediumtext", "tool": "varchar(32)", "ts": "datetime(6)",
}


def encode_canal(conv_id, turn_idx, is_del, role, text, tool, ts_iso, lsn) -> str:
    """Alibaba Canal flat-JSON envelope (public format: data[] of
    all-string rows, pkNames, sqlType/mysqlType maps, type
    INSERT/UPDATE/DELETE, isDdl)."""
    if is_del:
        rows = [{"conv_id": conv_id, "turn_idx": str(int(turn_idx))}]
        typ = "DELETE"
    else:
        rows = [
            {
                "conv_id": conv_id,
                "turn_idx": str(int(turn_idx)),
                "role": role,
                "text": text,
                "tool": tool,  # None serializes as JSON null
                "ts": ts_iso,
            }
        ]
        typ = "UPDATE" if lsn % 2 else "INSERT"
    return json.dumps(
        {
            "data": rows,
            "database": "public",
            "es": int(lsn),
            "id": int(lsn),
            "isDdl": False,
            "mysqlType": _CANAL_MYSQLTYPE,
            "old": None,
            "pkNames": ["conv_id", "turn_idx"],
            "sql": "",
            "sqlType": CANAL_SQLTYPE,
            "table": "transcripts",
            "ts": int(lsn),
            "type": typ,
        },
        separators=(",", ":"),
    )


def encode_connect(conv_id, turn_idx, is_del, role, text, tool, ts_iso, lsn) -> str:
    """Kafka Connect JsonConverter envelope (``schemas.enable=true``)
    wrapping a native Debezium before/after/op record — the shape every
    Kafka-relayed Debezium deployment actually ships: a ``schema``
    struct header plus the ``payload`` with op ∈ c/u/d and full row
    images."""
    key = {"conv_id": conv_id, "turn_idx": int(turn_idx)}
    if is_del:
        payload = {"before": key, "after": None, "op": "d"}
    else:
        after = dict(key, role=role, text=text, tool=tool, ts=ts_iso)
        payload = {"before": None, "after": after, "op": "u" if lsn % 2 else "c"}
    payload["ts_ms"] = int(lsn)
    payload["source"] = {"db": "public", "table": "transcripts", "lsn": int(lsn)}
    return json.dumps(
        {
            "schema": {
                "type": "struct",
                "name": "public.transcripts.Envelope",
                "optional": False,
                "fields": [
                    {"field": "before", "type": "struct", "optional": True},
                    {"field": "after", "type": "struct", "optional": True},
                    {"field": "op", "type": "string", "optional": False},
                ],
            },
            "payload": payload,
        },
        separators=(",", ":"),
    )


def encode_mongo(conv_id, turn_idx, is_del, role, text, tool, ts_iso, lsn) -> str:
    """MongoDB change-stream envelope (public watch() event shape):
    operationType ∈ insert/update/replace (full image via
    ``fullDocument``, the ``updateLookup`` subscription form) or delete
    (``documentKey`` only). Values are CANONICAL Extended JSON
    ($oid/$numberInt/$date) so the decode path exercises the typed
    kernels; documentKey carries the shard-key fields next to _id (the
    sharded-collection documentKey shape)."""
    # deterministic 24-hex ObjectId derived from the logical key
    oid = f"{int(conv_id[2:]):016x}{int(turn_idx):08x}"
    key = {
        "_id": {"$oid": oid},
        "conv_id": conv_id,
        "turn_idx": {"$numberInt": str(int(turn_idx))},
    }
    body: dict = {"documentKey": key}
    if is_del:
        body["operationType"] = "delete"
    else:
        body["operationType"] = ("insert", "update", "replace")[lsn % 3]
        full = dict(key)
        full["role"] = role
        full["text"] = text
        full["tool"] = tool  # None → JSON null
        full["ts"] = {"$date": ts_iso}
        body["fullDocument"] = full
    body["ns"] = {"db": "public", "coll": "transcripts"}
    body["clusterTime"] = {"$timestamp": {"t": int(lsn), "i": 1}}
    return json.dumps(body, separators=(",", ":"))


def encode_dbz_mongo(conv_id, turn_idx, is_del, role, text, tool, ts_iso, lsn) -> str:
    """Debezium MongoDB connector envelope (public Kafka wire format):
    row images ride as Extended-JSON STRINGS — ``after`` for c/r/u,
    ``filter`` for deletes."""
    oid = f"{int(conv_id[2:]):016x}{int(turn_idx):08x}"
    key = {
        "_id": {"$oid": oid},
        "conv_id": conv_id,
        "turn_idx": {"$numberInt": str(int(turn_idx))},
    }
    if is_del:
        body = {"op": "d", "after": None, "filter": json.dumps(key, separators=(",", ":"))}
    else:
        full = dict(key)
        full["role"] = role
        full["text"] = text
        full["tool"] = tool
        full["ts"] = {"$date": ts_iso}
        body = {
            "op": ("c", "u", "r")[lsn % 3],
            "after": json.dumps(full, separators=(",", ":")),
            "filter": None,
        }
    body["source"] = {"db": "public", "collection": "transcripts", "lsn": int(lsn)}
    body["ts_ms"] = int(lsn)
    return json.dumps(body, separators=(",", ":"))


_ENCODERS = {
    "debezium": encode_debezium,
    "dbz_mongo": encode_dbz_mongo,
    "binlog": encode_binlog,
    "ddbstream": encode_ddbstream,
    "maxwell": encode_maxwell,
    "canal": encode_canal,
    "connect": encode_connect,
    "mongo": encode_mongo,
}

# fixed order for the all-dialect round-robin (lsn % len)
ALL_DIALECTS = (
    "debezium", "binlog", "ddbstream", "maxwell",
    "canal", "connect", "mongo", "dbz_mongo",
)


class EventsToEnvelopes:
    """map_batches stage: events rows → CDC envelope rows.

    Output columns: lsn:int64, source_offset:int64, dialect:string,
    payload:string(JSON), conv_id:string (promoted for partitioning
    without a full decode).

    Options
    -------
    dialect: fix one dialect, or None → ``event_id % 3`` round-robin.
    duplicate_rate: re-emit rows with ``event_id % 13 == 3`` (same lsn,
        same payload) to exercise idempotent apply.
    corrupt: replace payloads where ``event_id % 97 == 13`` with
        malformed JSON (dead-letter path).
    """

    def __init__(
        self,
        dialect: str | None = None,
        duplicates: bool = True,
        corrupt: bool = False,
        lsn_offset: int = 0,
        extra_int_field: str | None = None,
        extra_real_field: str | None = None,
    ):
        self.dialect = dialect
        self.duplicates = duplicates
        self.corrupt = corrupt
        # lsn_offset shifts the log-sequence space so the bench can replay
        # the same key set repeatedly (replica r = one more update round
        # per key — deterministic LWW-heavy amplification, no external data)
        self.lsn_offset = lsn_offset
        # extra_int_field: upsert payloads additionally carry
        # ``{field: floor(value)}`` — the post-ALTER wider row shape for
        # the schema-evolution replay (the engine must learn the column
        # from an in-band control event, not from config). Debezium-only:
        # other dialects' image encodings would change the field's type.
        self.extra_int_field = extra_int_field
        # extra_real_field: like extra_int_field but the payload carries
        # the RAW float value — the post-widening row shape (INT32 →
        # REAL8) for the type-widening replay
        self.extra_real_field = extra_real_field
        if dialect is not None and dialect != "all" and dialect not in _ENCODERS:
            raise ValueError(f"unknown dialect {dialect!r} (have {sorted(_ENCODERS)})")
        if (extra_int_field or extra_real_field) and dialect != "debezium":
            raise ValueError("extra fields require dialect='debezium'")
        if extra_int_field and extra_real_field:
            raise ValueError("pass only one of extra_int_field / extra_real_field")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ops = logical_ops_from_events(batch)
        lsn = ops["lsn"] + self.lsn_offset
        n = len(lsn)
        ts_iso = _iso_strings(ops["ts_us"])
        if self.dialect is None:
            dialect_idx = (lsn % 3).astype(np.int64)
            dialect_names = DIALECTS
        elif self.dialect == "all":
            # every dialect in one stream — the mixed-bus ingest shape
            dialect_idx = (lsn % len(ALL_DIALECTS)).astype(np.int64)
            dialect_names = ALL_DIALECTS
        else:
            # explicit dialect may be OUTSIDE the round-robin triple
            # (maxwell/canal): index into a one-element name table
            dialect_idx = np.zeros(n, dtype=np.int64)
            dialect_names = (self.dialect,)
        corrupt_mask = ((lsn % 97) == 13) if self.corrupt else np.zeros(n, dtype=bool)

        conv = ops["conv_id"]
        turn = ops["turn_idx"]
        is_del = ops["is_delete"]
        role = ops["role"]
        text = ops["text"]
        tool = ops["tool"]

        extra_vals = None
        extra_name = self.extra_int_field or self.extra_real_field
        if self.extra_int_field is not None:
            extra_vals = np.floor(
                batch["value"].to_numpy(zero_copy_only=False)
            ).astype(np.int64)
        elif self.extra_real_field is not None:
            extra_vals = batch["value"].to_numpy(zero_copy_only=False)

        payloads = np.empty(n, dtype=object)
        dialects = np.empty(n, dtype=object)
        for i in range(n):
            d = dialect_names[dialect_idx[i]]
            dialects[i] = d
            if corrupt_mask[i]:
                payloads[i] = '{"this-is": "not-a-valid-envelope", "lsn": %d' % lsn[i]
            elif extra_vals is not None:
                v = extra_vals[i]
                payloads[i] = encode_debezium(
                    conv[i], turn[i], bool(is_del[i]), role[i], text[i], tool[i],
                    ts_iso[i], int(lsn[i]),
                    extra={
                        extra_name: int(v) if self.extra_int_field else float(v)
                    },
                )
            else:
                payloads[i] = _ENCODERS[d](
                    conv[i], turn[i], bool(is_del[i]), role[i], text[i], tool[i], ts_iso[i], int(lsn[i])
                )

        out = {
            "lsn": lsn,
            "source_offset": lsn.copy(),
            "dialect": dialects,
            "payload": payloads,
            "conv_id": conv,
        }
        tbl = pa.table(
            {
                "lsn": pa.array(out["lsn"], type=pa.int64()),
                "source_offset": pa.array(out["source_offset"], type=pa.int64()),
                "dialect": pa.array(out["dialect"], type=pa.string()),
                "payload": pa.array(out["payload"], type=pa.string()),
                "conv_id": pa.array(out["conv_id"], type=pa.string()),
            }
        )
        if self.duplicates:
            dup_mask = (lsn % 13) == 3
            if dup_mask.any():
                tbl = pa.concat_tables([tbl, tbl.filter(pa.array(dup_mask))])
        return tbl
