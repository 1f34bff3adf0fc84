"""Single-process oracle replay — the faithful sequential reference.

Mirrors the reference's relay loop shape (one event at a time, in log
order; reference examples/mongodb_cdc_cratedb.py:39-61): decode each
envelope with the same dialect decoders, keep an in-memory dict keyed by
``(conv_id, turn_idx)`` with last-writer-wins on lsn, return the final
table. Used (a) as the correctness oracle in tests (the distributed
pipeline must match it byte-for-byte) and (b) as the single-thread
throughput anchor in bench.py.
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

from commons_codec_ray.decode.dialects import DECODERS
from commons_codec_ray.schemas import OP_DELETE, OP_UPSERT, TRANSCRIPT_SCHEMA


def replay_envelopes(envelopes: pa.Table) -> pa.Table:
    """Sequential replay of an envelope table (lsn, dialect, payload)."""
    order = pa.compute.sort_indices(envelopes["lsn"])
    envelopes = envelopes.take(order)
    payloads = envelopes["payload"].to_pylist()
    dialects = envelopes["dialect"].to_pylist()
    lsns = envelopes["lsn"].to_pylist()

    state: dict[tuple[str, int], tuple[int, dict[str, Any]]] = {}
    dead = 0
    for i in range(len(payloads)):
        try:
            decoded = DECODERS[dialects[i]](json.loads(payloads[i]))
        except Exception:  # noqa: BLE001
            dead += 1
            continue
        for op, rec, _aux in decoded:
            if op not in (OP_UPSERT, OP_DELETE):
                continue
            key = (str(rec["conv_id"]), int(rec["turn_idx"]))
            lsn = lsns[i]
            prev = state.get(key)
            if prev is not None and prev[0] > lsn:
                continue
            if op == OP_DELETE:
                state[key] = (lsn, None)
            else:
                state[key] = (lsn, rec)

    rows = [
        {
            "conv_id": k[0],
            "turn_idx": k[1],
            "role": rec.get("role"),
            "text": rec.get("text"),
            "tool": rec.get("tool"),
            "ts": rec.get("ts"),
        }
        for k, (_, rec) in state.items()
        if rec is not None
    ]
    if not rows:
        return TRANSCRIPT_SCHEMA.empty_table()
    tbl = pa.Table.from_pylist(rows)
    ts = tbl["ts"].cast(pa.string()).cast(pa.timestamp("us"))
    tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts)
    return tbl.cast(TRANSCRIPT_SCHEMA)


def sorted_canonical(tbl: pa.Table) -> pa.Table:
    """Stable (conv_id, turn_idx, ts) ordering for byte-equality checks."""
    cols = [("conv_id", "ascending"), ("turn_idx", "ascending"), ("ts", "ascending")]
    return tbl.sort_by([c for c in cols if c[0] in tbl.column_names])
