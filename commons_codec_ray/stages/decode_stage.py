"""The decode stage: envelope batches → op-record batches.

A callable CLASS for ``map_batches(DecodeEnvelopes(cfg), ...)`` — per-actor
setup (decoder dispatch table, column-type coercers) happens once in
``__init__``; per-batch work is ``__call__``. The irregular JSON parse is
the one place the engine runs a Python loop per row (the envelopes are
heterogeneous JSON — the analog of the reference's per-event ``to_sql``);
everything around it (timestamp parsing, partition assignment, LWW
combine) is vectorized Arrow/numpy.

Dead letters: undecodable envelopes become OP_DEAD rows carrying the
error and raw payload (in ``aux``) instead of failing the task —
downstream they are split off to a dead-letter sink. The reference
instead raises per event (transform/dynamodb.py:180-214,
transform/aws_dms.py:163-166); at 10^10 events a poison message must not
kill the job.

The ``combine=True`` mode runs a within-batch last-writer-wins partial
reduce before the shuffle (same idea as a combiner before a groupby):
only the max-LSN op per (conv_id, turn_idx) leaves the batch, shrinking
the all-to-all exchange under update-heavy workloads.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

try:  # orjson ships with Ray; ~4× faster loads. Fallback: stdlib.
    import orjson

    _loads = orjson.loads
except ImportError:  # pragma: no cover
    _loads = json.loads

from commons_codec_ray.config import PipelineConfig
from commons_codec_ray.decode.dialects import DECODERS
from commons_codec_ray.hashing import partition_ids_for
from commons_codec_ray.schemas import OP_DEAD, OPS_SCHEMA
from commons_codec_ray.stages.applier import lww_combine_batch

_KNOWN = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


class DecodeEnvelopes:
    def __init__(self, config: PipelineConfig | None = None, combine: bool = True):
        self.config = config or PipelineConfig()
        self.combine = combine
        self.decoders = dict(DECODERS)
        self.loads = _loads

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        dialects = batch["dialect"].to_pylist()
        lsns = batch["lsn"].to_pylist()
        offsets = batch["source_offset"].to_pylist()
        n = len(payloads)

        ops: list[int] = []
        conv_id: list = []
        turn_idx: list = []
        role: list = []
        text: list = []
        tool: list = []
        ts_raw: list = []
        aux: list = []
        lsn_out: list = []
        off_out: list = []
        error: list = []

        loads = self.loads
        decoders = self.decoders
        append = ops.append

        for i in range(n):
            try:
                decoded = decoders[dialects[i]](loads(payloads[i]))
            except Exception as exc:  # noqa: BLE001 — any poison envelope → dead letter
                append(OP_DEAD)
                conv_id.append(None)
                turn_idx.append(None)
                role.append(None)
                text.append(None)
                tool.append(None)
                ts_raw.append(None)
                aux.append(payloads[i])
                lsn_out.append(lsns[i])
                off_out.append(offsets[i])
                error.append(f"{type(exc).__name__}: {exc}")
                continue
            for op, rec, extra in decoded:
                append(op)
                cid = rec.get("conv_id")
                conv_id.append(str(cid) if cid is not None else None)
                ti = rec.get("turn_idx")
                turn_idx.append(int(ti) if ti is not None else None)
                role.append(rec.get("role"))
                text.append(rec.get("text"))
                tool.append(rec.get("tool"))
                ts_raw.append(rec.get("ts"))
                spill = {k: v for k, v in rec.items() if k not in _KNOWN}
                if extra:
                    spill.update(extra)
                aux.append(json.dumps(spill, default=str, sort_keys=True) if spill else None)
                lsn_out.append(lsns[i])
                off_out.append(offsets[i])
                error.append(None)

        # ISO strings → timestamp[us] via a single vectorized Arrow cast
        ts_col = pa.array(ts_raw, type=pa.string()).cast(pa.timestamp("us"))
        conv_col = pa.array(conv_id, type=pa.string())
        tbl = pa.table(
            {
                "op": pa.array(ops, type=pa.int8()),
                "conv_id": conv_col,
                "turn_idx": pa.array(turn_idx, type=pa.int32()),
                "role": pa.array(role, type=pa.string()),
                "text": pa.array(text, type=pa.string()),
                "tool": pa.array(tool, type=pa.string()),
                "ts": ts_col,
                "aux": pa.array(aux, type=pa.string()),
                "lsn": pa.array(lsn_out, type=pa.int64()),
                "source_offset": pa.array(off_out, type=pa.int64()),
                "partition_id": partition_ids_for(conv_col, self.config.num_partitions),
                "error": pa.array(error, type=pa.string()),
            },
            schema=OPS_SCHEMA,
        )
        if self.combine:
            tbl = lww_combine_batch(tbl)
        return tbl


def split_dead_letters(ops: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(good ops, dead letters) from a decoded batch."""
    mask = pc.equal(ops["op"], OP_DEAD)
    return ops.filter(pc.invert(mask)), ops.filter(mask)
