"""Stateful applier actor pool — the streaming hot path.

The Dataset path (``groupby("partition_id").map_groups``) re-reads every
partition's base state from Parquet each epoch and pays a sort-based
shuffle. For a long-running ingest job that applies many epochs, the
right shape (SURVEY.md §2.4/§3.4; the north star's "stateful actor-pool
appliers … in-actor Arrow-backed state table") is:

- ``A`` **applier actors**, each owning the fixed partition set
  ``{pid : pid % A == actor_id}``; partition state (transcript rows +
  ``_lsn``) lives in actor memory across epochs, loaded from the last
  checkpoint once at start;
- ``K`` **decode tasks** per epoch (raw ``@ray.remote``), each reading a
  row-group slice of the envelope log, decoding, LWW-combining within
  the slice, and hash-splitting its output into ``A`` sub-tables
  returned as separate objects (``num_returns=A``) — an explicit hash
  exchange through the object store, no sampling, no sort;
- each actor merges its ``K`` sub-tables into its state, writes its
  partition files for the epoch (tmp + atomic rename), and returns
  lineage rows; the driver commits the manifest + checkpoint exactly as
  in the Dataset path.

This is one of the few places the engine drops below the Dataset API —
justified because the exchange key space is small and static (``P``
partitions), which Ray's generic sort/hash shuffles cannot exploit, and
because applier state must persist across epochs.

Failure semantics: tasks/actors are deterministic given (checkpoint,
epoch op set); any failure aborts the epoch, and a rerun resumes from
the last committed checkpoint (fresh actors reload base state). The
commit protocol in :mod:`commons_codec_ray.sink.manifest` is unchanged.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any


import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from commons_codec_ray.config import PipelineConfig
from commons_codec_ray.schemas import OP_DEAD, OP_SCHEMA_CHANGE
from commons_codec_ray.stages.applier import apply_ops_to_base
from commons_codec_ray.stages.decode_stage import DecodeEnvelopes


@ray.remote
def decode_split_task(
    file_slices: list[tuple[str, list[int]]],
    lo: int,
    hi: int,
    config: PipelineConfig,
    num_actors: int,
) -> Any:
    """Read assigned row groups, decode, split by ``pid % num_actors``.

    Returns ``num_actors + 1`` objects: one ops sub-table per actor plus
    a trailing dead-letter table (kept separate so appliers stay on the
    data-only fast path).
    """
    decode = DecodeEnvelopes(config, combine=True)
    parts: list[pa.Table] = []
    for path, row_groups in file_slices:
        f = pq.ParquetFile(path)
        tbl = f.read_row_groups(row_groups)
        off = tbl["source_offset"]
        mask = pc.and_(pc.greater_equal(off, pa.scalar(lo)), pc.less(off, pa.scalar(hi)))
        tbl = tbl.filter(mask)
        if tbl.num_rows:
            parts.append(decode(tbl))
    if parts:
        ops = pa.concat_tables(parts)
    else:
        from commons_codec_ray.schemas import empty_ops_table

        ops = empty_ops_table()

    dead = ops.filter(pc.equal(ops["op"], pa.scalar(OP_DEAD, pa.int8())))
    data = ops.filter(pc.less(ops["op"], pa.scalar(OP_SCHEMA_CHANGE, pa.int8())))
    pid = data["partition_id"].to_numpy(zero_copy_only=False)
    actor_of = pid % num_actors
    out = []
    for a in range(num_actors):
        out.append(data.filter(pa.array(actor_of == a)))
    out.append(dead.select(["lsn", "source_offset", "aux", "error"]))
    return tuple(out)


@ray.remote
class PartitionApplier:
    """Owns ``{pid : pid % A == actor_id}``; state lives across epochs."""

    def __init__(
        self,
        actor_id: int,
        num_actors: int,
        lake_root: str,
        base_partitions: dict[str, Any],
        extra_columns_json: str,
        sink_mode: str = "rewrite",
        compact_ratio: float = 0.5,
        compact_max_deltas: int = 8,
        state_budget_bytes: int | None = None,
        emit_changes: bool = False,
    ):
        from collections import OrderedDict

        from commons_codec_ray.sink.manifest import entry_files

        self.actor_id = actor_id
        self.num_actors = num_actors
        self.lake_root = Path(lake_root)
        self._pending: list[pa.Table] = []
        self._pending_rows = 0
        self.sink_mode = sink_mode
        self.compact_ratio = compact_ratio
        self.compact_max_deltas = compact_max_deltas
        self.state_budget_bytes = state_budget_bytes
        self.emit_changes = emit_changes
        self.extra_columns = [
            (n, _type_from_str(t)) for n, t in json.loads(extra_columns_json)
        ]
        # In-memory partition state is an LRU over (table, pid); each
        # entry is reconstructible from `state_files` (base + deltas on
        # disk), so eviction is always safe. With no budget, partitions
        # are loaded eagerly here (fastest steady-state); with a budget
        # they load lazily on first touch.
        self.state: "OrderedDict[tuple[str, int], pa.Table]" = OrderedDict()
        self.state_bytes = 0
        self.state_files: dict[tuple[str, int], tuple[str | None, list[str]]] = {}
        self.delta_info: dict[tuple[str, int], list[int]] = {}  # [n_deltas, delta_rows]
        # base FILE row counts — the compaction trigger compares against
        # these (NOT the merged in-memory state) so actor and Dataset
        # modes make identical compact/delta decisions
        self.base_rows: dict[tuple[str, int], int] = {}
        for key, entry in base_partitions.items():
            table, _, pid_s = key.partition("#")
            pid = int(pid_s)
            if pid % num_actors != actor_id:
                continue
            base_rel, delta_rels = entry_files(entry)
            if base_rel is None and not delta_rels:
                continue
            self.state_files[(table, pid)] = (base_rel, list(delta_rels))
            if base_rel:
                self.base_rows[(table, pid)] = pq.read_metadata(
                    self.lake_root / base_rel
                ).num_rows
            if delta_rels:
                drows = sum(
                    pq.ParquetFile(self.lake_root / d).metadata.num_rows for d in delta_rels
                )
                self.delta_info[(table, pid)] = [len(delta_rels), drows]
            if self.state_budget_bytes is None:
                self._load_state(table, pid)

    def _load_state(self, table: str, pid: int) -> pa.Table | None:
        """Load (and cache) a partition's current state from its files."""
        from commons_codec_ray.stages.applier import merge_base_with_deltas

        key = (table, pid)
        files = self.state_files.get(key)
        if files is None:
            return None
        base_rel, delta_rels = files
        base = pq.read_table(self.lake_root / base_rel) if base_rel else None
        if delta_rels:
            deltas = [pq.read_table(self.lake_root / d) for d in delta_rels]
            tbl = merge_base_with_deltas(base, deltas, self.extra_columns)
        elif base is not None:
            tbl = base
        else:
            return None
        self._put_state(key, tbl)
        return tbl

    def _get_state(self, table: str, pid: int) -> pa.Table | None:
        key = (table, pid)
        if key in self.state:
            self.state.move_to_end(key)  # LRU touch
            return self.state[key]
        return self._load_state(table, pid)

    def _put_state(self, key: tuple[str, int], tbl: pa.Table) -> None:
        old = self.state.pop(key, None)
        if old is not None:
            self.state_bytes -= old.nbytes
        self.state[key] = tbl
        self.state_bytes += tbl.nbytes
        self._evict()

    def _evict(self) -> None:
        """Drop cold partitions until under budget; they reload from
        their committed/epoch files on next touch."""
        if self.state_budget_bytes is None:
            return
        # may drop the final partition too (pathological budgets where a
        # single partition exceeds it) — correctness unaffected, it
        # simply reloads on next touch
        while self.state_bytes > self.state_budget_bytes and self.state:
            _, tbl = self.state.popitem(last=False)
            self.state_bytes -= tbl.nbytes

    def set_extra_columns(self, extra_columns_json: str) -> None:
        self.extra_columns = [
            (n, _type_from_str(t)) for n, t in json.loads(extra_columns_json)
        ]

    def ingest(self, *op_tables: pa.Table) -> None:
        """Accumulate a decode task's output for this actor.

        Called once per decode task as its result becomes available —
        Ray queues the calls per actor, so merging overlaps the rest of
        the decode stage instead of waiting for a global barrier. A
        rolling LWW pre-reduce bounds memory: pending ops never exceed
        ~2× the combine threshold regardless of epoch size.
        """
        from commons_codec_ray.stages.applier import lww_reduce

        for t in op_tables:
            if t.num_rows:
                self._pending.append(t)
                self._pending_rows += t.num_rows
        if self._pending_rows > 2_000_000:
            reduced = lww_reduce(pa.concat_tables(self._pending, promote_options="permissive"))
            self._pending = [reduced]
            self._pending_rows = reduced.num_rows

    def flush_epoch(self, epoch: int, watermark_us: int | None = None) -> list[dict[str, Any]]:
        ops = (
            pa.concat_tables(self._pending, promote_options="permissive")
            if self._pending
            else None
        )
        self._pending, self._pending_rows = [], 0
        return self._apply(epoch, ops, watermark_us)

    def _apply(
        self, epoch: int, ops: pa.Table | None, watermark_us: int | None = None
    ) -> list[dict[str, Any]]:
        from commons_codec_ray.pipelines.cdc import safe_table_dir

        lineage: list[dict[str, Any]] = []
        if ops is None or ops.num_rows == 0:
            return lineage
        import numpy as np

        if "table_name" not in ops.column_names:
            ops = ops.append_column(
                "table_name", pa.array(["transcripts"] * ops.num_rows, pa.string())
            )
        from commons_codec_ray.stages.applier import epoch_delta

        # integer-coded (table, pid) split: dictionary codes + numpy masks —
        # per-pair string-equality scans measurably slow large epochs
        tcol = ops["table_name"].combine_chunks()
        tdict = tcol if pa.types.is_dictionary(tcol.type) else tcol.dictionary_encode()
        tcodes = tdict.indices.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        tnames = tdict.dictionary.to_pylist()
        pid_np = ops["partition_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        combo = (tcodes << 32) | pid_np
        for key in np.unique(combo):
            code, pid = int(key >> 32), int(key & 0xFFFFFFFF)
            table = tnames[code] or "transcripts"
            group = ops.filter(pa.array(combo == key))
            base = self._get_state(table, pid)
            from commons_codec_ray.pipelines.cdc import _watermark_stats

            wm_max, wm_late = _watermark_stats(group, watermark_us)
            out = apply_ops_to_base(base, group, self.extra_columns)

            # change feed: the actor already holds base state in memory,
            # so feed emission costs one vectorized merge — no file reads
            # in EITHER sink mode (the Dataset delta path must merge-on-
            # read the committed base+deltas for its feed; here it's free)
            n_changes = 0
            if self.emit_changes:
                from commons_codec_ray.stages.applier import change_feed

                cf = change_feed(base, group, self.extra_columns)
                n_changes = cf.num_rows
                if n_changes:
                    ch_dir = (
                        self.lake_root / "changes" / f"epoch-{epoch:08d}" / safe_table_dir(table)
                    )
                    ch_dir.mkdir(parents=True, exist_ok=True)
                    cpath = ch_dir / f"changes-{pid:04d}.parquet"
                    ctmp = cpath.with_suffix(f".tmp-{os.getpid()}")
                    pq.write_table(cf, ctmp)
                    os.replace(ctmp, cpath)

            # choose what to WRITE: full state, or just this epoch's delta
            kind = "full"
            write_tbl = out
            if self.sink_mode == "delta" and base is not None:
                n_deltas, drows = self.delta_info.get((table, pid), [0, 0])
                delta_tbl = epoch_delta(group, self.extra_columns)
                # compare against the base FILE's row count (tracked in
                # self.base_rows) exactly like the Dataset path does —
                # using the merged in-memory state's rows here would make
                # the two modes take different compact/delta decisions
                base_file_rows = self.base_rows.get((table, pid), 0)
                compact = (
                    n_deltas + 1 > self.compact_max_deltas
                    or (drows + delta_tbl.num_rows)
                    > self.compact_ratio * max(base_file_rows, 1)
                )
                if not compact:
                    kind = "delta"
                    write_tbl = delta_tbl
                    self.delta_info[(table, pid)] = [n_deltas + 1, drows + delta_tbl.num_rows]
                else:
                    self.delta_info[(table, pid)] = [0, 0]

            epoch_dir = (
                self.lake_root / "epochs" / f"epoch-{epoch:08d}" / safe_table_dir(table)
            )
            epoch_dir.mkdir(parents=True, exist_ok=True)
            name = f"part-{pid:04d}.delta.parquet" if kind == "delta" else f"part-{pid:04d}.parquet"
            path = epoch_dir / name
            tmp = path.with_suffix(f".tmp-{os.getpid()}")
            pq.write_table(write_tbl, tmp)
            os.replace(tmp, path)
            # record the files that reconstruct this partition's state so
            # the LRU can evict it and reload on next touch
            rel = str(path.relative_to(self.lake_root))
            if kind == "delta":
                base_rel, delta_rels = self.state_files.get((table, pid), (None, []))
                self.state_files[(table, pid)] = (base_rel, [*delta_rels, rel])
            else:
                self.state_files[(table, pid)] = (rel, [])
                self.base_rows[(table, pid)] = write_tbl.num_rows
            self._put_state((table, pid), out)
            lineage.append(
                {
                    "table": table,
                    "partition_id": pid,
                    "path": str(path.relative_to(self.lake_root)),
                    "rows": write_tbl.num_rows,
                    "max_lsn": int(pc.max(group["lsn"]).as_py()),
                    "ops_applied": group.num_rows,
                    "n_dead": 0,
                    "kind": kind,
                    "max_event_ts_us": wm_max,
                    "late_events": wm_late,
                    "n_changes": n_changes,
                }
            )
        return lineage

    def state_stats(self) -> dict[str, int]:
        """Observability for the LRU: resident partitions/bytes vs known."""
        return {
            "resident_partitions": len(self.state),
            "resident_bytes": self.state_bytes,
            "known_partitions": len(self.state_files),
        }

    def ping(self) -> int:
        return self.actor_id


def _type_from_str(s: str) -> pa.DataType:
    from commons_codec_ray.config import resolve_logical_type

    return resolve_logical_type(s)


def _row_group_stats(path: str, meta_cache: dict | None) -> list[tuple[int | None, int | None, int]]:
    """[(min_offset, max_offset, rows)] per row group, footer read once
    per file when a cache is supplied (envelope logs are append-only:
    existing files never mutate, so cached footers stay valid)."""
    if meta_cache is not None and path in meta_cache:
        return meta_cache[path]
    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["source_offset"]
    out = []
    for rg in range(md.num_row_groups):
        stats = md.row_group(rg).column(idx).statistics
        if stats is None or not stats.has_min_max:
            out.append((None, None, md.row_group(rg).num_rows))
        else:
            out.append((stats.min, stats.max, md.row_group(rg).num_rows))
    if meta_cache is not None:
        meta_cache[path] = out
    return out


def plan_file_slices(
    envelope_files: list[str], lo: int, hi: int, num_tasks: int,
    meta_cache: dict | None = None,
) -> list[list[tuple[str, list[int]]]]:
    """Assign row groups overlapping [lo, hi) to ``num_tasks`` slices,
    using Parquet row-group statistics (no data read on the driver; with
    ``meta_cache`` the footer metadata is read once per file across the
    whole epoch/poll sequence instead of once per epoch)."""
    units: list[tuple[str, int, int]] = []  # (path, row_group, rows)
    for p in envelope_files:
        for rg, (mn, mx, rows) in enumerate(_row_group_stats(p, meta_cache)):
            if mn is None or (mx >= lo and mn < hi):
                units.append((p, rg, rows))
    if not units:
        return []
    num_tasks = min(num_tasks, len(units))
    total_rows = sum(u[2] for u in units)
    per_task = max(1, total_rows // num_tasks)
    slices: list[list[tuple[str, list[int]]]] = []
    cur: dict[str, list[int]] = {}
    cur_rows = 0
    for path, rg, rows in units:
        cur.setdefault(path, []).append(rg)
        cur_rows += rows
        if cur_rows >= per_task and len(slices) < num_tasks - 1:
            slices.append(list(cur.items()))
            cur, cur_rows = {}, 0
    if cur:
        slices.append(list(cur.items()))
    return slices


def _extra_columns_json(config: PipelineConfig) -> str:
    """Evolved (non-static) columns of the configured table as JSON for
    actor construction — single definition of the static-column exclusion
    (shared with pipelines.cdc._extra_columns via _STATIC_COLUMNS)."""
    from commons_codec_ray.pipelines.cdc import _STATIC_COLUMNS

    return json.dumps(
        [
            (n, t)
            for n, t in config.registry.column_types.get(config.table, {}).items()
            if n not in _STATIC_COLUMNS
        ]
    )


class ActorPoolApplyRunner:
    """Drives decode tasks + the applier pool for a sequence of epochs."""

    def __init__(
        self,
        lake_root: str,
        config: PipelineConfig,
        base_partitions: dict[str, Any],
        num_actors: int | None = None,
        num_decode_tasks: int | None = None,
    ):
        cpus = int(ray.cluster_resources().get("CPU", 8))
        # appliers get ~1/3 of cores, decoders the rest; both bounded by P
        self.num_actors = num_actors or max(2, min(config.num_partitions, cpus // 3))
        self.num_decode_tasks = num_decode_tasks or max(4, cpus)
        self.config = config
        self.lake_root = lake_root
        self._meta_cache: dict = {}  # parquet footer stats, per file
        extra = _extra_columns_json(config)
        # fractional CPU: appliers are burst-shaped (idle while decode
        # streams, busy on ingest/flush) — a full slot each would starve
        # the decode tasks at low cluster sizes
        self.actors = [
            PartitionApplier.options(num_cpus=0.5).remote(
                a,
                self.num_actors,
                lake_root,
                base_partitions,
                extra,
                config.sink_mode,
                config.compact_ratio,
                config.compact_max_deltas,
                config.applier_state_budget_bytes,
                config.emit_changes,
            )
            for a in range(self.num_actors)
        ]
        # actor spawn is ~1 s of fresh-process imports — don't block here;
        # the caller overlaps it with the control-event prescan and the
        # first run_epoch waits on readiness
        self._ping_refs = [a.ping.remote() for a in self.actors]

    def wait_ready(self) -> None:
        if self._ping_refs is not None:
            ray.get(self._ping_refs)
            self._ping_refs = None

    def refresh_extra_columns(self) -> None:
        extra = _extra_columns_json(self.config)
        ray.get([a.set_extra_columns.remote(extra) for a in self.actors])

    def run_epoch(
        self,
        envelope_files: list[str],
        epoch: int,
        lo: int,
        hi: int,
        watermark_us: int | None = None,
    ) -> tuple[list[dict[str, Any]], pa.Table | None]:
        """Returns (lineage rows, dead-letter table or None)."""
        self.wait_ready()
        slices = plan_file_slices(
            envelope_files, lo, hi, self.num_decode_tasks, self._meta_cache
        )
        if not slices:
            return [], None
        A = self.num_actors
        refs_matrix = [
            decode_split_task.options(num_returns=A + 1).remote(
                sl, lo, hi, self.config, A
            )
            for sl in slices
        ]
        # incremental push: each actor ingests one decode task's slice as
        # soon as that task finishes (per-actor ordered queue) — the merge
        # overlaps the decode stage; flush_epoch is the only barrier.
        ingest_refs = [
            self.actors[a].ingest.remote(refs[a])
            for refs in refs_matrix
            for a in range(A)
        ]
        flush_futures = [a.flush_epoch.remote(epoch, watermark_us) for a in self.actors]
        dead_tables = [t for t in ray.get([refs[A] for refs in refs_matrix]) if t.num_rows]
        lineage = [row for rows in ray.get(flush_futures) for row in rows]
        ray.get(ingest_refs)  # surface any ingest errors
        dead = pa.concat_tables(dead_tables) if dead_tables else None
        return lineage, dead

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
