"""Exact distributed global rank / percent_rank.

Engine-added operator (no reference counterpart): ROW_NUMBER() OVER
(ORDER BY value, tiebreak) over an arbitrarily large Dataset without a
single-node sort. The classic distributed-sort-with-offsets scheme:

1. driver pulls a deterministic hash-sample of the value column and
   derives B-1 range boundaries (kilobytes);
2. ONE shuffle range-partitions rows by ``searchsorted(boundaries, v)``
   — every row in partition p sorts strictly after every row in p-1, so
   ranks decompose into (partition offset) + (local rank);
3. local ranks are a vectorized per-partition sort; partition sizes (a
   B-row table) prefix-sum into offsets on the driver and broadcast
   back for a final map.

The total order is (value, tiebreak), so ranks are deterministic for
any tie pattern. Skew bound: rows sharing one exact value land in one
partition (same contract as any keyed operator — the sample keeps
near-uniform partition sizes otherwise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from commons_codec_ray.util import adaptive_buckets

_SAMPLE_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _splitmix(k: np.ndarray) -> np.ndarray:
    k = k.astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (k + _SAMPLE_GAMMA) * _SAMPLE_GAMMA
        h ^= h >> np.uint64(31)
        h = h * np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(29)
    return h


def global_rank(
    ds,
    value: str,
    tiebreak: str,
    out: str = "global_rank",
    num_partitions: int | None = None,
    sample_mod: int = 16,
):
    """Dataset with an ``out`` column holding the exact 1-based global
    row number under ORDER BY (value, tiebreak ascending).

    ``tiebreak`` must be an integer column unique per row (it seeds the
    deterministic sample and makes the order total). ``sample_mod``:
    every ``sample_mod``-th row by hash feeds the boundary estimate.
    """
    num_partitions = num_partitions or adaptive_buckets()

    sample = ds.map_batches(
        lambda t: t.select([value]).filter(
            pa.array(
                _splitmix(
                    t[tiebreak].to_numpy(zero_copy_only=False).astype(np.int64)
                )
                % np.uint64(sample_mod)
                == 0
            )
        ),
        batch_format="pyarrow",
    ).to_pandas()
    if len(sample) == 0:
        boundaries = np.array([], dtype="float64")
    else:
        qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
        boundaries = np.quantile(sample[value].to_numpy(dtype="float64"), qs)
    boundaries_ref = ray.put(boundaries)

    def assign(t: pa.Table) -> pa.Table:
        b = ray.get(boundaries_ref)
        v = t[value].to_numpy(zero_copy_only=False).astype("float64")
        p = np.searchsorted(b, v, side="right") if len(b) else np.zeros(len(v), np.int64)
        return t.append_column("_rp", pa.array(p.astype(np.int64)))

    def local_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([value, tiebreak], kind="mergesort")
        df["_lr"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    ranked = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("_rp")
        .map_groups(local_rank, batch_format="pandas")
        .materialize()
    )

    sizes = (
        ranked.map_batches(
            lambda t: pa.table(
                {
                    "_rp": t["_rp"],
                }
            )
            .group_by("_rp")
            .aggregate([("_rp", "count")])
            .rename_columns(["_rp", "n"]),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("_rp")["n"]
        .sum()
        .sort_index()
    )
    offsets = np.zeros(int(sizes.index.max()) + 1, dtype=np.int64)
    offsets[sizes.index.to_numpy()] = sizes.to_numpy()
    offsets = np.concatenate([[0], np.cumsum(offsets)[:-1]])
    offsets_ref = ray.put(offsets)

    def add_offset(t: pa.Table) -> pa.Table:
        off = ray.get(offsets_ref)
        p = t["_rp"].to_numpy(zero_copy_only=False).astype(np.int64)
        lr = t["_lr"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.append_column(out, pa.array(off[p] + lr))
        return t.drop_columns(["_rp", "_lr"])

    return ranked.map_batches(add_offset, batch_format="pyarrow")
