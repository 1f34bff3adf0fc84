"""Z-order (Morton) data layout for multi-column file pruning.

Engine-added lake-layout operator: hash partitioning co-locates a KEY
but scatters every other column, so min/max file stats prune nothing on
a second dimension.  Interleaving the bits of two sort columns into one
Morton code and range-partitioning by its PREFIX gives every output
partition a tight bounding rectangle in BOTH dimensions — the standard
Delta/Iceberg ``OPTIMIZE ZORDER BY`` trick, here as a first-class
operator whose arithmetic is pure integer bit manipulation, so a SQL
oracle summing explicit bit extractions reproduces codes, bucket ids
and per-bucket stats exactly.

Scale shape: the code + bucket assignment is one vectorized linear
pass (magic-number bit spreading, no Python loop); per-bucket stats
reduce from kilobyte per-batch partials.  Writing the actual files is
``write_parquet(partition_cols=["zbucket"])`` on the tagged Dataset —
the stats table THIS module returns is the pruning evidence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _spread16(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 16 bits: b15..b0 → b15 0 b14 0 …"""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """32-bit Morton code of two 16-bit non-negative ints (x even bits,
    y odd bits)."""
    assert len(x) == 0 or (
        x.min() >= 0 and x.max() < (1 << 16) and y.min() >= 0 and y.max() < (1 << 16)
    ), "morton2: inputs must fit 16 bits"
    return (_spread16(x) | (_spread16(y) << np.uint64(1))).astype(np.int64)


def zorder_stats(ds, x: str, y: str, prefix_bits: int = 6):
    """Tag every row with its Morton-prefix bucket and return the
    per-bucket layout-quality table ``(zbucket, n, min_x, max_x, min_y,
    max_y)`` — each of the ``2^prefix_bits`` buckets covers one cell of
    the Z-curve's recursive quadrant grid, so both column ranges stay
    tight (the property file-skipping needs).

    Raw values rarely reach the HIGH Morton bits (ids and epoch days sit
    in a narrow band, collapsing every row into one prefix cell), so
    both dimensions are first min-max normalized to the full 16-bit
    range with pure integer arithmetic — ``((v − min) · 65536) // (max −
    min + 1)`` — from one combined aggregate pass; the oracle computes
    the identical expression."""
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(x), Max(x), Min(y), Max(y))
    x0, x1 = int(mm[f"min({x})"]), int(mm[f"max({x})"])
    y0, y1 = int(mm[f"min({y})"]), int(mm[f"max({y})"])
    xr = x1 - x0 + 1
    yr = y1 - y0 + 1
    shift = np.uint64(32 - prefix_bits)

    def partial(t: pa.Table) -> pa.Table:
        xv = t[x].to_numpy(zero_copy_only=False).astype(np.int64)
        yv = t[y].to_numpy(zero_copy_only=False).astype(np.int64)
        xs = ((xv - x0) * 65536) // xr
        ys = ((yv - y0) * 65536) // yr
        zb = (morton2(xs, ys).astype(np.uint64) >> shift).astype(np.int64)
        df = pd.DataFrame({"zbucket": zb, "x": xv, "y": yv})
        g = df.groupby("zbucket").agg(
            n=("x", "size"),
            min_x=("x", "min"),
            max_x=("x", "max"),
            min_y=("y", "min"),
            max_y=("y", "max"),
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("zbucket").agg(
        n=("n", "sum"),
        min_x=("min_x", "min"),
        max_x=("max_x", "max"),
        min_y=("min_y", "min"),
        max_y=("max_y", "max"),
    ).reset_index()
    return pa.table(
        {
            "zbucket": pa.array(out["zbucket"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
            "min_x": pa.array(out["min_x"].to_numpy(np.int64), pa.int64()),
            "max_x": pa.array(out["max_x"].to_numpy(np.int64), pa.int64()),
            "min_y": pa.array(out["min_y"].to_numpy(np.int64), pa.int64()),
            "max_y": pa.array(out["max_y"].to_numpy(np.int64), pa.int64()),
        }
    )
