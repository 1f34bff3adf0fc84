"""Small shared utilities."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pool_size(requested: int) -> int:
    """Clamp an actor-pool size to the cluster: a pool that reserves
    every CPU slot starves the upstream read/map tasks and the pipeline
    DEADLOCKS (observed at num_cpus=4 with concurrency=4). Always leave
    at least one slot free."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:  # noqa: BLE001
        cpus = 8
    return max(1, min(requested, cpus - 1))


def duckdb_round(values, ndigits: int):
    """Round like DuckDB's ``round(x, n)`` for DOUBLE, bit-exactly.

    DuckDB computes ``std::round(x * 10^n) / 10^n`` (half away from
    zero). Reproducing the same multiply→round→divide sequence yields
    the identical IEEE double, so oracle comparisons that hash raw float
    bytes match. (pyarrow's ``pc.round`` uses a different algorithm and
    can differ by one ulp — enough to fail a byte-level compare.)
    """
    arr = values
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = arr.to_numpy(zero_copy_only=False)
    arr = np.asarray(arr, dtype=np.float64)
    p = float(10**ndigits)
    with np.errstate(invalid="ignore"):
        out = np.copysign(np.floor(np.abs(arr * p) + 0.5), arr) / p
    out = np.where(np.isnan(arr), np.nan, out)
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        return pa.array(out, type=pa.float64())
    return out
