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


_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def adaptive_buckets(
    n_rows: int | None = None,
    *,
    rows_per_bucket: int = 100_000,
    min_buckets: int = 256,
    max_buckets: int = 1 << 20,
) -> int:
    """Power-of-two coarse-bucket count for bucketed groupby operators
    (windows, joins, dedup, anti-join).

    Buckets bound both parallelism (num_buckets groups run at once) and
    per-group memory (≈ input / num_buckets lands in one pandas group),
    so a fixed constant is wrong at 1000× the data. Two inputs drive it:

    - ``n_rows`` (pass it when a metadata-cheap ``ds.count()`` exists,
      e.g. straight off ``read_parquet``): one bucket per
      ``rows_per_bucket`` rows keeps per-group frames flat as data grows.
    - the cluster's CPU count (always applied as a floor of 8× CPUs): on
      a 256-node cluster the floor alone lifts bucket counts into the
      tens of thousands, so no stage is capped below the core count.

    Deterministic given (n_rows, cluster size); the RESULT of a bucketed
    operator never depends on the bucket count — only its parallelism and
    peak memory do (tested: 4096-bucket runs are byte-identical).
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:  # noqa: BLE001
        cpus = 8
    target = max(min_buckets, 8 * cpus)
    if n_rows and n_rows > 0:
        target = max(target, n_rows // rows_per_bucket + 1)
    target = min(max_buckets, target)
    return 1 << int(target - 1).bit_length()


def hash_bucket(keys, num_buckets: int) -> pa.Array:
    """Bucket an int64 key array as ``splitmix(key) & (num_buckets-1)``
    (``num_buckets`` must be a power of two; use
    :func:`adaptive_buckets`).

    Mixing first makes the bucket distribution independent of the key
    distribution — raw low bits (``user_id & 255``) skew catastrophically
    for real-world allocators (all-even ids, shard-strided ids), mixed
    bits do not. Returns a pyarrow int64 array.
    """
    k = np.asarray(keys)
    if k.dtype.kind not in "iu":
        raise TypeError(f"hash_bucket requires an integer key array (got {k.dtype})")
    k = k.astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (k + _GAMMA) * _GAMMA
        h ^= h >> np.uint64(31)
        h = h * np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(29)
    return pa.array((h & np.uint64(num_buckets - 1)).astype(np.int64))


def duck_rint(values):
    """``np.rint`` drop-in that rounds half AWAY from zero.

    Matches DuckDB ``round(DOUBLE)`` exactly: ``np.rint`` is
    round-half-to-even (banker's), so the two diverge whenever the
    value lands exactly on .5 in IEEE double (e.g. ``1.125 * 100 ==
    112.5`` exactly: rint → 112, DuckDB round → 113). Every
    integer-cents lane (``round(value * 100)`` oracles) must use this
    instead of ``np.rint`` or the oracle hash compare breaks on
    boundary inputs. Returns float64, same contract as ``np.rint``.
    """
    arr = np.asarray(values, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.copysign(np.floor(np.abs(arr) + 0.5), arr)


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
