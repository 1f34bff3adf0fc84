"""Distributed k-means (full Lloyd iterations) over an embedding column.

Fixed-point integer arithmetic end-to-end (engine-added; the IVF
quantizer in stages/similarity.py embeds a float variant of one Lloyd
pass — this is the first-class exact-replayable operator):

- Each float32 coordinate v is quantized once to
  ``floor((v + OFFSET) · SCALE)`` in int64.  The translation by OFFSET
  keeps every quantity non-negative, so integer division is
  simultaneously floor and truncation — numpy's ``//`` and DuckDB's
  ``//`` (which truncates toward zero) agree, and squared distances are
  translation-invariant so assignments are unaffected.
- Assignments use exact int64 squared distances via the expansion
  |x|² − 2·x·c + |c|² (all-integer matmul, no float in the loop);
  ties break to the smallest centroid id.
- The update is ``centroid[d] = Σ qv[d] // count`` (integer floor).
  Empty clusters keep their previous centroid.

Every step is deterministic integer arithmetic, so a SQL oracle
replaying the same iterations with unrolled CTEs matches bit-exactly
regardless of summation order, block layout or cluster size (the same
trick as stages/graph.py PageRank).

Scale shape: the quantized point matrix is materialized once (int64,
columnar); each Lloyd iteration is ONE ``map_batches`` pass emitting a
k×(dims+1) int64 partial (sums + counts) per batch — kilobytes — which
the driver reduces and re-broadcasts.  No shuffle at any point; cost is
iterations × one linear scan, the canonical distributed-k-means shape.
Initialization is the k lowest-id vectors (deterministic and
oracle-replayable; at real scale swap in k-means‖ sampling behind the
same iterate loop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE = 1_000_000
OFFSET = 2.0


def _quantize(m: np.ndarray) -> np.ndarray:
    """float32/64 (n×d) → int64 fixed-point, matching the SQL expression
    ``CAST(floor((CAST(v AS DOUBLE) + 2.0) * 1000000.0) AS BIGINT)``."""
    return np.floor((m.astype(np.float64) + OFFSET) * float(SCALE)).astype(np.int64)


def kmeans_lloyd(
    ds,
    k: int = 4,
    iterations: int = 3,
    id_column: str = "vec_id",
    column: str = "embedding",
):
    """Run ``iterations`` full Lloyd rounds; returns a pyarrow Table
    ``(cid, dim, cval, size)`` — the final integer centroids (k·dims
    rows) with each cluster's final assignment count."""
    import ray

    def to_int_points(t: pa.Table) -> pa.Table:
        emb = t[column]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m = np.stack(emb.to_numpy(zero_copy_only=False))
        q = _quantize(m)
        return pa.table(
            {
                id_column: t[id_column].cast(pa.int64()),
                "qv": pa.array([r.tobytes() for r in q], pa.binary()),
            }
        )

    pts = ds.map_batches(to_int_points, batch_format="pyarrow").materialize()

    # deterministic init: the k lowest-id vectors (local k-smallest per
    # batch, reduced driver-side — no sort shuffle)
    def low_ids(t: pa.Table) -> pa.Table:
        ids = t[id_column].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")[:k]
        return t.take(order)

    seed = pts.map_batches(low_ids, batch_format="pyarrow").to_pandas()
    seed = seed.sort_values(id_column, kind="mergesort").head(k)
    cents = np.stack(
        [np.frombuffer(b, dtype=np.int64) for b in seed["qv"]]
    )  # k × d int64
    dims = cents.shape[1]

    sizes = np.zeros(k, np.int64)
    for _ in range(iterations):
        cref = ray.put(cents)

        def partial(t: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            x = np.frombuffer(
                b"".join(t["qv"].to_pylist()), dtype=np.int64
            ).reshape(-1, dims)
            # exact int64 squared distances: |x|² − 2·x·cᵀ + |c|²
            d2 = (
                (x * x).sum(axis=1, keepdims=True)
                - 2 * (x @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            assign = d2.argmin(axis=1)  # first min → lowest cid on ties
            sums = np.zeros((k, dims), np.int64)
            np.add.at(sums, assign, x)
            cnt = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "sums": pa.array([sums.tobytes()], pa.binary()),
                    "cnt": pa.array([cnt.tobytes()], pa.binary()),
                }
            )

        parts = pts.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros((k, dims), np.int64)
        cnt = np.zeros(k, np.int64)
        for row in parts:
            sums += np.frombuffer(row["sums"], dtype=np.int64).reshape(k, dims)
            cnt += np.frombuffer(row["cnt"], dtype=np.int64)
        nonempty = cnt > 0
        new = cents.copy()
        new[nonempty] = sums[nonempty] // cnt[nonempty, None]
        cents, sizes = new, cnt

    cid = np.repeat(np.arange(k, dtype=np.int64), dims)
    return pa.table(
        {
            "cid": pa.array(cid, pa.int64()),
            "dim": pa.array(np.tile(np.arange(dims, dtype=np.int64), k), pa.int64()),
            "cval": pa.array(cents.reshape(-1), pa.int64()),
            "size": pa.array(np.repeat(sizes, dims), pa.int64()),
        }
    )
