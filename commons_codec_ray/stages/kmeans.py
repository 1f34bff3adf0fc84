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


def _to_points(ds, id_column: str, column: str):
    """Quantize the embedding column once into a materialized
    ``(id, qv:binary)`` dataset of int64 fixed-point rows."""

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

    return ds.map_batches(to_int_points, batch_format="pyarrow").materialize()


def _seed_low_ids(pts, k: int, id_column: str) -> np.ndarray:
    """Deterministic init: the k lowest-id vectors (local k-smallest per
    batch, reduced driver-side — no sort shuffle)."""

    def low_ids(t: pa.Table) -> pa.Table:
        ids = t[id_column].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")[:k]
        return t.take(order)

    seed = pts.map_batches(low_ids, batch_format="pyarrow").to_pandas()
    seed = seed.sort_values(id_column, kind="mergesort").head(k)
    return np.stack([np.frombuffer(b, dtype=np.int64) for b in seed["qv"]])


def _min_d2(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Exact int64 min squared distance of each row of x to any row of c."""
    d2 = (
        (x * x).sum(axis=1, keepdims=True)
        - 2 * (x @ c.T)
        + (c * c).sum(axis=1)[None, :]
    )
    return d2.min(axis=1)


def _splitmix(v: np.ndarray) -> np.ndarray:
    h = v.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def seed_kmeans_parallel(
    pts,
    k: int,
    id_column: str = "vec_id",
    rounds: int = 3,
    oversample: int | None = None,
    seed: int = 7,
) -> np.ndarray:
    """k-means|| (Bahmani et al., VLDB'12) seeding, made deterministic:
    the coin flip for point i in round r is ``splitmix64(id ^ mix(seed,
    r)) / 2^64 < ℓ·d²(i)/ψ`` — a pure function of the row, so the
    sampled candidate set is identical across runs, block layouts and
    cluster sizes.  Each round is two linear passes (cost ψ, then
    sample); candidates (≈ ℓ·rounds rows) are weighted by one
    assignment pass and reduced to k centers driver-side with a
    deterministic weighted farthest-first sweep (ties → lowest id).
    Nothing corpus-sized ever reaches the driver."""
    import ray

    ell = oversample if oversample is not None else 2 * k

    # first center: the vector with the smallest (splitmix(id), id) —
    # one linear pass, per-batch argmin
    def first(t: pa.Table) -> pa.Table:
        ids = t[id_column].to_numpy(zero_copy_only=False)
        h = _splitmix(ids.astype(np.int64) ^ np.int64(seed))
        j = int(np.lexsort((ids, h))[0])
        return t.take([j])

    cand = pts.map_batches(first, batch_format="pyarrow").to_pandas()
    cand["h"] = _splitmix(cand[id_column].to_numpy(np.int64) ^ np.int64(seed))
    cand = cand.sort_values(["h", id_column]).head(1)
    cents = np.stack([np.frombuffer(b, dtype=np.int64) for b in cand["qv"]])
    dims = cents.shape[1]

    for r in range(rounds):
        cref = ray.put(cents)

        def cost(t: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            x = np.frombuffer(b"".join(t["qv"].to_pylist()), np.int64).reshape(-1, dims)
            # exact integer partial (str transport dodges int64 overflow):
            # psi must be a pure function of the ROWS, not the block
            # layout, or a marginal coin flip could differ across runs
            s = int(_min_d2(x, c).astype(object).sum())
            return pa.table({"psi": pa.array([str(s)], pa.string())})

        psi = float(
            sum(
                int(row["psi"])
                for row in pts.map_batches(cost, batch_format="pyarrow").take_all()
            )
        )
        if psi <= 0:
            break

        rmix = np.int64(seed * 1_000_003 + 7919 * (r + 1))

        def sample(t: pa.Table, _cref=cref, _psi=psi, _rmix=rmix) -> pa.Table:
            c = ray.get(_cref)
            ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
            x = np.frombuffer(b"".join(t["qv"].to_pylist()), np.int64).reshape(-1, dims)
            d2 = _min_d2(x, c).astype(np.float64)
            u = _splitmix(ids ^ _rmix).astype(np.float64) / float(2**64)
            keep = u < (ell * d2 / _psi)
            return t.filter(pa.array(keep))

        new = pts.map_batches(sample, batch_format="pyarrow").to_pandas()
        if len(new):
            fresh = np.stack([np.frombuffer(b, dtype=np.int64) for b in new["qv"]])
            cents = np.unique(np.vstack([cents, fresh]), axis=0)

    # weight candidates: one assignment pass (points → nearest candidate)
    cref = ray.put(cents)
    n_cand = len(cents)

    def wpartial(t: pa.Table, _cref=cref) -> pa.Table:
        c = ray.get(_cref)
        x = np.frombuffer(b"".join(t["qv"].to_pylist()), np.int64).reshape(-1, dims)
        d2 = (
            (x * x).sum(axis=1, keepdims=True)
            - 2 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        w = np.bincount(d2.argmin(axis=1), minlength=n_cand).astype(np.int64)
        return pa.table({"w": pa.array([w.tobytes()], pa.binary())})

    w = np.zeros(n_cand, np.int64)
    for row in pts.map_batches(wpartial, batch_format="pyarrow").take_all():
        w += np.frombuffer(row["w"], dtype=np.int64)

    if n_cand <= k:
        return cents

    # deterministic weighted farthest-first: start from the heaviest
    # candidate (ties → first in the unique-sorted order), then greedily
    # add the candidate maximizing w·d² to the chosen set
    chosen = [int(np.argmax(w))]
    d2 = _min_d2(cents, cents[chosen])
    while len(chosen) < k:
        # float64 product (w·d² overflows int64 at scale); elementwise
        # IEEE ops are deterministic, and this only steers seed QUALITY
        score = w.astype(np.float64) * d2.astype(np.float64)
        score[chosen] = -1.0
        nxt = int(np.argmax(score))
        chosen.append(nxt)
        d2 = np.minimum(d2, _min_d2(cents, cents[[nxt]]))
    return cents[sorted(chosen)]


def inertia(pts, cents: np.ndarray) -> int:
    """Exact integer k-means cost Σ min-d² — one linear pass of
    kilobyte partials (Python-int reduce, no overflow at any scale)."""
    import ray

    dims = cents.shape[1]
    cref = ray.put(cents)

    def part(t: pa.Table, _cref=cref) -> pa.Table:
        c = ray.get(_cref)
        x = np.frombuffer(b"".join(t["qv"].to_pylist()), np.int64).reshape(-1, dims)
        # chunk the per-point min-d² sum through Python ints via str to
        # dodge int64 overflow on huge blocks
        s = int(_min_d2(x, c).astype(object).sum())
        return pa.table({"s": pa.array([str(s)], pa.string())})

    return sum(
        int(row["s"]) for row in pts.map_batches(part, batch_format="pyarrow").take_all()
    )


def kmeans_compare_inits(
    ds,
    k: int = 4,
    iterations: int = 3,
    id_column: str = "vec_id",
    column: str = "embedding",
    seed: int = 7,
) -> dict:
    """Run the same Lloyd loop from both seedings and return the exact
    integer inertia of each final centroid set — the quality gate for
    the (non-SQL-replayable) k-means|| path."""
    out = {}
    pts = _to_points(ds, id_column, column)
    for name in ("low_ids", "kmeans_par"):
        t = kmeans_lloyd(
            ds, k=k, iterations=iterations, id_column=id_column,
            column=column, init=name, seed=seed,
        )
        cid = t["cid"].to_numpy()
        dim = t["dim"].to_numpy()
        cval = t["cval"].to_numpy()
        dims = int(dim.max()) + 1
        cents = np.zeros((int(cid.max()) + 1, dims), np.int64)
        cents[cid, dim] = cval
        out[name] = inertia(pts, cents)
    return out


def kmeans_lloyd(
    ds,
    k: int = 4,
    iterations: int = 3,
    id_column: str = "vec_id",
    column: str = "embedding",
    init: str = "low_ids",
    seed: int = 7,
):
    """Run ``iterations`` full Lloyd rounds; returns a pyarrow Table
    ``(cid, dim, cval, size)`` — the final integer centroids (k·dims
    rows) with each cluster's final assignment count.

    ``init="low_ids"`` (default) is the oracle-replayable deterministic
    seeding; ``init="kmeans_par"`` runs the deterministic k-means||
    sweep above (better quality on clustered data; gate its result with
    :func:`inertia` rather than a bit-exact SQL replay)."""
    import ray

    pts = _to_points(ds, id_column, column)
    if init == "kmeans_par":
        cents = seed_kmeans_parallel(pts, k, id_column=id_column, seed=seed)
        if len(cents) < k:  # tiny corpus: top up with distinct low-id vectors
            pad = _seed_low_ids(pts, k, id_column)
            cents = np.unique(np.vstack([cents, pad]), axis=0)[:k]
    else:
        cents = _seed_low_ids(pts, k, id_column)
    k = min(k, len(cents))
    cents = cents[:k]
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
