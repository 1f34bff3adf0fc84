"""Grouped second-moment statistics (corr / covariance / stddev) as
mergeable partial sketches.

Engine-added analytics operator (no reference counterpart — the
reference stops at record translation; reference repo has no
statistical aggregates): per-group bivariate moments computed the way a
distributed engine must — each batch reduces to one tiny
(n, mean_x, mean_y, M2x, M2y, Cxy) row per group, and partials merge
with Chan et al.'s parallel-variance update, which is numerically
stable (no ``n*sxx - sx**2`` catastrophic cancellation) and
order-insensitive to ~1e-13 relative.

Scale shape: the shuffle moves ``groups x 7 floats`` per input block —
kilobytes — never the raw rows. Identical to the KMV / Misra-Gries
sketch contract in :mod:`commons_codec_ray.stages.sketches`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


PARTIAL_COLS = ["n", "mx", "my", "m2x", "m2y", "cxy"]


def moments_partial(df: pd.DataFrame, key: str, x: str, y: str) -> pd.DataFrame:
    """One (n, mean, mean, M2x, M2y, Cxy) row per group present in the
    batch — fully vectorized (transform-mean + centered products)."""
    g = df.groupby(key, sort=False)
    mx = g[x].transform("mean")
    my = g[y].transform("mean")
    dx = df[x].to_numpy(dtype="float64") - mx.to_numpy(dtype="float64")
    dy = df[y].to_numpy(dtype="float64") - my.to_numpy(dtype="float64")
    prod = pd.DataFrame(
        {key: df[key], "m2x": dx * dx, "m2y": dy * dy, "cxy": dx * dy}
    ).groupby(key, sort=False).sum()
    out = pd.DataFrame(
        {
            "n": g[x].size().astype("float64"),
            "mx": g[x].mean(),
            "my": g[y].mean(),
        }
    ).join(prod)
    return out.reset_index()


def merge_moments(df: pd.DataFrame, key: str) -> pd.DataFrame:
    """Fold a group's partial rows with Chan's parallel update.

    Rows are sorted by (n, mx, m2x) first so the fold order — and hence
    the last-ulp float result — is deterministic across runs regardless
    of block arrival order.
    """
    df = df.sort_values(["n", "mx", "m2x"], kind="mergesort")
    out_rows = []
    for k, grp in df.groupby(key, sort=False):
        a = grp[PARTIAL_COLS].to_numpy(dtype="float64")
        n1, mx1, my1, m2x1, m2y1, cxy1 = a[0]
        for n2, mx2, my2, m2x2, m2y2, cxy2 in a[1:]:
            n = n1 + n2
            dx = mx2 - mx1
            dy = my2 - my1
            w = n1 * n2 / n
            m2x1 = m2x1 + m2x2 + dx * dx * w
            m2y1 = m2y1 + m2y2 + dy * dy * w
            cxy1 = cxy1 + cxy2 + dx * dy * w
            mx1 = mx1 + dx * n2 / n
            my1 = my1 + dy * n2 / n
            n1 = n
        out_rows.append((k, n1, mx1, my1, m2x1, m2y1, cxy1))
    return pd.DataFrame(out_rows, columns=[key, *PARTIAL_COLS])


def grouped_moments(ds, key: str, x: str, y: str):
    """Dataset of merged per-group moment rows: one row per distinct
    ``key`` with columns ``n mx my m2x m2y cxy``.

    Two stages: map_batches partial (rows -> groups x 7 floats), then a
    small groupby over sketch rows only.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return moments_partial(df, key, x, y)

    def merge(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            merge_moments(df, key), preserve_index=False
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(key)
        .map_groups(merge, batch_format="pandas")
    )


def finalize_stats(t: pa.Table, key: str) -> dict[str, np.ndarray]:
    """Derive corr / sample covariance / sample stddevs from merged
    moment rows (numpy arrays, caller rounds & names columns)."""
    n = np.asarray(t["n"].to_numpy(zero_copy_only=False), dtype="float64")
    m2x = np.asarray(t["m2x"].to_numpy(zero_copy_only=False), dtype="float64")
    m2y = np.asarray(t["m2y"].to_numpy(zero_copy_only=False), dtype="float64")
    cxy = np.asarray(t["cxy"].to_numpy(zero_copy_only=False), dtype="float64")
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = cxy / np.sqrt(m2x * m2y)
        covar = cxy / (n - 1.0)
        sdx = np.sqrt(m2x / (n - 1.0))
        sdy = np.sqrt(m2y / (n - 1.0))
    return {"n": n, "corr": corr, "covar": covar, "sdx": sdx, "sdy": sdy}


DAY_US = 86_400_000_000


def retention_cohorts(ds, user: str = "user_id", ts: str = "ts"):
    """Cohort retention matrix (engine-added): users are cohorted by
    their first active day; the cell (cohort_day, day_offset) counts the
    DISTINCT users of that cohort active day_offset days later.

    Scale shape: ONE hash-bucketed exchange on the user key. Inside each
    batch, (user, day) pairs dedupe first (combiner). Inside each user
    bucket, a single vectorized pass finds every user's min day and
    emits per-(cohort, offset) partial COUNTS — the exchange after that
    moves only kilobyte count partials into the final small sum.
    Day numbers are integer epoch days throughout (no date types to
    drift between engines).
    """
    import pyarrow.compute as pc

    from commons_codec_ray.util import adaptive_buckets, hash_bucket

    nb = adaptive_buckets()

    def pairs(t: pa.Table) -> pa.Table:
        u = t[user].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (
            t[ts].cast(pa.int64()).to_numpy(zero_copy_only=False) // DAY_US
        ).astype(np.int64)
        ud = np.unique(np.stack([u, d], axis=1), axis=0)
        return pa.table(
            {
                "_ub": hash_bucket(ud[:, 0], nb),
                "u": pa.array(ud[:, 0], pa.int64()),
                "d": pa.array(ud[:, 1], pa.int64()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["u", "d"]).sort_values(["u", "d"], kind="mergesort")
        u = g["u"].to_numpy()
        d = g["d"].to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = u[1:] != u[:-1]
        cohort = d[np.maximum.accumulate(np.where(new, np.arange(len(g)), 0))]
        cell = pd.DataFrame({"cohort_day": cohort, "day_offset": d - cohort})
        out = cell.groupby(["cohort_day", "day_offset"], as_index=False).size()
        return out.rename(columns={"size": "n_users"})

    parts = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("_ub")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    # bucket partials are disjoint in users but overlap in cells: tiny sum
    final = parts.groupby(["cohort_day", "day_offset"], as_index=False)["n_users"].sum()
    return pa.table(
        {
            "cohort_day": pa.array(final["cohort_day"].to_numpy(np.int64), pa.int64()),
            "day_offset": pa.array(final["day_offset"].to_numpy(np.int64), pa.int64()),
            "n_users": pa.array(final["n_users"].to_numpy(np.int64), pa.int64()),
        }
    )


def embedding_second_moments(ds, id_column: str = "vec_id", column: str = "embedding"):
    """Exact distributed second moments of the quantized embedding
    matrix — the distributed half of PCA / whitening / covariance
    estimation. ONE linear ``map_batches`` pass; each batch emits a
    (d×d XᵀX int64 matrix + per-dim sums + count) partial as bytes —
    kilobytes for d=64 — reduced on the driver. No shuffle, the same
    partial-reduction shape as :func:`~...kmeans.kmeans_lloyd`.

    Quantization is the shared fixed-point scheme
    (``kmeans._quantize``: ``floor((v+2)·10⁶)``), so every partial is
    integer-exact and the reduction is order-invariant — a SQL oracle
    summing ``qv_i·qv_j`` per dim pair matches bit-for-bit.

    Overflow bound: |q| ≤ 4·10⁶ ⇒ |q_i·q_j| ≤ 1.6·10¹³, so int64 holds
    exact sums up to ~5.7·10⁵ rows per *total* reduction per cell pair.
    At larger corpora shift the quantization offset to center the data
    (cross-moments shrink by ~the mean²) or reduce partials
    hierarchically into int128 via paired int64 limbs — the pass
    structure is unchanged.

    Returns ``(S, sums, n)``: S the d×d int64 Σ qᵢqⱼ matrix, sums the
    per-dim Σ q vector, n the row count.
    """
    from commons_codec_ray.stages.kmeans import _quantize

    def partial(t: pa.Table) -> pa.Table:
        emb = t[column]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        q = _quantize(np.stack(emb.to_numpy(zero_copy_only=False)))
        s = q.T @ q
        return pa.table(
            {
                "xtx": pa.array([s.tobytes()], pa.binary()),
                "sums": pa.array([q.sum(axis=0).tobytes()], pa.binary()),
                "n": pa.array([q.shape[0]], pa.int64()),
                "maxq": pa.array([int(np.abs(q).max()) if q.size else 0], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    d = int(np.sqrt(len(np.frombuffer(parts[0]["xtx"], dtype=np.int64))))
    S = np.zeros((d, d), np.int64)
    sums = np.zeros(d, np.int64)
    n = 0
    maxq = 0
    for row in parts:
        S += np.frombuffer(row["xtx"], dtype=np.int64).reshape(d, d)
        sums += np.frombuffer(row["sums"], dtype=np.int64)
        n += int(row["n"])
        maxq = max(maxq, int(row["maxq"]))
    # conservative wrap guard (exact Python ints): n rows of worst-case
    # |q_i·q_j| = maxq² must fit int64, else the += above may have
    # wrapped silently — the docstring's ~5.7e5-row bound, enforced
    if n * maxq * maxq >= 1 << 63:
        raise OverflowError(
            f"embedding_second_moments: n={n} rows with max|q|={maxq} may "
            "overflow int64 accumulation; center the data (shift the "
            "quantization offset) or reduce hierarchically in wider limbs"
        )
    return S, sums, n


def pca_components(ds, n_components: int = 4, id_column: str = "vec_id", column: str = "embedding"):
    """Principal components from the exact distributed second moments:
    the d×d covariance is assembled driver-side from
    :func:`embedding_second_moments` (cov = (S − s·sᵀ/n)/n in float64 —
    the ONLY float step, on a d×d matrix in one process, hence
    deterministic) and eigendecomposed with ``np.linalg.eigh``.
    Returns ``(components, eigenvalues)``: components is
    (n_components × d) rows sorted by descending eigenvalue, each with
    a deterministic sign convention (largest-|coefficient| entry made
    positive; ties → lowest dim index).

    The distributed work is one linear pass; the eigensolve is O(d³)
    on the driver — the textbook scale shape for tall-skinny PCA
    (d ≤ a few thousand, rows unbounded).
    """
    S, sums, n = embedding_second_moments(ds, id_column=id_column, column=column)
    cov = (S.astype(np.float64) - np.outer(sums, sums) / n) / n
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order].T.copy()
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return comps, w[order]
