"""Distributed EXACT quantiles via iterative histogram refinement.

The 100 TB shape for percentiles: no global sort, no sampling error.
Each round is ONE ``map_batches`` pass that histograms the column into
``bins`` fixed buckets over the current search interval and emits a
kilobyte count vector per batch; the driver merges counts (bytes, not
data), locates the bucket containing each target rank, and either
narrows the interval (rare: only when a bucket still holds more than
``scan_limit`` values) or pulls the (small) bucket's values with one
filtered pass for an exact rank selection. 2–3 passes end-to-end for
double-precision data in practice.

Rank semantics match DuckDB's ``quantile_disc``: the result is the
element of sorted order-statistic rank ``max(1, ceil(q·n))`` (verified
empirically against DuckDB — this is what makes the oracle comparison
bit-exact, no interpolation involved).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _rank_for(q: float, n: int) -> int:
    """DuckDB quantile_disc rank (1-indexed)."""
    return max(1, int(np.ceil(q * n)))


def distributed_quantiles(
    ds,
    column: str,
    qs: list[float],
    bins: int = 4096,
    scan_limit: int = 262_144,
    max_rounds: int = 8,
) -> list[float]:
    """Exact ``quantile_disc`` values of ``column`` for each q in ``qs``.

    NaNs are excluded (DuckDB aggregate semantics ignore NULL; parquet
    NaN/NULL handling is the caller's concern — the test tables carry
    neither).
    """
    n = ds.count()
    if n == 0:
        return [float("nan")] * len(qs)
    ranks = [_rank_for(q, n) for q in qs]
    return distributed_order_stats(ds, column, ranks, bins, scan_limit, max_rounds)


def distributed_quantiles_cont(
    ds,
    column: str,
    qs: list[float],
    bins: int = 4096,
    scan_limit: int = 262_144,
    max_rounds: int = 8,
) -> list[float]:
    """INTERPOLATED quantiles matching DuckDB's ``quantile_cont``: for
    h = q·(n-1) (0-indexed), lerp between order statistics ⌊h⌋ and
    ⌊h⌋+1 as ``lo + (hi - lo)·frac`` — the same double-precision
    expression DuckDB evaluates, so results stay bit-exact. Costs the
    same histogram passes as the discrete path (both bracketing ranks
    are selected in one refinement)."""
    n = ds.count()
    if n == 0:
        return [float("nan")] * len(qs)
    want: list[tuple[int, int, float]] = []  # (rank_lo, rank_hi, frac), 1-indexed
    ranks_needed: set[int] = set()
    for q in qs:
        h = q * (n - 1)
        k = int(np.floor(h))
        frac = h - k
        r_lo = k + 1
        r_hi = min(k + 2, n)
        want.append((r_lo, r_hi, frac))
        ranks_needed.update((r_lo, r_hi))
    uniq = sorted(ranks_needed)
    vals = distributed_order_stats(ds, column, uniq, bins, scan_limit, max_rounds)
    by_rank = dict(zip(uniq, vals))
    out = []
    for r_lo, r_hi, frac in want:
        lo_v, hi_v = by_rank[r_lo], by_rank[r_hi]
        out.append(lo_v if frac == 0.0 else lo_v + (hi_v - lo_v) * frac)
    return out


def approx_quantiles_by_key(
    ds,
    key: str,
    column: str,
    qs: list[float],
    bins: int = 256,
    out_names: list[str] | None = None,
):
    """Per-KEY approximate quantiles via a mergeable uniform-histogram
    sketch — ZERO shuffles (engine-added; the exact one-shuffle path is
    ``grouptop.quantile_per_key``; this is the sketch path for when even
    one all-to-all on the fact table is too expensive).

    Two linear passes over the data:

    1. per-batch ``(key, min, max, count)`` partials — a few rows per
       distinct key per batch — reduced driver-side and broadcast
       (``ray.put`` once, read zero-copy in every task);
    2. per-batch sparse ``(key, bucket)`` count partials over each key's
       ``bins`` uniform buckets, reduced driver-side into a K×bins count
       matrix (kilobytes per key — the sketch, mergeable by addition).

    The estimate for quantile ``q`` of a key with ``lo < hi`` is the
    UPPER EDGE of the bucket containing the rank-``ceil(q·n)`` value:

        bucket(v) = clamp(floor(((v − lo) · bins) / (hi − lo)), 0, bins−1)
        est       = lo + ((b_q + 1) · (hi − lo)) / bins

    evaluated in exactly this double-precision operation order, so an
    oracle computing the same expressions (e.g. DuckDB SQL) matches
    bit-for-bit.  Error bound: |est − exact quantile_disc| ≤ (hi−lo)/bins.
    Keys with a single distinct value return that value.

    Scale contract: distinct keys (× bins × 8 bytes) must fit the
    driver/broadcast — the users/domains regime, not arbitrary key
    cardinality (use the exact shuffled path there).
    """
    import ray

    out_names = out_names or [f"p{int(q * 100)}_est" for q in qs]
    fbins = float(bins)

    def stats_partial(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[column].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(k, kind="stable")
        ks, vs = k[order], v[order]
        new = np.empty(len(ks), dtype=bool)
        if len(ks):
            new[0] = True
            new[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(new)
        return pa.table(
            {
                key: pa.array(ks[starts]),
                "lo": pa.array(np.minimum.reduceat(vs, starts), pa.float64()),
                "hi": pa.array(np.maximum.reduceat(vs, starts), pa.float64()),
                "n": pa.array(
                    np.diff(np.append(starts, len(ks))).astype(np.int64), pa.int64()
                ),
            }
        )

    parts = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    st = (
        parts.groupby(key)
        .agg(lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum"))
        .sort_index()
    )
    keys_sorted = st.index.to_numpy()
    lo = st["lo"].to_numpy(np.float64)
    hi = st["hi"].to_numpy(np.float64)
    n = st["n"].to_numpy(np.int64)
    K = len(keys_sorted)
    stats_ref = ray.put((keys_sorted, lo, hi))

    def bucket_partial(t: pa.Table) -> pa.Table:
        ks_s, lo_b, hi_b = ray.get(stats_ref)
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[column].to_numpy(zero_copy_only=False).astype(np.float64)
        ki = np.searchsorted(ks_s, k)
        spread = hi_b[ki] > lo_b[ki]
        ki, v = ki[spread], v[spread]
        b = np.minimum(
            fbins - 1.0,
            np.maximum(
                0.0, np.floor(((v - lo_b[ki]) * fbins) / (hi_b[ki] - lo_b[ki]))
            ),
        ).astype(np.int64)
        code = ki * bins + b
        cnts = np.bincount(code, minlength=0)
        nz = np.flatnonzero(cnts)
        return pa.table(
            {
                "code": pa.array(nz.astype(np.int64), pa.int64()),
                "c": pa.array(cnts[nz].astype(np.int64), pa.int64()),
            }
        )

    sk = ds.map_batches(bucket_partial, batch_format="pyarrow").to_pandas()
    mat = np.zeros(K * bins, dtype=np.int64)
    np.add.at(mat, sk["code"].to_numpy(np.int64), sk["c"].to_numpy(np.int64))
    cum = np.cumsum(mat.reshape(K, bins), axis=1)

    flat = hi <= lo
    cols = {key: pa.array(keys_sorted)}
    for q, name in zip(qs, out_names):
        rank = np.ceil(q * n.astype(np.float64))
        # first bucket whose cumulative count reaches the rank
        bq = (cum >= rank[:, None]).argmax(axis=1).astype(np.float64)
        est = lo + ((bq + 1.0) * (hi - lo)) / fbins
        cols[name] = pa.array(np.where(flat, lo, est), pa.float64())
    return pa.table(cols)


def distributed_order_stats(
    ds,
    column: str,
    ranks: list[int],
    bins: int = 4096,
    scan_limit: int = 262_144,
    max_rounds: int = 8,
) -> list[float]:
    """Exact 1-indexed order statistics of ``column`` for each rank, by
    the histogram-refinement exchange described in the module docstring."""

    # pass 0: global min/max in ONE combined aggregate pass (separate
    # .min()/.max() calls would each scan the full dataset)
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(column), Max(column))
    lo = mm[f"min({column})"]
    hi = mm[f"max({column})"]
    qs = ranks  # positional correspondence below
    out: list[float | None] = [None] * len(qs)

    # active targets: (index into qs, remaining rank within the current
    # interval, interval lo/hi, whether hi is inclusive). All targets
    # start in the closed global interval; a child interval is half-open
    # [blo, bhi) unless it is the parent's last bucket — tracking this
    # keeps ranks exact when values sit exactly on a bucket edge.
    pending = [(i, ranks[i], float(lo), float(hi), True) for i in range(len(qs))]

    for _ in range(max_rounds):
        if not pending:
            break
        nxt: list[tuple[int, int, float, float, bool]] = []
        # group targets sharing an interval so one histogram pass serves
        # them all (round 1: everything shares the global interval)
        groups: dict[tuple[float, float, bool], list[tuple[int, int]]] = {}
        for i, r, a, b, incl in pending:
            groups.setdefault((a, b, incl), []).append((i, r))
        for (a, b, incl), targets in groups.items():
            if a == b:
                for i, _r in targets:
                    out[i] = a
                continue
            edges = np.linspace(a, b, bins + 1)

            def hist(t: pa.Table, _edges=edges, _a=a, _b=b, _incl=incl) -> pa.Table:
                v = t[column].to_numpy(zero_copy_only=False).astype(np.float64)
                v = v[(v >= _a) & ((v <= _b) if _incl else (v < _b))]
                counts, _ = np.histogram(v, bins=_edges)
                return pa.table({"counts": pa.array([counts.tobytes()], pa.binary())})

            parts = ds.map_batches(hist, batch_format="pyarrow").take_all()
            counts = np.zeros(bins, dtype=np.int64)
            for row in parts:
                counts += np.frombuffer(row["counts"], dtype=np.int64)
            cum = np.concatenate([[0], np.cumsum(counts)])
            for i, r in targets:
                # bucket containing the r-th smallest value in [a, b]
                bi = int(np.searchsorted(cum, r, side="left")) - 1
                bi = min(max(bi, 0), bins - 1)
                r_in = r - int(cum[bi])
                blo = float(edges[bi])
                # np.histogram's last bin is closed on the right
                bhi = float(edges[bi + 1])
                bcount = int(counts[bi])
                child_incl = (bi == bins - 1) and incl
                if bcount <= scan_limit:

                    def in_bucket(t: pa.Table, _blo=blo, _bhi=bhi, _incl=child_incl) -> pa.Table:
                        v = t[column]
                        m = pc.and_(
                            pc.greater_equal(v, _blo),
                            pc.less_equal(v, _bhi) if _incl else pc.less(v, _bhi),
                        )
                        return t.filter(m).select([column])

                    vals = np.sort(
                        ds.map_batches(in_bucket, batch_format="pyarrow")
                        .to_pandas()[column]
                        .to_numpy(dtype="float64")
                    )
                    out[i] = float(vals[r_in - 1])
                else:
                    nxt.append((i, r_in, blo, bhi, child_incl))
        pending = nxt
    if any(v is None for v in out):  # pragma: no cover — max_rounds exhausted
        raise RuntimeError("quantile refinement did not converge (pathological data?)")
    return [float(v) for v in out]


def equi_width_histogram(ds, column: str, bins: int = 64):
    """Global equi-width histogram (the profiling primitive behind the
    quantile refinement above, surfaced as an operator): one combined
    min/max aggregate pass, one linear pass emitting a ``bins``-long
    int64 count vector per batch (kilobytes), driver-merged.  Bucket
    edges are evaluated in a fixed double-precision operation order
    (``lo + (b·(hi−lo))/bins``) so a SQL oracle computing the same
    expressions matches bit-exactly.  The closed top edge puts
    ``v == hi`` in the last bucket, same as the clamp."""
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(column), Max(column))
    lo = float(mm[f"min({column})"])
    hi = float(mm[f"max({column})"])
    fbins = float(bins)

    def hist(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False).astype(np.float64)
        if hi > lo:
            b = np.minimum(
                fbins - 1.0,
                np.maximum(0.0, np.floor(((v - lo) * fbins) / (hi - lo))),
            ).astype(np.int64)
        else:
            b = np.zeros(len(v), np.int64)
        counts = np.bincount(b, minlength=bins)
        return pa.table({"counts": pa.array([counts.tobytes()], pa.binary())})

    parts = ds.map_batches(hist, batch_format="pyarrow").take_all()
    counts = np.zeros(bins, dtype=np.int64)
    for row in parts:
        counts += np.frombuffer(row["counts"], dtype=np.int64)
    b = np.arange(bins, dtype=np.float64)
    return pa.table(
        {
            "bucket": pa.array(np.arange(bins, dtype=np.int64), pa.int64()),
            "lo_edge": pa.array(lo + (b * (hi - lo)) / fbins, pa.float64()),
            "hi_edge": pa.array(lo + ((b + 1.0) * (hi - lo)) / fbins, pa.float64()),
            "c": pa.array(counts, pa.int64()),
        }
    )


def rank_sketch_quantiles_per_key(
    ds,
    key: str,
    column: str,
    qs: list[float],
    m: int = 128,
    out_names: list[str] | None = None,
    num_buckets: int | None = None,
):
    """Per-key quantiles via a mergeable equi-depth RANK sketch with no
    broadcast and no raw-row exchange — the variant of
    :func:`approx_quantiles_by_key` that survives unbounded key
    cardinality (that one broadcasts per-key min/max; this one never
    collects per-key anything).

    Per batch, each key's sorted values compress to ≤ ``m`` weighted
    points — the order statistics at ranks ``ceil(j·n/m)`` with the rank
    gaps as weights — so a point's cumulative weight bounds the true
    rank of its value from above, with error < its batch's gap
    ``⌈n_bk/m⌉``.  ONE hash-bucketed exchange moves only these
    kilobyte-per-key partials; inside the key's bucket a weighted merge
    (sort + cumsum) answers rank queries with total error
    ≤ Σ_batches ⌈n_bk/m⌉ ≤ n_k·B/m for B batches touching the key.
    Estimate for q = first merged point whose cumulative weight reaches
    ``ceil(q·n_k)``.  Deterministic end to end (no randomness), exact
    whenever a key's per-batch counts stay ≤ m.
    """
    import pandas as pd

    from commons_codec_ray.util import adaptive_buckets, hash_bucket

    nb = num_buckets or adaptive_buckets()
    out_names = out_names or [f"p{int(q * 100)}_est" for q in qs]

    def partial(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[column].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((v, k))
        ks, vs = k[order], v[order]
        n = len(ks)
        new = np.empty(n, dtype=bool)
        if n:
            new[0] = True
            new[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        # vectorized two-class compression (no per-key Python loop):
        # runs with c ≤ m keep every value (weight 1); runs with c > m
        # keep the order stats at ranks ceil(j·c/m), j = 1..m — strictly
        # increasing when c > m, so exactly m points with gap weights.
        small = counts <= m
        idx_small = np.flatnonzero(np.repeat(small, counts))
        big_starts = starts[~small]
        big_counts = counts[~small]
        if len(big_starts):
            j = np.arange(1, m + 1)
            ranks = np.ceil(j[None, :] * (big_counts[:, None] / m)).astype(np.int64)
            idx_big = (big_starts[:, None] + ranks - 1).reshape(-1)
            w_big = np.diff(ranks, axis=1, prepend=0).reshape(-1)
        else:
            idx_big = np.zeros(0, np.int64)
            w_big = np.zeros(0, np.int64)
        idx = np.concatenate([idx_small, idx_big])
        w = np.concatenate([np.ones(len(idx_small), np.int64), w_big])
        kk = ks[idx]
        return pa.table(
            {
                "_qb": hash_bucket(kk, nb),
                key: pa.array(kk, pa.int64()),
                "v": pa.array(vs[idx], pa.float64()),
                "w": pa.array(w.astype(np.int64), pa.int64()),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values([key, "v"], kind="mergesort")
        kk = g[key].to_numpy()
        vv = g["v"].to_numpy()
        ww = g["w"].to_numpy()
        n = len(g)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = kk[1:] != kk[:-1]
        gidx = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        # per-key cumulative weights via global cumsum minus run offsets
        cw = np.cumsum(ww)
        base = np.concatenate([[0], cw])[starts]
        cumw = cw - base[gidx]
        totals = np.add.reduceat(ww, starts)
        out = {key: kk[starts]}
        for q, name in zip(qs, out_names):
            target = np.ceil(q * totals).clip(min=1)
            # first point in each run with cumw >= target
            hit = cumw >= target[gidx]
            # index of first hit per run: mask others, take min position
            pos = np.where(hit, np.arange(n), n)
            first = np.minimum.reduceat(pos, starts)
            out[name] = vv[np.minimum(first, n - 1)]
        return pd.DataFrame(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_qb")
        .map_groups(merge, batch_format="pandas")
    )
