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


def _key_codes(arr) -> np.ndarray:
    """Deterministic int64 code per key for RANGE partitioning.

    Any fixed total order works (boundaries are drawn from the same
    encoding), so string keys use their first 7 bytes little-endian and
    integer keys pass through. Collisions between DIFFERENT keys are
    harmless — per-key counts are computed on the real key — and ties
    of the SAME key share a code by construction, which is what keeps a
    (key, value) tie group inside one partition."""
    a = np.asarray(arr)
    if a.dtype.kind in "iu":
        return a.astype(np.int64)
    return np.fromiter(
        (int.from_bytes(str(s).encode()[:7].ljust(7, b"\0"), "little") for s in a),
        np.int64,
        len(a),
    )


def _composite_partition(
    codes: np.ndarray, vals: np.ndarray, b_code: np.ndarray, b_val: np.ndarray
) -> np.ndarray:
    """p[i] = |{j : (b_code[j], b_val[j]) <= (codes[i], vals[i])}| under
    lexicographic order — a vectorized composite ``searchsorted`` via
    one merge lexsort (boundaries sort BEFORE equal rows, so a boundary
    exactly on a tie group sends the whole group right)."""
    nb = len(b_code)
    if nb == 0:
        return np.zeros(len(codes), np.int64)
    all_c = np.concatenate([b_code, codes])
    all_v = np.concatenate([b_val, vals])
    is_b = np.zeros(len(all_c), bool)
    is_b[:nb] = True
    order = np.lexsort((~is_b, all_v, all_c))
    before = np.cumsum(is_b[order]) - is_b[order]
    p = np.empty(len(all_c), np.int64)
    p[order] = before
    return p[nb:]


def keyed_percent_rank(
    ds,
    key: str,
    value: str,
    tiebreak: str,
    out_pr: str = "pr_ppm",
    out_cd: str = "cd_ppm",
    num_partitions: int | None = None,
    sample_mod: int = 16,
):
    """Exact percent_rank / cume_dist PER KEY that never assumes one
    key's rows fit one worker (the skew-safe path for
    ``q_percent_rank``; engine-added, no reference counterpart).

    Shape: (1) a hash-sampled (key_code, value) set yields composite
    range boundaries (kilobytes on the driver); (2) ONE shuffle
    range-partitions rows lexicographically by (key_code, value) — a
    hot key spreads across MANY partitions by value range, while every
    (key, value) tie group stays in one partition (boundaries come from
    the same encoding, so the split points can't land inside a tie);
    (3) per partition, a vectorized lexsort + per-key-run searchsorted
    yields local less-than / less-or-equal counts; (4) per-(key,
    partition) row counts — at most keys × partitions rows, kilobytes —
    prefix-sum into per-key offsets on the driver and broadcast for the
    final map. Integer parts-per-million outputs (floor division), so
    results are bit-identical to the single-group pandas path and the
    SQL window oracle at any partition count.
    """
    num_partitions = num_partitions or adaptive_buckets()

    sample = ds.map_batches(
        lambda t: t.select([key, value]).filter(
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
        b_code = np.empty(0, np.int64)
        b_val = np.empty(0, np.float64)
    else:
        sc = _key_codes(sample[key].to_numpy())
        sv = sample[value].to_numpy(dtype=np.float64)
        order = np.lexsort((sv, sc))
        idx = np.unique(
            np.linspace(0, len(order), num_partitions + 1, dtype=np.int64)[1:-1]
        )
        b_code, b_val = sc[order][idx], sv[order][idx]
    bounds_ref = ray.put((b_code, b_val))

    def assign(t: pa.Table) -> pa.Table:
        bc, bv = ray.get(bounds_ref)
        codes = _key_codes(t[key].to_numpy(zero_copy_only=False))
        vals = t[value].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column(
            "_rp", pa.array(_composite_partition(codes, vals, bc, bv))
        )

    def local_counts(df: pd.DataFrame) -> pd.DataFrame:
        kf, _ = pd.factorize(df[key], sort=False)
        v = df[value].to_numpy(dtype=np.float64)
        order = np.lexsort((v, kf))
        ks, vs = kf[order], v[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        ends = np.r_[starts[1:], len(ks)]
        less = np.empty(len(ks), np.int64)
        le = np.empty(len(ks), np.int64)
        for s, e in zip(starts, ends):  # per KEY-RUN, not per row
            less[s:e] = np.searchsorted(vs[s:e], vs[s:e], side="left")
            le[s:e] = np.searchsorted(vs[s:e], vs[s:e], side="right")
        df = df.copy()
        inv = np.empty(len(ks), np.int64)
        inv[order] = np.arange(len(ks))
        df["_less"] = less[inv]
        df["_le"] = le[inv]
        return df

    ranked = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("_rp")
        .map_groups(local_counts, batch_format="pandas")
        .materialize()
    )

    counts = (
        ranked.map_batches(
            lambda t: t.select([key, "_rp"])
            .group_by([key, "_rp"])
            .aggregate([("_rp", "count")])
            .rename_columns([key, "_rp", "n"]),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby([key, "_rp"])["n"]
        .sum()
        .reset_index()
        .sort_values([key, "_rp"])
    )
    counts["off"] = counts.groupby(key)["n"].cumsum() - counts["n"]
    totals = counts.groupby(key)["n"].sum()
    off_map = {
        (k, int(p)): int(o)
        for k, p, o in zip(counts[key], counts["_rp"], counts["off"])
    }
    n_map = totals.to_dict()
    maps_ref = ray.put((off_map, n_map))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        off_m, n_m = ray.get(maps_ref)
        ks = df[key].to_numpy()
        ps = df["_rp"].to_numpy()
        off = np.fromiter(
            (off_m[(k, int(p))] for k, p in zip(ks, ps)), np.int64, len(df)
        )
        n = np.fromiter((n_m[k] for k in ks), np.int64, len(df))
        df = df.copy()
        df[out_pr] = (off + df["_less"].to_numpy()) * 1_000_000 // np.maximum(
            n - 1, 1
        )
        df[out_cd] = (off + df["_le"].to_numpy()) * 1_000_000 // n
        return df.drop(columns=["_rp", "_less", "_le"])

    return ranked.map_batches(finish, batch_format="pandas")


def bm25_topk(
    ds,
    query_terms: list[str],
    k: int = 20,
    id_column: str = "doc_id",
    column: str = "text",
):
    """Fixed-point BM25 top-k for one query, bit-identical to the SQL
    oracle (engine-added; k1 = 1.2, b = 0.75).

    Floats would drift in the last ulp between engines, so the score is
    an all-integer rational: with N docs, A total tokens and S = 10^6,

        idf(t)  = (2N − 2·df + 1)·S // (2·df + 1)        (∝ (N−df+.5)/(df+.5))
        tfnorm  = 44·tf·A // (20·tf·A + 6·A + 18·dl·N)    (∝ 2.2·tf / (tf + 1.2·(0.25 + 0.75·dl/avgdl)))
        score   = Σ_t idf(t) · 44·tf·A // (20·tf·A + 6·A + 18·dl·N)

    (numerator and denominator of the classic form multiplied through by
    20·N·avgdl; every division is a floor, so any engine computing the
    same integers ranks identically).  Guarded against int64 overflow —
    at corpus sizes where idf·44·tf·A approaches 2^63 the scale constant
    S must shrink; the guard raises loudly instead of wrapping.

    Two linear passes, no shuffle: per-batch (df-partial, token-count)
    aggregates reduce on the driver (a |terms|-row table); scoring is a
    per-batch vectorized pass keeping a local top-k, reduced driver-side
    (k·num_batches rows).  Tokenization is a single-space split with
    empties kept, matching ``string_split(text, ' ')``.
    """
    import pyarrow.compute as pc

    # dedupe while preserving order: a duplicated query term would emit
    # two identical partial rows per batch and the groupby('term') sum
    # would double-count df, skewing that term's idf
    terms = list(dict.fromkeys(query_terms))
    tset = pa.array(terms, pa.string())

    def partials(t: pa.Table) -> pa.Table:
        col = t[column].combine_chunks() if isinstance(t[column], pa.ChunkedArray) else t[column]
        la = pc.split_pattern(col, pattern=" ")
        offsets = la.offsets.to_numpy().astype(np.int64)
        cnt = np.diff(offsets)
        toks = la.flatten().to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(t.num_rows), cnt)
        df_counts = []
        for term in terms:
            hit_docs = np.unique(doc_of[toks == term])
            df_counts.append(len(hit_docs))
        return pa.table(
            {
                "term": tset,
                "df_part": pa.array(df_counts, pa.int64()),
                "n_part": pa.array([t.num_rows] * len(terms), pa.int64()),
                "a_part": pa.array([int(cnt.sum())] * len(terms), pa.int64()),
            }
        )

    agg = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    per_term = agg.groupby("term")["df_part"].sum()
    one_term = agg[agg["term"] == terms[0]]
    N = int(one_term["n_part"].sum())
    A = int(one_term["a_part"].sum())
    S = 1_000_000
    idf = {t: (2 * N - 2 * int(per_term[t]) + 1) * S // (2 * int(per_term[t]) + 1)
           for t in terms if per_term[t] > 0}
    max_idf = max(idf.values(), default=0)
    # int64 overflow guard: idf · 44 · tf · A must stay below 2^63
    if max_idf and max_idf * 44 * A > (2**62):  # tf ≥ 1 headroom ×2
        raise OverflowError(
            "bm25 fixed-point scale too large for this corpus; lower S"
        )
    if not idf:  # no query term occurs in the corpus
        return pa.table(
            {id_column: pa.array([], pa.int64()), "score": pa.array([], pa.int64())}
        )

    def score_batch(t: pa.Table) -> pa.Table:
        col = t[column].combine_chunks() if isinstance(t[column], pa.ChunkedArray) else t[column]
        la = pc.split_pattern(col, pattern=" ")
        offsets = la.offsets.to_numpy().astype(np.int64)
        cnt = np.diff(offsets)
        toks = la.flatten().to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(t.num_rows), cnt)
        score = np.zeros(t.num_rows, np.int64)
        any_hit = np.zeros(t.num_rows, bool)
        dlN = 18 * cnt * N
        for term, widf in idf.items():
            hits = doc_of[toks == term]
            if not len(hits):
                continue
            tf = np.bincount(hits, minlength=t.num_rows).astype(np.int64)
            has = tf > 0
            num = 44 * tf[has] * A
            den = 20 * tf[has] * A + 6 * A + dlN[has]
            score[has] += widf * num // den
            any_hit |= has
        ids = t[id_column].to_numpy(zero_copy_only=False)[any_hit]
        sc = score[any_hit]
        # local top-k: (score desc, id asc)
        order = np.lexsort((ids, -sc))[:k]
        return pa.table(
            {
                id_column: pa.array(ids[order]),
                "score": pa.array(sc[order], pa.int64()),
            }
        )

    tops = ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    tops = tops.sort_values(
        ["score", id_column], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pa.table(
        {
            id_column: pa.array(tops[id_column].to_numpy()),
            "score": pa.array(tops["score"].to_numpy(np.int64), pa.int64()),
        }
    )


def _skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean mask of the maximize-(x, y) Pareto frontier.

    Dominance: u dominates t iff u.x ≥ t.x, u.y ≥ t.y and one is
    strict — so exact duplicates never dominate each other and are BOTH
    kept (matching a ``NOT EXISTS`` dominance oracle).  One vectorized
    sweep: sort by (x desc, y desc); a row survives iff its y equals its
    x-group's max AND beats the running max over strictly-greater x.
    """
    m = len(x)
    if m == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    new_x = np.empty(m, dtype=bool)
    new_x[0] = True
    new_x[1:] = xs[1:] != xs[:-1]
    gidx = np.cumsum(new_x) - 1
    gm = ys[new_x]  # per-group max y (first in group: y sorted desc)
    run = np.maximum.accumulate(gm)
    keep_sorted = ys == gm[gidx]
    prev = gidx > 0
    keep_sorted[prev] &= ys[prev] > run[gidx[prev] - 1]
    mask = np.zeros(m, dtype=bool)
    mask[order] = keep_sorted
    return mask


def skyline(ds, x: str, y: str):
    """Distributed 2-D skyline / Pareto frontier maximizing ``(x, y)``
    (engine-added): rows no other row dominates.  The skyline operator
    is idempotent over union — skyline(A ∪ B) ⊆ skyline(A) ∪ skyline(B)
    — so the shape is a LOCAL vectorized sweep per batch (typically a
    99%+ reduction) followed by one single-partition final sweep over
    the surviving candidates; no shuffle, no driver materialization.
    All input columns pass through.  The final frontier is assumed
    small (true unless x and y are perfectly anti-correlated — the
    usual skyline contract); candidates stream through the object
    store either way."""

    def local(t: pa.Table) -> pa.Table:
        xv = t[x].to_numpy(zero_copy_only=False).astype(np.float64)
        yv = t[y].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.filter(pa.array(_skyline_mask(xv, yv)))

    return ds.map_batches(local, batch_format="pyarrow").repartition(1).map_batches(
        local, batch_format="pyarrow"
    )


def ntile(ds, value: str, tiebreak: str, k: int, out: str = "tile"):
    """Exact distributed NTILE(k) OVER (ORDER BY value, tiebreak):
    rides the ``global_rank`` range-partition machinery (one shuffle)
    and maps ranks through the SQL-standard bucket formula — the first
    ``n % k`` buckets take ``⌈n/k⌉`` rows, the rest ``⌊n/k⌋`` —
    vectorized per batch with broadcast (n, k) constants."""
    n = ds.count()
    ranked = global_rank(ds, value, tiebreak, out="_rn")
    small = n // k
    r = n % k
    big = small + 1
    cut = r * big

    def tile(t: pa.Table) -> pa.Table:
        rn = t["_rn"].to_numpy(zero_copy_only=False)
        lo = (rn - 1) // big + 1
        hi = r + (rn - 1 - cut) // max(small, 1) + 1
        return t.drop_columns(["_rn"]).append_column(
            out, pa.array(np.where(rn <= cut, lo, hi).astype(np.int64))
        )

    return ranked.map_batches(tile, batch_format="pyarrow")
