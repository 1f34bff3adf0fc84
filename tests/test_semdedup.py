"""semdedup: k-means-clustered within-cluster cosine prune (SemDeDup,
Abbas et al. 2023). The engine must match a single-process replay of
the same integer k-means + final assignment + lower-triangle prune on
any block layout, and exact planted duplicates must collapse to the
smallest id."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from commons_codec_ray.stages.dedup import semdedup
from commons_codec_ray.stages.kmeans import _quantize


def _reference(m: np.ndarray, ids: np.ndarray, k: int, iters: int, thr: float):
    q = _quantize(m)
    cents = q[np.argsort(ids, kind="stable")[:k]]

    def _d2(x, c):
        return (
            (x * x).sum(axis=1, keepdims=True)
            - 2 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )

    for _ in range(iters):
        assign = _d2(q, cents).argmin(axis=1)
        new = cents.copy()
        cnt = np.bincount(assign, minlength=k)
        for c in range(k):
            if cnt[c]:
                new[c] = q[assign == c].sum(axis=0) // cnt[c]
        cents = new
    final = _d2(q, cents).argmin(axis=1)

    norm = m.astype(np.float64)
    norm /= np.linalg.norm(norm, axis=1, keepdims=True)
    out = []
    for cid in range(k):
        sel = np.nonzero(final == cid)[0]
        if not len(sel):
            continue
        order = np.argsort(ids[sel], kind="stable")
        mc, idc = norm[sel][order], ids[sel][order]
        drop = np.tril(mc @ mc.T >= thr, k=-1).any(axis=1)
        out.extend((cid, int(i)) for i in idc[~drop])
    return sorted(out)


def _ds(m, ids, blocks=7):
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def _run(m, ids, blocks, **kw):
    got = semdedup(_ds(m, ids, blocks), **kw).to_pandas()
    return sorted(zip(got["cid"].astype(int), got["vec_id"].astype(int)))


def test_semdedup_matches_reference_multiblock(ray_session):
    rng = np.random.RandomState(5)
    m = rng.uniform(-0.6, 0.6, (240, 16)).astype(np.float32)
    ids = rng.permutation(240).astype(np.int64)
    want = _reference(m, ids, k=5, iters=3, thr=0.35)
    assert _run(m, ids, 7, k=5, iterations=3, threshold=0.35) == want
    # block-layout invariance
    assert _run(m, ids, 2, k=5, iterations=3, threshold=0.35) == want


def test_semdedup_collapses_planted_duplicates(ray_session):
    rng = np.random.RandomState(11)
    base = rng.uniform(-0.5, 0.5, (40, 8)).astype(np.float32)
    # orthogonal-ish noise keeps distinct rows below any high threshold
    m = np.concatenate([base, base[:10]])  # ids 40..49 duplicate 0..9
    ids = np.arange(50, dtype=np.int64)
    kept = {v for _, v in _run(m, ids, 5, k=3, iterations=2, threshold=0.999)}
    # every duplicate pair shares a cluster (identical vectors → same
    # assignment), so the larger id of each pair must be gone
    assert all(40 + i not in kept for i in range(10))
    assert all(i in kept for i in range(10))
    assert len(kept) == 40


def test_semdedup_kmeans_par_init_valid_dedup(ray_session):
    """init='kmeans_par' (the scaled-k production path) is not
    SQL-replayable, but the prune INVARIANT must hold: no two surviving
    same-cluster vectors are within the threshold, and every planted
    exact duplicate still collapses."""
    rng = np.random.RandomState(21)
    base = rng.uniform(-0.5, 0.5, (60, 8)).astype(np.float32)
    m = np.concatenate([base, base[:15]])  # ids 60..74 duplicate 0..14
    ids = np.arange(75, dtype=np.int64)
    got = semdedup(_ds(m, ids, 5), k=4, iterations=2, threshold=0.999, init="kmeans_par").to_pandas()
    kept = set(got["vec_id"].astype(int))
    assert all(60 + i not in kept for i in range(15))
    assert all(i in kept for i in range(15))
