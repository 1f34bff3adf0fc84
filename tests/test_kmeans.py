"""kmeans_lloyd: integer Lloyd iterations, driver-reduced partials."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from commons_codec_ray.stages.kmeans import _quantize, kmeans_lloyd


def _reference(m: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Single-process replay of the same integer arithmetic."""
    q = _quantize(m)
    cents = q[np.argsort(ids, kind="stable")[:k]]
    sizes = np.zeros(k, np.int64)
    for _ in range(iters):
        d2 = (
            (q * q).sum(axis=1, keepdims=True)
            - 2 * (q @ cents.T)
            + (cents * cents).sum(axis=1)[None, :]
        )
        assign = d2.argmin(axis=1)
        new = cents.copy()
        cnt = np.bincount(assign, minlength=k).astype(np.int64)
        for c in range(k):
            if cnt[c]:
                new[c] = q[assign == c].sum(axis=0) // cnt[c]
        cents, sizes = new, cnt
    return cents, sizes


def _ds(m, ids, blocks=7):
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def test_kmeans_matches_reference_multiblock(ray_session):
    rng = np.random.RandomState(3)
    m = rng.uniform(-0.6, 0.6, (300, 16)).astype(np.float32)
    ids = rng.permutation(300).astype(np.int64)
    got = kmeans_lloyd(_ds(m, ids), k=5, iterations=4).to_pandas()
    cents, sizes = _reference(m, ids, 5, 4)
    assert got["cval"].to_numpy().tolist() == cents.reshape(-1).tolist()
    per_cid = got.drop_duplicates("cid").sort_values("cid")["size"].to_numpy()
    assert per_cid.tolist() == sizes.tolist()


def test_kmeans_recovers_planted_clusters(ray_session):
    rng = np.random.RandomState(9)
    centers = np.array([[-0.5] * 8, [0.0] * 8, [0.5] * 8], np.float64)
    pts = np.concatenate(
        [c + rng.uniform(-0.05, 0.05, (50, 8)) for c in centers]
    ).astype(np.float32)
    # ids 0/1/2 land one in each planted blob so the deterministic
    # lowest-id seeding starts one centroid per blob (ids stay unique)
    ids = np.arange(3, 153, dtype=np.int64)
    ids[[0, 50, 100]] = [0, 1, 2]
    got = kmeans_lloyd(_ds(pts, ids), k=3, iterations=3).to_pandas()
    sizes = sorted(got.drop_duplicates("cid")["size"].tolist())
    assert sizes == [50, 50, 50]


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    # two distinct points, k=3: one cluster can never win a point
    m = np.array([[0.1, 0.1], [0.3, 0.3], [0.1, 0.1], [0.3, 0.3]], np.float32)
    ids = np.array([0, 1, 2, 3], np.int64)
    got = kmeans_lloyd(_ds(m, ids, blocks=2), k=3, iterations=2).to_pandas()
    c2 = got[got["cid"] == 2]
    # cid 2 seeded from vec_id 2 == duplicate of vec_id 0; ties go to
    # cid 0, so cluster 2 stays empty and keeps its seed centroid
    assert c2["size"].tolist() == [0, 0]
    assert c2["cval"].to_numpy().tolist() == _quantize(m[2:3]).reshape(-1).tolist()


def test_kmeans_par_seeding_deterministic(ray_session):
    from commons_codec_ray.stages.kmeans import _to_points, seed_kmeans_parallel

    rng = np.random.RandomState(17)
    m = rng.uniform(-0.6, 0.6, (400, 12)).astype(np.float32)
    ids = rng.permutation(400).astype(np.int64)
    a = seed_kmeans_parallel(_to_points(_ds(m, ids, blocks=3), "vec_id", "embedding"), k=5)
    b = seed_kmeans_parallel(_to_points(_ds(m, ids, blocks=11), "vec_id", "embedding"), k=5)
    # pure function of the rows: identical across block layouts and runs
    assert a.tolist() == b.tolist()
    assert a.shape == (5, 12)


def test_kmeans_par_beats_adversarial_low_id_seeding(ray_session):
    from commons_codec_ray.stages.kmeans import kmeans_compare_inits

    rng = np.random.RandomState(23)
    centers = np.array([[-0.6] * 8, [-0.2] * 8, [0.2] * 8, [0.6] * 8], np.float64)
    pts = np.concatenate(
        [c + rng.uniform(-0.03, 0.03, (60, 8)) for c in centers]
    ).astype(np.float32)
    # adversarial: ALL low ids sit in blob 0, so low-id seeding starts
    # every centroid in one blob while k-means|| spreads by d²
    ids = np.arange(240, dtype=np.int64)
    res = kmeans_compare_inits(_ds(pts, ids, blocks=5), k=4, iterations=3)
    assert res["kmeans_par"] < res["low_ids"]


def test_kmeans_par_lloyd_runs_end_to_end(ray_session):
    rng = np.random.RandomState(31)
    m = rng.uniform(-0.5, 0.5, (200, 8)).astype(np.float32)
    ids = np.arange(200, dtype=np.int64)
    got = kmeans_lloyd(_ds(m, ids), k=4, iterations=2, init="kmeans_par").to_pandas()
    assert set(got["cid"].unique()) == {0, 1, 2, 3}
    assert got.drop_duplicates("cid")["size"].sum() == 200
