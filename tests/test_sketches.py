"""KMV sketch: exactness below k, accuracy above k, merge semantics."""

import numpy as np

from commons_codec_ray.stages.sketches import KMVSketch


def test_exact_below_k():
    sk = KMVSketch(k=256).update(list(range(100)))
    assert sk.estimate() == 100.0
    sk.update(list(range(100)))  # duplicates don't change the estimate
    assert sk.estimate() == 100.0


def test_estimate_within_bounds_above_k():
    n = 50_000
    sk = KMVSketch(k=1024)
    # update in chunks, as the distributed partial stage would
    for lo in range(0, n, 7000):
        sk.update([f"user-{i}" for i in range(lo, min(n, lo + 7000))])
    est = sk.estimate()
    # KMV relative std ≈ 1/sqrt(k-1) ≈ 3.1%; allow 5σ
    assert abs(est - n) / n < 0.16


def test_merge_equals_single_pass():
    a = KMVSketch(k=512).update([f"x{i}" for i in range(3000)])
    b = KMVSketch(k=512).update([f"x{i}" for i in range(1500, 4500)])
    merged = a.merge(b)
    single = KMVSketch(k=512).update([f"x{i}" for i in range(4500)])
    assert merged.estimate() == single.estimate()  # deterministic + mergeable


def test_serialize_roundtrip():
    sk = KMVSketch(k=128).update(list(range(1000)))
    back = KMVSketch.deserialize(128, sk.serialize())
    assert back.estimate() == sk.estimate()


def test_misra_gries_exact_below_capacity_and_merge():
    import numpy as np

    from commons_codec_ray.stages.sketches import MisraGriesSketch

    rng = np.random.RandomState(3)
    a = rng.randint(0, 50, 5000)
    b = rng.randint(0, 50, 5000)
    merged = MisraGriesSketch(4096).update(a).merge(MisraGriesSketch(4096).update(b))
    both = np.concatenate([a, b])
    vals, counts = np.unique(both, return_counts=True)
    exact = dict(zip(vals.tolist(), counts.tolist()))
    assert merged.counters == exact  # capacity > distinct → exact


def test_misra_gries_guarantee_above_capacity():
    import numpy as np

    from commons_codec_ray.stages.sketches import MisraGriesSketch

    # 1 heavy value + many singletons; tiny capacity
    data = np.concatenate([np.full(500, 7), np.arange(1000, 1300)])
    sk = MisraGriesSketch(16).update(data)
    top = sk.top(1)
    assert top[0][0] == 7  # guaranteed: freq > n/(k+1)
    assert top[0][1] <= 500  # counts never over-estimate


def test_misra_gries_serialize_roundtrip():
    import numpy as np

    from commons_codec_ray.stages.sketches import MisraGriesSketch

    sk = MisraGriesSketch(64).update(np.array([1, 1, 2, 3, 3, 3]))
    rt = MisraGriesSketch.deserialize(64, sk.serialize())
    assert rt.counters == sk.counters
    assert rt.shrunk is False


def test_misra_gries_shrunk_flag_tracks_exactness():
    import numpy as np

    from commons_codec_ray.stages.sketches import MisraGriesSketch

    exact = MisraGriesSketch(4096).update(np.arange(100))
    assert exact.shrunk is False

    # capacity exceeded → decrement step ran → flag set, survives
    # serialize/deserialize and propagates through merge
    approx = MisraGriesSketch(16).update(np.arange(1000))
    assert approx.shrunk is True
    rt = MisraGriesSketch.deserialize(16, approx.serialize())
    assert rt.shrunk is True
    merged = MisraGriesSketch(4096, shrunk=False).merge(rt)
    assert merged.shrunk is True


def test_heavy_hitters_require_exact_raises_on_shrink(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    import ray.data as rd

    from commons_codec_ray.stages.sketches import heavy_hitters

    # 5 genuinely heavy values (500 each) + 1500 singletons; k=64 shrinks
    heavy = np.repeat(np.arange(5), 500)
    tail = np.arange(100, 1600)
    tbl = pa.table({"v": pa.array(np.concatenate([heavy, tail]), pa.int64())})
    pq.write_table(tbl, tmp_path / "t.parquet")
    ds = rd.read_parquet(str(tmp_path / "t.parquet"))
    with pytest.raises(RuntimeError, match="shrank"):
        heavy_hitters(ds, "v", n=5, k=64, require_exact=True)
    # without the flag the approximate answer still surfaces the heavies
    top = heavy_hitters(ds, "v", n=5, k=64)
    assert sorted(v for v, _ in top) == [0, 1, 2, 3, 4]


def test_quantile_sketch_bounded_rank_error():
    from commons_codec_ray.stages.sketches import QuantileSketch

    rng = np.random.RandomState(2)
    data = rng.lognormal(0, 2, 200_000)
    # simulate the distributed shape: per-batch sketches merged
    acc = QuantileSketch(k=1024)
    for lo in range(0, len(data), 16_384):
        acc = acc.merge(QuantileSketch(1024).update(data[lo : lo + 16_384]))
    s = np.sort(data)
    n = len(data)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = acc.estimate(q)
        rank = np.searchsorted(s, est, side="right")
        assert abs(rank - q * n) <= 0.01 * n, (q, rank / n)


def test_quantile_sketch_compress_and_serialize():
    from commons_codec_ray.stages.sketches import QuantileSketch

    rng = np.random.RandomState(5)
    data = rng.uniform(0, 1, 100_000)
    sk = QuantileSketch(512).update(data[:50_000]).merge(
        QuantileSketch(512).update(data[50_000:])
    )
    compact = sk.compress()
    assert len(compact.values) <= 512
    rt = QuantileSketch.deserialize(512, compact.serialize())
    for q in (0.25, 0.75):
        assert abs(rt.estimate(q) - q) < 0.02  # uniform data: value ≈ q


def test_kmv_zero_is_not_a_fixed_point():
    h = KMVSketch._hash(np.array([0], dtype=np.int64))
    assert int(h[0]) != 0
    # and 0 must not claim the global-minimum slot systematically: its
    # hash should land nowhere near the bottom of the 64-bit range for
    # this mix (deterministic check, not a distributional one)
    assert int(h[0]) > (1 << 32)
