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
