"""Bloom filter: no false negatives, bounded false positives, serialize
round-trip, and size advantage over the exact set."""

import numpy as np

from commons_codec_ray.stages.bloom import BloomFilter


def test_no_false_negatives_and_fp_bound():
    rng = np.random.RandomState(7)
    members = rng.choice(10_000_000, 50_000, replace=False).astype(np.int64)
    bloom = BloomFilter(len(members), fp_rate=0.01).add(members)
    assert bloom.contains(members).all()  # the hard guarantee
    absent = np.setdiff1d(
        rng.choice(10_000_000, 100_000, replace=False).astype(np.int64), members
    )
    fp = bloom.contains(absent).mean()
    assert fp < 0.03, fp  # ~1% target, 3x headroom for hash luck


def test_serialize_roundtrip():
    members = np.arange(1000, dtype=np.int64) * 7
    bloom = BloomFilter(len(members)).add(members)
    rt = BloomFilter.deserialize(bloom.serialize())
    assert rt.contains(members).all()
    assert rt.m == bloom.m and rt.k == bloom.k


def test_bloom_smaller_than_exact_set():
    n = 1_000_000
    bloom = BloomFilter(n, fp_rate=0.01)
    # ~9.6 bits/key at 1% FP vs 64 bits/key for an int64 set; the
    # power-of-two rounding of m can cost up to 2x, so guarantee >= 3x
    assert bloom.bits.nbytes < n * 8 / 3
