"""Vectorized Bloom filter for broadcast semi/anti joins at scale.

When the dimension-side key set outgrows comfortable broadcast size, a
Bloom filter of it is 10-20× smaller at ~1% false positives: the fact
table streams through the bloom (pure numpy bit probes, no Python loop),
and only the tiny surviving fraction pays the exact check against the
real key set. With false positives re-checked exactly, the composed
filter is EXACT — the bloom only changes cost, never the answer.

Layout: ``m`` bits in a packed uint64 array; ``k`` probes derived from
one splitmix64 hash via double hashing (h1 + i*h2 — the standard
Kirsch–Mitzenmacher construction), so membership tests are ``k`` gathers
into the bit array per batch.
"""

from __future__ import annotations

import numpy as np

_G1 = np.uint64(0x9E3779B97F4A7C15)
_G2 = np.uint64(0xBF58476D1CE4E5B9)


def _mix(k: np.ndarray, gamma: np.uint64) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = (k + gamma) * gamma
        h ^= h >> np.uint64(31)
        h = h * _G2
        h ^= h >> np.uint64(29)
    return h


class BloomFilter:
    """Build once from int64 keys; probe vectorized per batch."""

    def __init__(self, n_keys: int, fp_rate: float = 0.01):
        # optimal m/n = -ln(p)/ln(2)^2, k = m/n * ln(2)
        bits_per_key = max(1.0, -np.log(fp_rate) / (np.log(2) ** 2))
        self.m = int(max(64, 1 << int(np.ceil(np.log2(max(64, n_keys * bits_per_key))))))
        self.k = max(1, int(round(bits_per_key * np.log(2))))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    def _probes(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing."""
        k64 = np.asarray(keys).astype(np.uint64)
        h1 = _mix(k64, _G1)
        h2 = _mix(k64, _G2) | np.uint64(1)  # odd → full-period stride
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return (h1[None, :] + i * h2[None, :]) & np.uint64(self.m - 1)

    def add(self, keys) -> "BloomFilter":
        pos = self._probes(keys).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        return self

    def contains(self, keys) -> np.ndarray:
        """Boolean mask; guaranteed True for every added key (no false
        negatives), ~fp_rate of absent keys also True."""
        pos = self._probes(keys)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def serialize(self) -> dict:
        return {"m": self.m, "k": self.k, "bits": self.bits}

    @classmethod
    def deserialize(cls, d: dict) -> "BloomFilter":
        out = cls.__new__(cls)
        out.m, out.k, out.bits = int(d["m"]), int(d["k"]), np.asarray(d["bits"], np.uint64)
        return out
