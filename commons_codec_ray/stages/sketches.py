"""Mergeable sketches for distributed approximate aggregates.

The scalable aggregation pattern for distinct-count-like questions at
100 TB: each ``map_batches`` task emits ONE serialized sketch per batch,
and a tiny second stage merges them — sketches are designed to be
mergeable, so the shuffle carries kilobytes instead of the key universe.

KMV (k-minimum-values) estimator: keep the k smallest 64-bit hashes seen;
the (k-1)-th smallest value m estimates distinct count as (k-1)/m (hashes
uniform on [0,1)). Deterministic given the hash function — two runs over
the same data produce the identical estimate — and union-mergeable by
keeping the k smallest of the union.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

_MAX64 = float(1 << 64)


class KMVSketch:
    def __init__(self, k: int = 1024, values: np.ndarray | None = None):
        self.k = k
        self.values = np.array([], dtype=np.uint64) if values is None else values

    @staticmethod
    def _hash(arr) -> np.ndarray:
        """Vectorized 64-bit hash. Integer inputs go straight through two
        splitmix-style rounds (pure numpy, wrapping uint64 array ops —
        intentional and silent, unlike scalar ops); everything else is
        crc32 over the string form, then mixed to 64 bits."""
        a = np.asarray(arr)
        if a.dtype.kind in "iu":
            h = a.astype(np.uint64)
        else:
            h = np.fromiter(
                (zlib.crc32(str(v).encode()) for v in arr), dtype=np.uint64, count=len(a)
            )
        with np.errstate(over="ignore"):
            # golden-gamma pre-add so 0 is not a fixed point of the mix
            # (a bare multiply maps 0 -> 0, a permanent global minimum
            # that would always occupy a k-min slot)
            h = h + np.uint64(0x9E3779B97F4A7C15)
            h = h * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(31)
            h = h * np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(29)
        return h

    def update(self, arr) -> "KMVSketch":
        h = np.unique(self._hash(arr))
        merged = np.unique(np.concatenate([self.values, h]))
        self.values = merged[: self.k]
        return self

    def merge(self, other: "KMVSketch") -> "KMVSketch":
        merged = np.unique(np.concatenate([self.values, other.values]))
        return KMVSketch(self.k, merged[: self.k])

    def estimate(self) -> float:
        n = len(self.values)
        if n < self.k:
            return float(n)  # exact below k
        m = self.values[self.k - 1] / _MAX64
        return (self.k - 1) / m

    def serialize(self) -> bytes:
        return self.values.tobytes()

    @classmethod
    def deserialize(cls, k: int, data: bytes) -> "KMVSketch":
        return cls(k, np.frombuffer(data, dtype=np.uint64))


class MisraGriesSketch:
    """Mergeable heavy-hitters sketch (Misra–Gries): at most ``k``
    counters; any value with true frequency > n/(k+1) is guaranteed
    present, counts under-estimate by ≤ n/(k+1). With ``k`` above the
    distinct-value count the counts are EXACT (how the driver oracle
    verifies it at test scale); at 100 TB the same pipeline ships
    kilobyte sketches instead of a full groupby."""

    def __init__(self, k: int = 4096, counters: dict | None = None, shrunk: bool = False):
        self.k = k
        self.counters: dict[int, int] = dict(counters or {})
        # True once any decrement step has run: counts are now
        # under-estimates (by <= n/(k+1)), no longer exact. Callers that
        # rely on exactness (the driver oracle) must check this.
        self.shrunk = shrunk

    def update(self, arr) -> "MisraGriesSketch":
        a = np.asarray(arr)
        if a.dtype.kind not in "iu":
            # serialize() ships counters as int64 pairs; fail loudly here
            # rather than deep in the distributed merge
            raise TypeError(
                f"MisraGriesSketch requires an integer column (got {a.dtype}); "
                "dictionary-encode string keys to codes first"
            )
        vals, counts = np.unique(a, return_counts=True)
        for v, c in zip(vals.tolist(), counts.tolist()):
            self.counters[v] = self.counters.get(v, 0) + c
        self._shrink()
        return self

    def _shrink(self) -> None:
        over = len(self.counters) - self.k
        if over <= 0:
            return
        # decrement-by-median-ish: subtract the (over)-th smallest count
        cut = sorted(self.counters.values())[over - 1]
        self.counters = {
            v: c - cut for v, c in self.counters.items() if c - cut > 0
        }
        self.shrunk = True

    def merge(self, other: "MisraGriesSketch") -> "MisraGriesSketch":
        merged = dict(self.counters)
        for v, c in other.counters.items():
            merged[v] = merged.get(v, 0) + c
        out = MisraGriesSketch(self.k, merged, shrunk=self.shrunk or other.shrunk)
        out._shrink()
        return out

    def top(self, n: int) -> list[tuple[int, int]]:
        return sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))[:n]

    def serialize(self) -> bytes:
        # one int64 header (shrunk flag) then sorted (value, count) pairs
        items = np.array(sorted(self.counters.items()), dtype=np.int64).reshape(-1, 2)
        header = np.array([1 if self.shrunk else 0], dtype=np.int64)
        return header.tobytes() + items.tobytes()

    @classmethod
    def deserialize(cls, k: int, data: bytes) -> "MisraGriesSketch":
        shrunk = bool(np.frombuffer(data[:8], dtype=np.int64)[0])
        items = np.frombuffer(data[8:], dtype=np.int64).reshape(-1, 2)
        return cls(k, {int(v): int(c) for v, c in items}, shrunk=shrunk)


def heavy_hitters(
    ds, column: str, n: int = 10, k: int = 4096, require_exact: bool = False
) -> list[tuple[int, int]]:
    """Distributed top-n frequent values: one Misra–Gries sketch per
    batch, kilobyte merge on the driver (same shape as approx_distinct).

    ``require_exact=True`` raises loudly if any sketch ever shrank —
    i.e. if counts became approximate because distinct(column) exceeded
    ``k`` — instead of silently returning under-estimates. The driver
    oracle depends on exactness; at real scale callers drop the flag and
    accept the Misra–Gries error bound."""

    def partial(batch: pa.Table) -> pa.Table:
        sk = MisraGriesSketch(k).update(batch[column].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([sk.serialize()], type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc = MisraGriesSketch(k)
    for row in parts:
        acc = acc.merge(MisraGriesSketch.deserialize(k, row["sketch"]))
    if require_exact and acc.shrunk:
        raise RuntimeError(
            f"heavy_hitters(k={k}) shrank: distinct({column}) exceeds sketch "
            "capacity, counts are approximate — raise k or drop require_exact"
        )
    return acc.top(n)


class QuantileSketch:
    """Mergeable one-pass quantile sketch: per update, keep ``k`` evenly
    spaced order statistics of the sorted input, each carrying weight
    n/k; merge concatenates weighted samples; a quantile estimate is the
    value at the target rank of the weighted union.

    Per-batch rank error is ≤ n_batch/k (the stratified-sample gap), so
    the merged estimate's GLOBAL rank error is ≤ total_n/k summed over
    strata — in practice ≪ 1% of rank at k=1024 per batch. The exact
    path (stages/quantiles.py histogram refinement) costs 2-3 full
    passes; this sketch is ONE pass + a kilobyte merge — use it when a
    bounded-error answer per pass matters more than exactness.
    """

    def __init__(self, k: int = 1024):
        self.k = k
        self.values = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    def update(self, arr) -> "QuantileSketch":
        v = np.sort(np.asarray(arr, dtype=np.float64))
        n = len(v)
        if n == 0:
            return self
        if n <= self.k:
            sample, w = v, np.ones(n)
        else:
            # centered stratified picks: element at the middle of each of
            # k equal-rank strata, weight n/k each
            idx = ((np.arange(self.k) + 0.5) * n / self.k).astype(np.int64)
            sample, w = v[idx], np.full(self.k, n / self.k)
        self.values = np.concatenate([self.values, sample])
        self.weights = np.concatenate([self.weights, w])
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        out = QuantileSketch(self.k)
        out.values = np.concatenate([self.values, other.values])
        out.weights = np.concatenate([self.weights, other.weights])
        return out

    def compress(self) -> "QuantileSketch":
        """Re-sample the weighted union back to ~k entries (bounds sketch
        size when merging many partials; adds one more n/k rank error)."""
        if len(self.values) <= self.k:
            return self
        order = np.argsort(self.values, kind="mergesort")
        v, w = self.values[order], self.weights[order]
        cum = np.cumsum(w)
        total = cum[-1]
        targets = (np.arange(self.k) + 0.5) * total / self.k
        idx = np.searchsorted(cum, targets, side="left")
        out = QuantileSketch(self.k)
        out.values = v[np.minimum(idx, len(v) - 1)]
        out.weights = np.full(self.k, total / self.k)
        return out

    def estimate(self, q: float) -> float:
        if len(self.values) == 0:
            return float("nan")
        order = np.argsort(self.values, kind="mergesort")
        v, w = self.values[order], self.weights[order]
        cum = np.cumsum(w)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(i, len(v) - 1)])

    def serialize(self) -> bytes:
        return self.values.tobytes() + self.weights.tobytes()

    @classmethod
    def deserialize(cls, k: int, data: bytes) -> "QuantileSketch":
        arr = np.frombuffer(data, dtype=np.float64)
        out = cls(k)
        out.values = arr[: len(arr) // 2].copy()
        out.weights = arr[len(arr) // 2 :].copy()
        return out


def approx_quantiles(ds, column: str, qs: list[float], k: int = 1024) -> list[float]:
    """One-pass distributed quantile estimates: one sketch per batch,
    kilobyte merge on the driver (same shape as approx_distinct)."""

    def partial(batch: pa.Table) -> pa.Table:
        sk = QuantileSketch(k).update(batch[column].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([sk.serialize()], type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc = QuantileSketch(k)
    for row in parts:
        # compress each step so the accumulator stays ~k entries — pure
        # concatenation would grow linearly with batch count (16 GB at
        # 10^6 batches), defeating the kilobyte-merge design
        acc = acc.merge(QuantileSketch.deserialize(k, row["sketch"])).compress()
    return [acc.estimate(q) for q in qs]


def approx_distinct(ds, column: str, k: int = 1024) -> float:
    """Distributed distinct-count estimate: one sketch per batch → merge.

    The partial stage emits one (serialized-sketch) row per batch; the
    merge happens on the driver over those few rows (bytes, not data).
    """

    def partial(batch: pa.Table) -> pa.Table:
        sk = KMVSketch(k).update(batch[column].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([sk.serialize()], type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc = KMVSketch(k)
    for row in parts:
        acc = acc.merge(KMVSketch.deserialize(k, row["sketch"]))
    return acc.estimate()
