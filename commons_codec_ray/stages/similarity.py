"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE
via ``ray.put`` and read in each actor's ``__init__`` (never re-shipped
per batch); each batch is a single float64 matmul. Partial top-k per
batch → tiny per-query reduce.

Scale path: LSH-bucketed search — random-hyperplane signs bucket both
corpus and queries; only matching buckets are scanned (multi-probe by
flipping low-confidence bits would raise recall; documented knob).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from commons_codec_ray.util import pool_size


def _matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """map_batches stage: per-batch cosine scores vs broadcast queries,
    keeping the batch-local top-k per query (partial reduce)."""

    def __init__(self, queries_ref, k: int = 10, id_column: str = "vec_id"):
        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        self.qids = np.asarray(q["ids"])
        self.qmat = _normalize(np.asarray(q["vectors"], dtype=np.float64))
        self.k = k
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        m = _normalize(_matrix(batch["embedding"]))
        scores = self.qmat @ m.T  # (nq, nb)
        k = min(self.k, scores.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(scores.shape[0]):
            # deterministic boundary: (score desc, id asc), matching the
            # oracle's ORDER BY score DESC, vec_id — argpartition alone
            # breaks exact-score ties by batch layout
            idx = np.lexsort((ids, -scores[qi]))[:k]
            out_q.append(np.full(k, self.qids[qi], dtype=np.int64))
            out_v.append(ids[idx])
            out_s.append(scores[qi, idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.id_column: pa.array(np.concatenate(out_v)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )


def ann_topk(ds, query_ids, k: int = 10, id_column: str = "vec_id", round_to: int | None = 4):
    """Top-k cosine neighbors for each query id (queries drawn from ``ds``).

    The query matrix is materialized once (small side), broadcast via
    ``ray.put``; the corpus streams through the scorer; the final reduce
    is a per-query sort+head over ≤ k·num_batches partial rows.
    """
    qtbl = (
        ds.map_batches(
            lambda t: t.filter(pa.compute.is_in(t[id_column], value_set=pa.array(query_ids))),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    qref = ray.put(
        {"ids": qtbl[id_column].to_numpy(), "vectors": np.stack(qtbl["embedding"].to_numpy())}
    )

    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": k, "id_column": id_column},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=pool_size(4),
    )

    def head_k(group: pd.DataFrame) -> pd.DataFrame:
        from commons_codec_ray.util import duckdb_round

        g = (
            group.sort_values(["score", id_column], ascending=[False, True], kind="mergesort")
            .head(k)
            .copy()
        )
        if round_to is not None:
            g["score"] = duckdb_round(g["score"].to_numpy(), round_to)
        return g

    return partials.groupby("query_id").map_groups(head_k, batch_format="pandas")


class IVFIndex:
    """IVF coarse quantizer: seeded k-means (numpy Lloyd, few rounds) on
    a corpus sample; search probes the ``nprobe`` nearest centroids.

    Built once on the driver from a SAMPLE (never the full corpus) and
    broadcast; cluster assignment is one matmul per batch. Recall/cost
    knobs: ``n_clusters`` ~ sqrt(corpus), ``nprobe`` raises recall
    linearly in scan cost.
    """

    def __init__(self, sample: np.ndarray, n_clusters: int = 16, iters: int = 8, seed: int = 3):
        rng = np.random.RandomState(seed)
        sample = _normalize(np.asarray(sample, dtype=np.float64))
        n_clusters = min(n_clusters, len(sample))
        centroids = sample[rng.choice(len(sample), n_clusters, replace=False)]
        for _ in range(iters):
            assign = np.argmax(sample @ centroids.T, axis=1)
            for c in range(n_clusters):
                members = sample[assign == c]
                if len(members):
                    centroids[c] = members.mean(axis=0)
            centroids = _normalize(centroids)
        self.centroids = centroids

    def assign(self, m: np.ndarray) -> np.ndarray:
        return np.argmax(_normalize(m) @ self.centroids.T, axis=1)

    def probe(self, q: np.ndarray, nprobe: int) -> np.ndarray:
        scores = _normalize(np.atleast_2d(q)) @ self.centroids.T
        return np.argsort(-scores, axis=1)[:, :nprobe]

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch["embedding"])
        return batch.append_column("ivf_cluster", pa.array(self.assign(m).astype(np.int64)))


def ivf_topk(ds, query_ids, k: int = 10, id_column: str = "vec_id",
             n_clusters: int = 16, nprobe: int = 4, sample_n: int = 2048):
    """IVF-bucketed approximate top-k: scan only the probed clusters.

    At 100 TB this turns a full-corpus matmul into an ``nprobe /
    n_clusters`` fraction scan; single-digit recall loss at sane knobs.
    """
    sample = ds.limit(sample_n).to_pandas()
    index = IVFIndex(np.stack(sample["embedding"].to_numpy()), n_clusters=n_clusters)

    qtbl = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t[id_column], value_set=pa.array(query_ids))),
        batch_format="pyarrow",
    ).to_pandas()
    qmat = _normalize(np.stack(qtbl["embedding"].to_numpy()).astype(np.float64))
    probed = index.probe(qmat, nprobe)  # (nq, nprobe)
    wanted = pa.array(np.unique(probed))
    qref = ray.put({"ids": qtbl[id_column].to_numpy(), "vectors": qmat, "probed": probed})

    bucketed = ds.map_batches(index, batch_format="pyarrow", batch_size=4096)
    candidates = bucketed.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["ivf_cluster"], value_set=wanted)),
        batch_format="pyarrow",
    )

    class ScoreProbed:
        def __init__(self):
            q = ray.get(qref)
            self.qids, self.qmat, self.probed = q["ids"], q["vectors"], q["probed"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_column].to_numpy(zero_copy_only=False)
            clusters = batch["ivf_cluster"].to_numpy(zero_copy_only=False)
            m = _normalize(_matrix(batch["embedding"]))
            rows = {"query_id": [], id_column: [], "score": []}
            for qi in range(len(self.qids)):
                mask = np.isin(clusters, self.probed[qi])
                if not mask.any():
                    continue
                s = m[mask] @ self.qmat[qi]
                rows["query_id"].append(np.full(mask.sum(), self.qids[qi], dtype=np.int64))
                rows[id_column].append(ids[mask])
                rows["score"].append(s)
            if not rows["query_id"]:
                return pa.table(
                    {"query_id": pa.array([], pa.int64()), id_column: pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64())}
                )
            return pa.table({c: pa.array(np.concatenate(v)) for c, v in rows.items()})

    scored = candidates.map_batches(ScoreProbed, batch_format="pyarrow", concurrency=pool_size(2))

    def head_k(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["score", id_column], ascending=[False, True], kind="mergesort"
        ).head(k)

    return scored.groupby("query_id").map_groups(head_k, batch_format="pandas")


class LSHIndexer:
    """Random-hyperplane LSH bucket assignment (sign bits → int64 bucket)."""

    def __init__(self, dim: int, bits: int = 12, seed: int = 5):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, bits))
        self.bits = bits

    def bucket(self, m: np.ndarray) -> np.ndarray:
        signs = (m @ self.planes) > 0
        return (signs.astype(np.int64) << np.arange(self.bits, dtype=np.int64)).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch["embedding"]))
        return batch.append_column("lsh_bucket", pa.array(self.bucket(m)))


def lsh_topk(ds, query_ids, k: int = 10, id_column: str = "vec_id", bits: int = 8):
    """Approximate top-k: scan only the corpus buckets the queries fall in.

    Lower recall than brute force (single-probe); at 100 TB this turns a
    full-corpus matmul into a few-bucket scan. Bucket count 2^bits should
    be sized ≪ corpus/k so buckets stay non-empty.
    """
    first = ds.take(1)[0]
    dim = len(first["embedding"])
    indexer = LSHIndexer(dim, bits=bits)

    qtbl = (
        ds.map_batches(
            lambda t: t.filter(pa.compute.is_in(t[id_column], value_set=pa.array(query_ids))),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    qmat = _normalize(np.stack(qtbl["embedding"].to_numpy()).astype(np.float64))
    qbuckets = indexer.bucket(qmat)
    wanted = pa.array(np.unique(qbuckets))
    qref = ray.put({"ids": qtbl[id_column].to_numpy(), "vectors": qmat, "buckets": qbuckets})

    bucketed = ds.map_batches(indexer, batch_format="pyarrow", batch_size=4096)
    candidates = bucketed.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["lsh_bucket"], value_set=wanted)),
        batch_format="pyarrow",
    )

    class ScoreInBucket:
        def __init__(self):
            q = ray.get(qref)
            self.qids, self.qmat, self.qbuckets = q["ids"], q["vectors"], q["buckets"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_column].to_numpy(zero_copy_only=False)
            buckets = batch["lsh_bucket"].to_numpy(zero_copy_only=False)
            m = _normalize(_matrix(batch["embedding"]))
            rows = {"query_id": [], id_column: [], "score": []}
            for qi in range(len(self.qids)):
                mask = buckets == self.qbuckets[qi]
                if not mask.any():
                    continue
                s = m[mask] @ self.qmat[qi]
                rows["query_id"].append(np.full(mask.sum(), self.qids[qi], dtype=np.int64))
                rows[id_column].append(ids[mask])
                rows["score"].append(s)
            if not rows["query_id"]:
                return pa.table(
                    {"query_id": pa.array([], pa.int64()), id_column: pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64())}
                )
            return pa.table({c: pa.array(np.concatenate(v)) for c, v in rows.items()})

    scored = candidates.map_batches(ScoreInBucket, batch_format="pyarrow", concurrency=pool_size(2))

    def head_k(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["score", id_column], ascending=[False, True], kind="mergesort"
        ).head(k)

    return scored.groupby("query_id").map_groups(head_k, batch_format="pandas")
