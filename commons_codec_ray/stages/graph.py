"""Distributed PageRank over an edge Dataset (Pregel-shaped: one
scatter + one gather exchange per iteration).

Scores are FIXED-POINT int64 (scale 10^12) with floor division at every
step: integer addition is exact and commutative, so the result is
bit-identical regardless of summation order, block layout or cluster
size — and a SQL oracle can replay the same iterations with unrolled
CTEs and match hash-exactly.  (Float PageRank would drift in the last
ulp between engines because reduction order differs.)

Semantics: distinct directed edges (multi-edges collapse, self-loops
allowed); damping d = 85/100; dangling-node mass is NOT redistributed
(it decays, same as the oracle).  Per iteration

    s'(v) = base + 85 · (Σ_{u→v} s(u) // outdeg(u)) // 100,
    base  = 15 · (SCALE // N) // 100

Scale shape: the edge list (with per-source outdegree) is bucketed and
materialized ONCE; each iteration runs two integer-keyed exchanges —
scores to their source bucket (scatter: per-edge contributions) and
contributions to their destination bucket (gather: per-node sum).
Nothing is ever collected on the driver; per-round state is one int64
per node.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from commons_codec_ray.util import adaptive_buckets, hash_bucket

SCALE = 1_000_000_000_000


def pagerank(
    edges_ds,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int | None = None,
):
    """(node:int64, score:int64) after ``iterations`` rounds.

    ``edges_ds`` holds integer ``src``/``dst`` columns; duplicates are
    collapsed inside the source bucket before the degree count.
    """
    nb = num_buckets or adaptive_buckets()

    def to_sbucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_sb": hash_bucket(t[src].to_numpy(zero_copy_only=False), nb),
                "src": t[src].cast(pa.int64()),
                "dst": t[dst].cast(pa.int64()),
            }
        )

    def dedupe_and_degree(g: pd.DataFrame) -> pd.DataFrame:
        e = g.drop_duplicates(["src", "dst"])
        deg = e.groupby("src")["dst"].transform("size")
        return pd.DataFrame(
            {"_sb": g["_sb"].iloc[0], "src": e["src"], "dst": e["dst"], "deg": deg}
        )

    # static per-run edge state: distinct edges + outdegree, bucketed by
    # source — materialized once, re-read every iteration
    edges = (
        edges_ds.map_batches(to_sbucket, batch_format="pyarrow")
        .groupby("_sb")
        .map_groups(dedupe_and_degree, batch_format="pandas")
        .materialize()
    )

    # node set: src ∪ dst, distinct inside destination-keyed buckets
    def node_rows(t: pa.Table) -> pa.Table:
        v = np.unique(
            np.concatenate(
                [
                    t["src"].to_numpy(zero_copy_only=False),
                    t["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"_nb": hash_bucket(v, nb), "v": pa.array(v, pa.int64())})

    nodes = (
        edges.map_batches(node_rows, batch_format="pyarrow")
        .groupby("_nb")
        .map_groups(lambda df: df.drop_duplicates("v"), batch_format="pandas")
        .materialize()
    )
    n_nodes = nodes.count()
    s0 = SCALE // n_nodes
    base = 15 * s0 // 100

    def init_scores(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_sb": hash_bucket(v, nb),
                "v": pa.array(v, pa.int64()),
                "s": pa.array(np.full(len(v), s0, np.int64)),
            }
        )

    scores = nodes.map_batches(init_scores, batch_format="pyarrow")

    # tagged-union schema for the scatter bucket: edges carry
    # (src,dst,deg), scores carry (v,s); kind disambiguates
    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "_b": t["_sb"],
                "key": t["src"],
                "dst": t["dst"],
                "deg": t["deg"].cast(pa.int64()),
                "s": pa.array(np.zeros(n, np.int64)),
                "kind": pa.array(np.zeros(n, np.int8)),
            }
        )

    def tag_scores(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "_b": t["_sb"],
                "key": t["v"],
                "dst": pa.array(np.zeros(n, np.int64)),
                "deg": pa.array(np.ones(n, np.int64)),
                "s": t["s"],
                "kind": pa.array(np.ones(n, np.int8)),
            }
        )

    edges_tagged = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    def scatter(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["kind"] == 0]
        sc = g[g["kind"] == 1]
        if not len(e) or not len(sc):
            return pd.DataFrame({"dst": [], "c": []}).astype({"dst": "int64", "c": "int64"})
        m = e.merge(sc[["key", "s"]], on="key", suffixes=("", "_node"))
        return pd.DataFrame({"dst": m["dst"], "c": m["s_node"] // m["deg"]})

    def gather(g: pd.DataFrame) -> pd.DataFrame:
        # node rows (c = 0) guarantee every node survives with base score
        tot = g.groupby("v")["c"].sum()
        return pd.DataFrame(
            {"v": tot.index.to_numpy(np.int64), "s": base + 85 * tot.to_numpy() // 100}
        )

    def node_zero(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_gb": t["_nb"],
                "v": t["v"],
                "c": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        )

    nodes_zero = nodes.map_batches(node_zero, batch_format="pyarrow").materialize()

    def contrib_bucket(t: pa.Table) -> pa.Table:
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"_gb": hash_bucket(d, nb), "v": t["dst"], "c": t["c"]})

    # iterations chain LAZILY — each score Dataset is consumed exactly
    # once by the next round, so one streaming execution runs all
    # 2·iterations exchanges back to back (per-round materialize would
    # pay Ray's fixed execution cost iterations times over)
    for _ in range(iterations):
        tagged = edges_tagged.union(
            scores.map_batches(tag_scores, batch_format="pyarrow")
        )
        contribs = (
            tagged.groupby("_b")
            .map_groups(scatter, batch_format="pandas")
            .map_batches(contrib_bucket, batch_format="pyarrow")
        )
        new_scores = (
            contribs.union(nodes_zero)
            .groupby("_gb")
            .map_groups(gather, batch_format="pandas")
        )
        scores = new_scores.map_batches(
            lambda t: pa.table(
                {
                    "_sb": hash_bucket(t["v"].to_numpy(zero_copy_only=False), nb),
                    "v": t["v"],
                    "s": t["s"],
                }
            ),
            batch_format="pyarrow",
        )

    return scores.map_batches(
        lambda t: pa.table({"node": t["v"], "score": t["s"]}), batch_format="pyarrow"
    )
