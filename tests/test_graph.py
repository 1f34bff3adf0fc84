"""Distributed fixed-point PageRank (stages/graph.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from commons_codec_ray.stages.graph import SCALE, pagerank


def _edges(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.int64()),
                "dst": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )


def _reference(pairs, iterations):
    """Single-process replay of the exact integer update rule."""
    edges = sorted(set(pairs))
    nodes = sorted({v for e in edges for v in e})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    s0 = SCALE // len(nodes)
    base = 15 * s0 // 100
    score = {v: s0 for v in nodes}
    for _ in range(iterations):
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += score[s] // deg[s]
        score = {v: base + 85 * inc[v] // 100 for v in nodes}
    return score


class TestPagerank:
    PAIRS = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (5, 5), (1, 2)]  # dup + self-loop

    def test_matches_reference_replay(self, ray_session):
        out = pagerank(_edges(self.PAIRS), iterations=3).to_pandas()
        want = _reference(self.PAIRS, 3)
        got = dict(zip(out["node"], out["score"]))
        assert got == want

    def test_sink_node_keeps_base_score(self, ray_session):
        # node 3 has no in-edges after: 1→2, 2→1, 3→1 (3 is a source only)
        pairs = [(1, 2), (2, 1), (3, 1)]
        out = pagerank(_edges(pairs), iterations=2).to_pandas()
        want = _reference(pairs, 2)
        assert dict(zip(out["node"], out["score"])) == want

    def test_bucket_count_invariance(self, ray_session):
        a = pagerank(_edges(self.PAIRS), iterations=2, num_buckets=4).to_pandas()
        b = pagerank(_edges(self.PAIRS), iterations=2, num_buckets=64).to_pandas()
        da = dict(zip(a["node"], a["score"]))
        db = dict(zip(b["node"], b["score"]))
        assert da == db

    def test_total_mass_bounded(self, ray_session):
        out = pagerank(_edges(self.PAIRS), iterations=5).to_pandas()
        assert out["score"].sum() <= SCALE
        assert (out["score"] > 0).all()

    def test_sharded_matches_unioned_variant(self, ray_session):
        # the actor-sharded default and the pure-Dataset unioned variant
        # run the same fixed-point rule — results must be bit-identical
        from commons_codec_ray.stages.graph import pagerank_unioned

        a = pagerank(_edges(self.PAIRS), iterations=3, num_shards=3).to_pandas()
        b = pagerank_unioned(_edges(self.PAIRS), iterations=3).to_pandas()
        assert dict(zip(a["node"], a["score"])) == dict(zip(b["node"], b["score"]))

    def test_shard_count_invariance(self, ray_session):
        a = pagerank(_edges(self.PAIRS), iterations=2, num_shards=1).to_pandas()
        b = pagerank(_edges(self.PAIRS), iterations=2, num_shards=5).to_pandas()
        assert dict(zip(a["node"], a["score"])) == dict(zip(b["node"], b["score"]))


def test_triangle_count_vs_bruteforce(ray_session):
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from commons_codec_ray.stages.graph import triangle_count

    rng = np.random.RandomState(17)
    # multi-edges, self-loops, both orientations of the same edge
    a = rng.randint(0, 40, 1500).astype("int64")
    b = rng.randint(0, 40, 1500).astype("int64")
    ds = rd.from_arrow(
        pa.table({"src": pa.array(a), "dst": pa.array(b)})
    ).repartition(6)
    got = triangle_count(ds).to_pandas()

    eset = {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}
    adj = {}
    for u, v in eset:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = 0
    for u, v in eset:
        tri += len(adj[u] & adj[v] - {u, v})
    assert got["n_edges"].iloc[0] == len(eset)
    assert got["n_triangles"].iloc[0] == tri // 3


def test_triangle_count_exchange_degrees_matches_broadcast(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from commons_codec_ray.stages.graph import triangle_count

    rng = np.random.RandomState(29)
    a = rng.randint(0, 60, 2500).astype("int64")
    b = rng.randint(0, 60, 2500).astype("int64")
    ds = rd.from_arrow(
        pa.table({"src": pa.array(a), "dst": pa.array(b)})
    ).repartition(5)
    bc = triangle_count(ds, degree_mode="broadcast").to_pandas()
    ex = triangle_count(ds, degree_mode="exchange").to_pandas()
    # the sharded-degree path (no driver degree table, no broadcast)
    # must count the exact same triangles
    assert bc["n_edges"].iloc[0] == ex["n_edges"].iloc[0]
    assert bc["n_triangles"].iloc[0] == ex["n_triangles"].iloc[0]
    assert bc["n_triangles"].iloc[0] > 0


class TestComponentsSharded:
    @staticmethod
    def _pairs_ds(pairs):
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([p[0] for p in pairs], pa.int64()),
                    "id_b": pa.array([p[1] for p in pairs], pa.int64()),
                }
            )
        )

    @staticmethod
    def _reference(pairs):
        # union-find ground truth: min id per component
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in parent}

    def test_path_graph_exercises_jumps(self, ray_session):
        # one long path: diameter 40, so convergence inside the 64-round
        # cap requires the pointer-jump phase to actually shorten chains
        from commons_codec_ray.stages.graph import components_sharded

        pairs = [(i + 1, i) for i in range(40)]
        out = components_sharded(
            self._pairs_ds(pairs), num_shards=3, max_rounds=16
        ).to_pandas()
        want = self._reference(pairs)
        assert dict(zip(out["node"], out["cluster_id"])) == want

    def test_random_graph_matches_dataset_variant(self, ray_session):
        from commons_codec_ray.stages.dedup import dedup_clusters_distributed
        from commons_codec_ray.stages.graph import components_sharded

        rng = np.random.RandomState(23)
        pairs = [
            (int(a), int(b))
            for a, b in zip(rng.randint(0, 300, 500), rng.randint(0, 300, 500))
        ]
        ds = self._pairs_ds(pairs)
        a = components_sharded(ds, num_shards=4).to_pandas()
        b = dedup_clusters_distributed(self._pairs_ds(pairs)).to_pandas()
        got_a = dict(zip(a["node"], a["cluster_id"]))
        got_b = dict(zip(b["doc_id"], b["cluster_id"]))
        assert got_a == got_b == self._reference(pairs)

    def test_shard_count_invariance(self, ray_session):
        from commons_codec_ray.stages.graph import components_sharded

        pairs = [(1, 2), (2, 3), (9, 9), (7, 4), (4, 11), (20, 3)]
        a = components_sharded(self._pairs_ds(pairs), num_shards=1).to_pandas()
        b = components_sharded(self._pairs_ds(pairs), num_shards=5).to_pandas()
        assert dict(zip(a["node"], a["cluster_id"])) == dict(
            zip(b["node"], b["cluster_id"])
        )
