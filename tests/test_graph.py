"""Distributed fixed-point PageRank (stages/graph.py)."""

import numpy as np
import pyarrow as pa
import pytest
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


class TestKCore:
    """kcore: simultaneous peel — known graphs + layout invariance."""

    @staticmethod
    def _run(src, dst, k, blocks=5, max_rounds=12):
        from commons_codec_ray.stages.graph import kcore

        t = pa.table(
            {
                "src": pa.array(np.asarray(src, np.int64)),
                "dst": pa.array(np.asarray(dst, np.int64)),
            }
        )
        got = kcore(rd.from_arrow(t).repartition(blocks), k=k, max_rounds=max_rounds).to_pandas()
        if got.empty:  # zero-row to_pandas drops columns in Ray Data
            return {}
        return dict(zip(got["node"].astype(int), got["deg"].astype(int)))

    def test_clique_with_pendant_chain(self, ray_session):
        # K5 on 0..4 plus chain 4-10-11-12: k=3 keeps exactly the clique,
        # and the peel must cascade down the chain (not just one round)
        src = [u for u in range(5) for v in range(u + 1, 5)] + [4, 10, 11]
        dst = [v for u in range(5) for v in range(u + 1, 5)] + [10, 11, 12]
        core = self._run(src, dst, k=3)
        assert core == {i: 4 for i in range(5)}

    def test_two_core_of_cycle_survives(self, ray_session):
        # cycle 0..5 with one pendant: 2-core = the cycle, pendant gone
        src = [0, 1, 2, 3, 4, 5, 3]
        dst = [1, 2, 3, 4, 5, 0, 99]
        core = self._run(src, dst, k=2)
        assert core == {i: 2 for i in range(6)}

    def test_multi_edges_and_self_loops_collapse(self, ray_session):
        # duplicated edges + self loops must not inflate degrees
        src = [0, 0, 0, 1, 1, 2, 7]
        dst = [1, 1, 2, 2, 0, 0, 7]
        core = self._run(src, dst, k=2)
        assert core == {0: 2, 1: 2, 2: 2}

    def test_block_layout_invariance(self, ray_session):
        rng = np.random.RandomState(4)
        src = rng.randint(0, 60, 400)
        dst = rng.randint(0, 60, 400)
        a = self._run(src, dst, k=4, blocks=2)
        b = self._run(src, dst, k=4, blocks=11)
        assert a == b

    def test_empty_core(self, ray_session):
        # a tree has empty 2-core
        src = [0, 0, 1, 1]
        dst = [1, 2, 3, 4]
        assert self._run(src, dst, k=2) == {}


class TestKCoreSharded:
    @staticmethod
    def _edges(seed, n_nodes=80, n_edges=500):
        rng = np.random.RandomState(seed)
        t = pa.table(
            {
                "src": pa.array(rng.randint(0, n_nodes, n_edges).astype(np.int64)),
                "dst": pa.array(rng.randint(0, n_nodes, n_edges).astype(np.int64)),
            }
        )
        return rd.from_arrow(t).repartition(6)

    @staticmethod
    def _as_dict(ds):
        df = ds.to_pandas()
        if df.empty:
            return {}
        return dict(zip(df["node"].astype(int), df["deg"].astype(int)))

    def test_matches_dataset_variant(self, ray_session):
        from commons_codec_ray.stages.graph import kcore, kcore_sharded

        for seed, k in ((1, 3), (2, 6), (3, 12)):
            want = self._as_dict(kcore(self._edges(seed), k=k, max_rounds=64))
            got = self._as_dict(kcore_sharded(self._edges(seed), k=k))
            assert got == want, (seed, k)

    def test_shard_count_invariance(self, ray_session):
        from commons_codec_ray.stages.graph import kcore_sharded

        a = self._as_dict(kcore_sharded(self._edges(7), k=5, num_shards=1))
        b = self._as_dict(kcore_sharded(self._edges(7), k=5, num_shards=4))
        assert a == b and a

    def test_deep_peel_chain(self, ray_session):
        from commons_codec_ray.stages.graph import kcore_sharded

        # K4 with a 30-node pendant chain: the chain must cascade away
        # over many rounds, core = the K4
        src = [u for u in range(4) for v in range(u + 1, 4)] + [3] + list(range(100, 129))
        dst = [v for u in range(4) for v in range(u + 1, 4)] + [100] + list(range(101, 130))
        t = pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
        got = self._as_dict(kcore_sharded(rd.from_arrow(t).repartition(3), k=2, num_shards=3))
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_empty_core_schema(self, ray_session):
        from commons_codec_ray.stages.graph import kcore_sharded

        t = pa.table(
            {"src": pa.array([0, 1], pa.int64()), "dst": pa.array([1, 2], pa.int64())}
        )
        ds = kcore_sharded(rd.from_arrow(t), k=2, num_shards=2)
        assert ds.count() == 0
        assert [f.name for f in ds.schema().base_schema] == ["node", "deg"]


def test_kcore_raises_on_round_exhaustion(ray_session):
    # path graph, k=2: only the two endpoints peel per round, so
    # fixpoint needs ~n/2 rounds — an insufficient cap must RAISE, not
    # return a wrong intermediate "core"
    import pytest

    from commons_codec_ray.stages.graph import kcore

    src = list(range(29))
    dst = list(range(1, 30))
    t = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    with pytest.raises(RuntimeError, match="fixpoint"):
        kcore(rd.from_arrow(t).repartition(3), k=2, max_rounds=3)
    # the default cap converges (empty 2-core of a path)
    assert kcore(rd.from_arrow(t).repartition(3), k=2).count() == 0


def test_kcore_rejects_ids_beyond_32_bits(ray_session):
    import pytest

    from commons_codec_ray.stages.graph import kcore, kcore_sharded

    big = 1 << 32
    t = pa.table(
        {
            "src": pa.array([big, big, big + 1], pa.int64()),
            "dst": pa.array([big + 1, big + 2, big + 2], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="32"):
        kcore(rd.from_arrow(t), k=2).count()
    # the sharded variant handles full-int64 ids: the triangle is a 2-core
    got = kcore_sharded(rd.from_arrow(t), k=2, num_shards=2).to_pandas()
    assert sorted(got["node"].astype(int)) == [big, big + 1, big + 2]


def test_kcore_ids_in_upper_32bit_range_work(ray_session):
    # ids in [2^31, 2^32) used to wrap the signed shift — now valid
    from commons_codec_ray.stages.graph import kcore

    base = (1 << 31) + 5
    src = [base, base, base + 1]
    dst = [base + 1, base + 2, base + 2]
    t = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    got = kcore(rd.from_arrow(t), k=2).to_pandas()
    assert sorted(got["node"].astype(int)) == [base, base + 1, base + 2]
    assert (got["deg"] == 2).all()


def test_kcore_sharded_raises_on_round_exhaustion(ray_session):
    # same contract as the Dataset variant: an insufficient round cap
    # must RAISE rather than return an intermediate non-core
    import pytest

    from commons_codec_ray.stages.graph import kcore_sharded

    src = list(range(99))
    dst = list(range(1, 100))
    t = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    with pytest.raises(RuntimeError, match="fixpoint"):
        kcore_sharded(rd.from_arrow(t).repartition(3), k=2, max_rounds=5, num_shards=3)


class TestDensestSubgraph:
    @staticmethod
    def _run(src, dst, **kw):
        from commons_codec_ray.stages.graph import densest_subgraph

        t = pa.table(
            {
                "src": pa.array(np.asarray(src, np.int64)),
                "dst": pa.array(np.asarray(dst, np.int64)),
            }
        )
        df = densest_subgraph(rd.from_arrow(t).repartition(4), **kw).to_pandas()
        if df.empty:
            return set(), None
        return set(df["node"].astype(int)), (
            int(df["r"].iloc[0]),
            int(df["v_count"].iloc[0]),
            int(df["e_count"].iloc[0]),
        )

    @staticmethod
    def _reference(src, dst):
        a = np.asarray(src, np.int64)
        b = np.asarray(dst, np.int64)
        keep = a != b
        u = np.minimum(a[keep], b[keep])
        v = np.maximum(a[keep], b[keep])
        uv = np.unique(u << 32 | v)
        u, v = uv >> 32, uv & 0xFFFFFFFF
        su, sv = np.concatenate([u, v]), np.concatenate([v, u])
        stats, sets = [], []
        r = 0
        while len(su):
            nodes, inv = np.unique(su, return_inverse=True)
            deg = np.bincount(inv)
            V, E2 = len(nodes), len(su)
            stats.append((r, V, E2 // 2))
            sets.append(set(nodes.tolist()))
            rm = deg * V <= E2
            kp = ~(rm[inv] | rm[np.searchsorted(nodes, sv)])
            su, sv = su[kp], sv[kp]
            r += 1
        best_i = 0
        for i in range(1, len(stats)):
            _, V, E = stats[i]
            _, bv, be = stats[best_i]
            if E * bv > be * V:
                best_i = i
        return sets[best_i], stats[best_i]

    def test_isolates_planted_clique(self, ray_session):
        # K8 on 100..107 + a long sparse path: the clique (density 3.5)
        # must be the winning prefix
        src = [100 + i for i in range(8) for j in range(i + 1, 8)]
        dst = [100 + j for i in range(8) for j in range(i + 1, 8)]
        src += list(range(40))
        dst += list(range(1, 41))
        nodes, (r, v, e) = self._run(src, dst)
        assert nodes == {100 + i for i in range(8)}
        assert (v, e) == (8, 28)

    def test_matches_reference_replay(self, ray_session):
        rng = np.random.RandomState(6)
        for seed in (1, 2):
            rng = np.random.RandomState(seed)
            src = rng.randint(0, 70, 400)
            dst = rng.randint(0, 70, 400)
            got_nodes, got_stats = self._run(src, dst)
            want_nodes, want_stats = self._reference(src, dst)
            assert got_nodes == want_nodes and got_stats == want_stats, seed

    def test_empty_graph(self, ray_session):
        nodes, stats = self._run([5], [5])  # only a self-loop -> empty
        assert nodes == set() and stats is None


def test_clustering_coeff_vs_bruteforce(ray_session):
    from commons_codec_ray.stages.graph import clustering_coeff

    rng = np.random.RandomState(13)
    a = rng.randint(0, 35, 700).astype("int64")
    b = rng.randint(0, 35, 700).astype("int64")
    ds = rd.from_arrow(
        pa.table({"src": pa.array(a), "dst": pa.array(b)})
    ).repartition(5)
    got = clustering_coeff(ds).to_pandas().set_index("node")

    eset = {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}
    adj: dict = {}
    for u, v in eset:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for n, nbrs in adj.items():
        tri = sum(
            1
            for x in nbrs
            for y in nbrs
            if x < y and (min(x, y), max(x, y)) in eset
        )
        d = len(nbrs)
        want_cc = (2_000_000 * tri) // (d * (d - 1)) if d >= 2 else 0
        row = got.loc[n]
        assert int(row["deg"]) == d and int(row["triangles"]) == tri, n
        assert int(row["cc_ppm"]) == want_cc, n
    assert set(got.index) == set(adj)


def test_assortativity_signs(ray_session):
    """Star graph is maximally disassortative (r = −1); the query-level
    machinery is oracle-checked, here we pin the stage-level semantics
    via the same integer-moment formula on known graphs."""
    import duckdb

    # star: center 0 with 6 leaves — all edges pair deg 6 with deg 1
    t = pa.table(
        {
            "src": pa.array([0] * 6, pa.int64()),
            "dst": pa.array(list(range(1, 7)), pa.int64()),
        }
    )
    con = duckdb.connect()
    con.register("edges_in", t)
    r = con.execute(
        """
WITH e AS (SELECT DISTINCT least(src, dst) u, greatest(src, dst) v FROM edges_in WHERE src <> dst),
sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT u AS n, count(*) d FROM sym GROUP BY u)
SELECT corr(CAST(du.d AS DOUBLE), CAST(dv.d AS DOUBLE))
FROM sym s JOIN deg du ON du.n = s.u JOIN deg dv ON dv.n = s.v
"""
    ).fetchone()[0]
    assert abs(r - (-1.0)) < 1e-9


def test_link_prediction_vs_bruteforce(ray_session):
    from commons_codec_ray.stages.graph import link_prediction

    rng = np.random.RandomState(29)
    a = rng.randint(0, 30, 400).astype("int64")
    b = rng.randint(0, 30, 400).astype("int64")
    ds = rd.from_arrow(
        pa.table({"src": pa.array(a), "dst": pa.array(b)})
    ).repartition(5)
    got = link_prediction(ds, top_k=25).to_pandas()

    eset = {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}
    adj: dict = {}
    for u, v in eset:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = []
    nodes = sorted(adj)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if (x, y) in eset:
                continue
            cn = len(adj[x] & adj[y])
            if cn == 0:
                continue
            jac = (1_000_000 * cn) // (len(adj[x]) + len(adj[y]) - cn)
            want.append((jac, cn, x, y))
    want.sort(key=lambda r: (-r[0], -r[1], r[2], r[3]))
    want = want[:25]
    assert len(got) == len(want)
    for (jac, cn, x, y), (_, r) in zip(want, got.iterrows()):
        assert (int(r["a"]), int(r["b"]), int(r["cn"]),
                int(r["jaccard_ppm"])) == (x, y, cn, jac)


def test_link_prediction_bucket_invariance_and_edges(ray_session):
    from commons_codec_ray.stages.graph import link_prediction

    # path 1-2-3-4 plus dup/self-loop noise: open pairs (1,3), (2,4)
    ds = _edges([(1, 2), (2, 3), (3, 4), (2, 1), (3, 3), (2, 3)])
    got = link_prediction(ds, top_k=10).to_pandas()
    rows = {(int(r.a), int(r.b)): (int(r.cn), int(r.jaccard_ppm))
            for r in got.itertuples()}
    # CN(1,3) = {2}; deg(1)=1, deg(3)=2 → jac = 1e6 // 2
    # CN(2,4) = {3}; deg(2)=2, deg(4)=1 → jac = 1e6 // 2
    assert rows == {(1, 3): (1, 500_000), (2, 4): (1, 500_000)}
    samebuckets = link_prediction(ds, top_k=10, num_buckets=256).to_pandas()
    assert got.equals(samebuckets)

    # a single edge has no open wedge pairs → empty with full schema
    empty = link_prediction(_edges([(1, 2)]), top_k=5)
    assert empty.num_rows == 0
    assert empty.column_names == ["a", "b", "cn", "jaccard_ppm"]


def test_link_prediction_resource_allocation_vs_bruteforce(ray_session):
    from commons_codec_ray.stages.graph import RA_SCALE, link_prediction

    rng = np.random.RandomState(31)
    a = rng.randint(0, 30, 400).astype("int64")
    b = rng.randint(0, 30, 400).astype("int64")
    ds = rd.from_arrow(
        pa.table({"src": pa.array(a), "dst": pa.array(b)})
    ).repartition(5)
    got = link_prediction(ds, top_k=25, score="resource_allocation").to_pandas()
    assert got.columns.tolist() == ["a", "b", "cn", "ra"]

    eset = {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}
    adj: dict = {}
    for u, v in eset:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = []
    nodes = sorted(adj)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if (x, y) in eset:
                continue
            common = adj[x] & adj[y]
            if not common:
                continue
            ra = sum(RA_SCALE // len(adj[c]) for c in common)
            want.append((ra, len(common), x, y))
    want.sort(key=lambda r: (-r[0], -r[1], r[2], r[3]))
    want = want[:25]
    assert len(got) == len(want)
    for (ra, cn, x, y), (_, r) in zip(want, got.iterrows()):
        assert (int(r["a"]), int(r["b"]), int(r["cn"]), int(r["ra"])) == (
            x, y, cn, ra,
        )
    with pytest.raises(ValueError, match="unknown link-prediction score"):
        link_prediction(ds, score="adamic_adar")
