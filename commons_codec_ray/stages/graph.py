"""Distributed PageRank over an edge Dataset (Pregel-shaped, FUSED:
one integer-keyed exchange per iteration).

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

Scale shape (``pagerank``, the actor-sharded default): the edge list
(with per-source outdegree) is bucketed and routed to shard actors
ONCE — hash(src) and hash(v) land a node's out-edges and its score in
the SAME shard, so the classic Pregel round's two exchanges (scores →
source for the scatter join, contributions → destination for the
gather sum) fuse into one.  Per iteration only the (node, contribution)
stream crosses shards, as direct plasma objects between actors; the
driver forwards A² object refs per round and never touches data.  The
static edge table never moves after setup — the fix for the
per-iteration edge re-sort in :func:`pagerank_unioned`, the retained
pure-Dataset variant whose single ``union + groupby`` exchange per
round documents the same fused shape without actors.  Round-0
contributions come straight off the shard-local edges (uniform init
score, no exchange); per-round state is one int64 per node.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from commons_codec_ray.util import adaptive_buckets, hash_bucket

SCALE = 1_000_000_000_000


def pagerank_unioned(
    edges_ds,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int | None = None,
    seeds: "np.ndarray | None" = None,
):
    """(node:int64, score:int64) after ``iterations`` rounds — the
    pure-Dataset variant.

    ``edges_ds`` holds integer ``src``/``dst`` columns; duplicates are
    collapsed inside the source bucket before the degree count.

    ``seeds`` switches to PERSONALIZED PageRank (Page et al. 1999 §6;
    the graph-retrieval/recommendation primitive): the teleport vector
    concentrates on the seed set instead of being uniform —

        s0      = SCALE // |S ∩ V|   (uniform over the LIVE seeds)
        p0(v)   = s0 if v ∈ S else 0
        base(v) = 15·s0//100 if v ∈ S else 0
        p'(v)   = base(v) + 85·(Σ_{u→v} p(u) // outdeg(u)) // 100

    Seeds absent from the graph are ignored (the oracle mirrors this by
    deriving its seed CTE from the node set). The seed array is a
    QUERY-sized driver object captured by closure — personalization
    sets are user/topic-sized, not corpus-sized; a corpus-scale seed
    side would switch to a hash-bucket membership join instead.

    SCALE NOTE: each iteration re-unions the STATIC edge table into the
    ``groupby("_b")`` exchange, so the (dominant) edge table goes
    through Ray's sort-based shuffle once per iteration even though its
    bucket assignment never changes. :func:`pagerank` (the default)
    pins the static state in shard actors and moves only the
    contribution stream per round; this variant is kept as the
    zero-actor fallback, as documentation of the fused scatter+gather
    exchange shape — and as the personalized entry point (the sharded
    variant would carry seeds the same way via its routed setup blocks).
    """
    nb = num_buckets or adaptive_buckets()
    if seeds is not None:
        seeds = np.unique(np.asarray(seeds, np.int64))

    # --- setup: ONE exchange builds the whole static per-run state -------
    # tagged-union schema throughout: kind 0 = edge rows (key=src, dst,
    # deg), kind 1 = contribution/sentinel rows (key=node, c=incoming
    # contribution; sentinels carry c=0 so every node — including
    # dangling and source-only nodes — computes a score and emits its
    # out-contributions).  Raw edges route to hash(src), node candidates
    # (src ∪ dst) to hash(v); the per-bucket merge dedupes multi-edges,
    # counts outdegrees AND dedupes the node set in the same pass — the
    # former separate edge-dedupe and node-distinct exchanges collapse
    # into this one sort.
    def explode_setup(t: pa.Table) -> pa.Table:
        s = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.unique(np.concatenate([s, d]))  # batch-local candidates
        ne, nv = len(s), len(v)
        z = np.zeros(nv, np.int64)
        edges_part = pa.table(
            {
                "_b": hash_bucket(s, nb),
                "key": pa.array(s),
                "dst": pa.array(d),
                "deg": pa.array(np.zeros(ne, np.int64)),
                "c": pa.array(np.zeros(ne, np.int64)),
                "kind": pa.array(np.zeros(ne, np.int8)),
            }
        )
        nodes_part = pa.table(
            {
                "_b": hash_bucket(v, nb),
                "key": pa.array(v),
                "dst": pa.array(z),
                "deg": pa.array(np.ones(nv, np.int64)),
                "c": pa.array(z),
                "kind": pa.array(np.ones(nv, np.int8)),
            }
        )
        return pa.concat_tables([edges_part, nodes_part])

    def setup_group(g: pd.DataFrame) -> pa.Table:
        e = g[g["kind"] == 0].drop_duplicates(["key", "dst"])
        deg = e.groupby("key")["dst"].transform("size").to_numpy(np.int64)
        v = np.unique(g.loc[g["kind"] == 1, "key"].to_numpy(np.int64))
        ne, nv = len(e), len(v)
        zv = np.zeros(nv, np.int64)
        bucket = np.int64(g["_b"].iloc[0])
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "_b": pa.array(np.full(ne, bucket)),
                        "key": pa.array(e["key"].to_numpy(np.int64)),
                        "dst": pa.array(e["dst"].to_numpy(np.int64)),
                        "deg": pa.array(deg),
                        "c": pa.array(np.zeros(ne, np.int64)),
                        "kind": pa.array(np.zeros(ne, np.int8)),
                    }
                ),
                pa.table(
                    {
                        "_b": pa.array(np.full(nv, bucket)),
                        "key": pa.array(v),
                        "dst": pa.array(zv),
                        "deg": pa.array(np.ones(nv, np.int64)),
                        "c": pa.array(zv),
                        "kind": pa.array(np.ones(nv, np.int8)),
                    }
                ),
            ]
        )

    # static state: distinct edges (with outdegree) at hash(src) + one
    # sentinel per node at hash(v) — materialized once, unioned into
    # every iteration verbatim
    static = (
        edges_ds.map_batches(explode_setup, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(setup_group, batch_format="pandas")
        .materialize()
    )

    # exact node (or live-seed) count off the materialized blocks
    # (kilobyte partials) — the s0 denominator
    def _count_init(t: pa.Table) -> pa.Table:
        sel = t["kind"].to_numpy(zero_copy_only=False) == 1
        if seeds is not None:
            sel &= np.isin(t["key"].to_numpy(zero_copy_only=False), seeds)
        return pa.table({"n": pa.array([int(sel.sum())])})

    n_init = int(
        sum(
            r["n"]
            for r in static.map_batches(
                _count_init, batch_format="pyarrow"
            ).take_all()
        )
    )
    if n_init == 0:
        raise ValueError("personalized pagerank: no seed is present in the graph")
    s0 = SCALE // n_init
    base = 15 * s0 // 100

    # round-0 contributions come straight off the static edge rows
    # (init score s0 — uniform, or seeds-only when personalized) —
    # map-only, no exchange
    def contrib0(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy(zero_copy_only=False)
        sel = kind == 0
        if seeds is not None:
            sel &= np.isin(t["key"].to_numpy(zero_copy_only=False), seeds)
        d = t["dst"].to_numpy(zero_copy_only=False)[sel]
        deg = t["deg"].to_numpy(zero_copy_only=False)[sel].astype(np.int64)
        n = len(d)
        return pa.table(
            {
                "_b": hash_bucket(d, nb),
                "key": pa.array(d, pa.int64()),
                "dst": pa.array(np.zeros(n, np.int64)),
                "deg": pa.array(np.ones(n, np.int64)),
                "c": pa.array(s0 // deg),
                "kind": pa.array(np.ones(n, np.int8)),
            }
        )

    def _contrib_table(d: np.ndarray, c: np.ndarray) -> pa.Table:
        n = len(d)
        return pa.table(
            {
                "_b": hash_bucket(d, nb),
                "key": pa.array(d, pa.int64()),
                "dst": pa.array(np.zeros(n, np.int64)),
                "deg": pa.array(np.ones(n, np.int64)),
                "c": pa.array(c, pa.int64()),
                "kind": pa.array(np.full(n, 1, np.int8)),
            }
        )

    def fused_step(last: bool):
        # returns ARROW tables: the output unions with arrow-backed edge
        # /sentinel blocks and Ray's sort sampler requires one block type
        def step(g: pd.DataFrame) -> pa.Table:
            cont = g[g["kind"] == 1]
            tot = cont.groupby("key")["c"].sum()  # sentinels keep every node
            v = tot.index.to_numpy(np.int64)
            b_v = base if seeds is None else np.where(np.isin(v, seeds), base, 0)
            s = b_v + 85 * tot.to_numpy(np.int64) // 100
            if last:
                return pa.table(
                    {"v": pa.array(v, pa.int64()), "s": pa.array(s, pa.int64())}
                )
            e = g[g["kind"] == 0]
            if not len(e):
                return _contrib_table(
                    np.empty(0, np.int64), np.empty(0, np.int64)
                )
            # emit next round's contributions: the new score of each
            # edge's source lives in THIS bucket by construction
            s_of = pd.Series(s, index=v)
            src = e["key"].to_numpy(np.int64)
            out_c = s_of.loc[src].to_numpy(np.int64) // e["deg"].to_numpy(np.int64)
            d_out = e["dst"].to_numpy(np.int64)
            if seeds is not None:
                # personalized mass stays sparse for the first rounds:
                # dropping exact-zero contributions changes no sum
                nz = out_c > 0
                out_c, d_out = out_c[nz], d_out[nz]
            return _contrib_table(d_out, out_c)

        return step

    # iterations chain LAZILY — each round's contributions are consumed
    # exactly once by the next round, so one streaming execution runs
    # all ``iterations`` exchanges back to back
    stream = static.map_batches(contrib0, batch_format="pyarrow")
    for k in range(iterations):
        inp = static.union(stream)
        stream = inp.groupby("_b").map_groups(
            fused_step(last=(k == iterations - 1)), batch_format="pandas"
        )

    return stream.map_batches(
        lambda t: pa.table({"node": t["v"], "score": t["s"]}), batch_format="pyarrow"
    )


def personalized_pagerank(
    edges_ds,
    seeds,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int | None = None,
):
    """Personalized PageRank from a seed set — teleport mass restricted
    to ``seeds`` (see :func:`pagerank_unioned` for the exact integer
    update). The graph-retrieval primitive: scores measure proximity to
    the seed set, e.g. seed = a user's clicked docs, result = expansion
    candidates. Thin named entry point over
    ``pagerank_unioned(seeds=...)``."""
    return pagerank_unioned(
        edges_ds,
        iterations=iterations,
        src=src,
        dst=dst,
        num_buckets=num_buckets,
        seeds=seeds,
    )


@ray.remote
def _pagerank_route(tbl: pa.Table, num_shards: int) -> list[pa.Table] | pa.Table:
    """Split one setup block by owning shard (``_b % num_shards``) so
    each row moves to its shard actor exactly once (plasma → actor,
    never via the driver)."""
    b = tbl["_b"].to_numpy(zero_copy_only=False)
    owner = b % num_shards
    order = np.argsort(owner, kind="stable")
    t = tbl.take(pa.array(order))
    bounds = np.searchsorted(owner[order], np.arange(num_shards + 1))
    parts = [t.slice(bounds[o], bounds[o + 1] - bounds[o]) for o in range(num_shards)]
    return parts if num_shards > 1 else parts[0]


@ray.remote
class _PagerankShard:
    """One shard of the static PageRank state: the distinct out-edges of
    every node whose bucket this shard owns, plus the shard's node set.

    The static edge table is routed here ONCE; after :meth:`build` it
    never moves again. Per iteration only the (node, contribution)
    stream crosses shards — the fix for the unioned variant's
    per-iteration re-sort of the edge table. All arithmetic is the same
    exact fixed-point int64 rule, so results are bit-identical to
    :func:`pagerank_unioned` and to the unrolled-CTE SQL oracle.
    """

    def __init__(self, num_shards: int):
        self.A = num_shards
        self._parts: list[pa.Table] = []

    def add_static(self, tbl: pa.Table) -> None:
        if tbl.num_rows:
            self._parts.append(tbl)

    def build(self, nb: int) -> int:
        """Dedupe edges, count outdegrees, freeze per-owner edge layout.
        Returns the shard-local node count (summed on the driver for N).
        """
        if self._parts:
            t = pa.concat_tables(self._parts)
            kind = t["kind"].to_numpy(zero_copy_only=False)
            e_sel = kind == 0
            s = t["key"].to_numpy(zero_copy_only=False)[e_sel].astype(np.int64)
            d = t["dst"].to_numpy(zero_copy_only=False)[e_sel].astype(np.int64)
            v = np.unique(t["key"].to_numpy(zero_copy_only=False)[~e_sel]).astype(np.int64)
        else:
            s = d = np.empty(0, np.int64)
            v = np.empty(0, np.int64)
        self._parts = []
        # distinct directed edges (multi-edges collapse, self-loops stay)
        if len(s):
            order = np.lexsort((d, s))
            s, d = s[order], d[order]
            keep = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
            s, d = s[keep], d[keep]
            # outdegree per source over the distinct edges (every edge of
            # a source lives in this shard — routing keys on hash(src))
            starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
            counts = np.diff(np.r_[starts, len(s)])
            deg = np.repeat(counts, counts)
        else:
            deg = np.empty(0, np.int64)
        self.v = v
        # freeze the per-owner layout: reorder edges by the owner of
        # their destination so each iteration's outbox is a pure slice
        owner = (
            hash_bucket(d, nb).to_numpy(zero_copy_only=False) % self.A
            if len(d)
            else np.empty(0, np.int64)
        )
        order = np.argsort(owner, kind="stable")
        self.dst = d[order]
        self.deg = deg[order].astype(np.int64)
        self.src_pos = np.searchsorted(v, s[order])
        self.bounds = np.searchsorted(owner[order], np.arange(self.A + 1))
        return int(len(v))

    def _outbox(self, c_edge: np.ndarray):
        outs = [
            pa.table(
                {
                    "key": pa.array(self.dst[self.bounds[o]:self.bounds[o + 1]]),
                    "c": pa.array(c_edge[self.bounds[o]:self.bounds[o + 1]]),
                }
            )
            for o in range(self.A)
        ]
        return outs if self.A > 1 else outs[0]

    def contrib0(self, s0: int):
        return self._outbox(s0 // self.deg if len(self.deg) else self.deg)

    def step(self, last: bool, base: int, *inboxes: pa.Table):
        nv = len(self.v)
        tot = np.zeros(nv, np.int64)
        if inboxes:
            keys = np.concatenate(
                [t["key"].to_numpy(zero_copy_only=False) for t in inboxes]
            )
            cs = np.concatenate(
                [t["c"].to_numpy(zero_copy_only=False) for t in inboxes]
            )
            if len(keys):
                pos = np.searchsorted(self.v, keys)
                order = np.argsort(pos, kind="stable")
                ps, csv = pos[order], cs[order]
                starts = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]])
                # int64 reduceat is exact — summation order can't drift
                tot[ps[starts]] = np.add.reduceat(csv, starts)
        score = base + 85 * tot // 100
        if last:
            return pa.table(
                {"node": pa.array(self.v), "score": pa.array(score)}
            )
        return self._outbox(
            score[self.src_pos] // self.deg if len(self.deg) else self.deg
        )


def pagerank(
    edges_ds,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int | None = None,
    num_shards: int | None = None,
):
    """(node:int64, score:int64) after ``iterations`` rounds — the
    actor-sharded default.

    The static state (distinct edges + outdegree at hash(src), node
    sentinels at hash(v)) is built and routed to shard actors ONCE;
    each iteration moves only the (node, contribution) stream between
    shards as direct plasma objects (the driver forwards ``A²`` object
    REFS per round, never data). Identical fixed-point arithmetic to
    :func:`pagerank_unioned`, hence bit-identical results at any shard
    or bucket count.
    """
    from commons_codec_ray.util import pool_size

    nb = num_buckets or adaptive_buckets()

    def explode_setup(t: pa.Table) -> pa.Table:
        s = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.unique(np.concatenate([s, d]))  # batch-local candidates
        ne, nv = len(s), len(v)
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "_b": hash_bucket(s, nb),
                        "key": pa.array(s),
                        "dst": pa.array(d),
                        "kind": pa.array(np.zeros(ne, np.int8)),
                    }
                ),
                pa.table(
                    {
                        "_b": hash_bucket(v, nb),
                        "key": pa.array(v),
                        "dst": pa.array(np.zeros(nv, np.int64)),
                        "kind": pa.array(np.ones(nv, np.int8)),
                    }
                ),
            ]
        )

    setup_refs = (
        edges_ds.map_batches(explode_setup, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    A = num_shards or pool_size(max(1, len(setup_refs)))
    shards = [
        _PagerankShard.options(scheduling_strategy="SPREAD").remote(A)
        for _ in range(A)
    ]
    try:
        # route every setup block to its owning shards (plasma → actor)
        acks = []
        for blk in setup_refs:
            parts = _pagerank_route.options(num_returns=A).remote(blk, A)
            if A == 1:
                parts = [parts]
            acks.extend(
                shards[o].add_static.remote(parts[o]) for o in range(A)
            )
        ray.get(acks)
        n_nodes = sum(ray.get([w.build.remote(nb) for w in shards]))
        s0 = SCALE // n_nodes
        base = 15 * s0 // 100

        def _fan(refs_or_ref):
            return [refs_or_ref] if A == 1 else refs_or_ref

        outs = [
            _fan(w.contrib0.options(num_returns=A).remote(s0)) for w in shards
        ]
        for k in range(iterations):
            last = k == iterations - 1
            nxt = []
            for o, w in enumerate(shards):
                inbox = [outs[i][o] for i in range(A)]
                if last:
                    nxt.append(w.step.remote(True, base, *inbox))
                else:
                    nxt.append(
                        _fan(
                            w.step.options(num_returns=A).remote(
                                False, base, *inbox
                            )
                        )
                    )
            outs = nxt
        # final refs must be computed before the actors die
        ray.wait(outs, num_returns=len(outs), fetch_local=False)
        return rd.from_arrow_refs(outs)
    finally:
        for w in shards:
            ray.kill(w, no_restart=True)


def _orient_by_exchange(edges, deg_partial, pack_sb, nb):
    """Attach deg(u) then deg(v) via two node-keyed exchanges — the
    degree table stays sharded (never collected, never broadcast).
    Each exchange co-buckets per-batch degree partials with the edge
    rows keyed on that endpoint; the bucket merge sums the partials and
    gathers the degree onto each edge row."""
    from commons_codec_ray.util import hash_bucket

    def deg_rows(t: pa.Table) -> pa.Table:
        d = deg_partial(t)
        n = d["n"].to_numpy(zero_copy_only=False)
        z = np.zeros(len(n), np.int64)
        return pa.table(
            {
                "_nb": hash_bucket(n, nb),
                "n": d["n"],
                "c": d["c"],
                "o": pa.array(z, pa.int64()),
                "w": pa.array(z, pa.int64()),
                "is_deg": pa.array(np.ones(len(n), bool)),
            }
        )

    def edge_by_u(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        z = np.zeros(len(u), np.int64)
        return pa.table(
            {
                "_nb": hash_bucket(u, nb),
                "n": pa.array(u, pa.int64()),
                "c": pa.array(z, pa.int64()),
                "o": pa.array(v, pa.int64()),
                "w": pa.array(z, pa.int64()),
                "is_deg": pa.array(np.zeros(len(u), bool)),
            }
        )

    def attach_du(df: pd.DataFrame) -> pd.DataFrame:
        deg = df.loc[df["is_deg"]].groupby("n")["c"].sum()
        e = df.loc[~df["is_deg"]]
        return pd.DataFrame(
            {
                "u": e["n"].to_numpy(np.int64),
                "v": e["o"].to_numpy(np.int64),
                "du": deg.loc[e["n"]].to_numpy(np.int64),
            }
        )

    with_du = (
        edges.map_batches(deg_rows, batch_format="pyarrow")
        .union(edges.map_batches(edge_by_u, batch_format="pyarrow"))
        .groupby("_nb")
        .map_groups(attach_du, batch_format="pandas")
    )

    def edge_by_v(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_nb": hash_bucket(v, nb),
                "n": pa.array(v, pa.int64()),
                "c": pa.array(np.zeros(len(v), np.int64), pa.int64()),
                "o": t["u"].cast(pa.int64()),
                "w": t["du"].cast(pa.int64()),
                "is_deg": pa.array(np.zeros(len(v), bool)),
            }
        )

    def attach_dv_and_orient(df: pd.DataFrame) -> pa.Table:
        deg = df.loc[df["is_deg"]].groupby("n")["c"].sum()
        e = df.loc[~df["is_deg"]]
        u = e["o"].to_numpy(np.int64)
        v = e["n"].to_numpy(np.int64)
        du = e["w"].to_numpy(np.int64)
        dv = deg.loc[e["n"]].to_numpy(np.int64)
        # total order (deg, id): u first iff du <= dv (u < v by canon)
        u_first = du <= dv
        x = np.where(u_first, u, v)
        y = np.where(u_first, v, u)
        return pack_sb(x, y)

    return (
        edges.map_batches(deg_rows, batch_format="pyarrow")
        .union(with_du.map_batches(edge_by_v, batch_format="pyarrow"))
        .groupby("_nb")
        .map_groups(attach_dv_and_orient, batch_format="pandas")
    )


def _canon_pair_edges(edges_ds, src: str, dst: str, nb: int, op_name: str):
    """Canonical distinct (u < v) edge table via PAIR-keyed bucket
    dedupe — shared by triangle_count and clustering_coeff. Node ids
    must fit 31 bits so a pair packs into one int64 key."""

    def canon(t: pa.Table) -> pa.Table:
        a = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        assert len(u) == 0 or (u.min() >= 0 and v.max() < (1 << 31)), (
            f"{op_name}: node ids must fit 31 bits for pair packing"
        )
        pack = (u << 32) | v
        return pa.table(
            {
                "_pb": hash_bucket(pack, nb),
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    return (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(
            lambda df: df.drop_duplicates(["u", "v"])[["u", "v"]],
            batch_format="pandas",
        )
        .materialize()
    )


def _pair_deg_partial(t: pa.Table) -> pa.Table:
    """Per-batch degree partials over a distinct (u, v) edge table."""
    nodes = np.concatenate(
        [
            t["u"].to_numpy(zero_copy_only=False),
            t["v"].to_numpy(zero_copy_only=False),
        ]
    )
    uniq, cnt = np.unique(nodes, return_counts=True)
    return pa.table(
        {"n": pa.array(uniq, pa.int64()), "c": pa.array(cnt, pa.int64())}
    )


def _wedge_index_pairs(x_sorted: np.ndarray):
    """Fully vectorized wedge generation over a source-sorted oriented
    edge array: returns (lefts, rights) POSITION pairs within each
    equal-x run (position p pairs as LEFT with every later position in
    its run) — the O(sum out_deg²) core shared by triangle_count and
    clustering_coeff."""
    m = len(x_sorted)
    new = np.empty(m, dtype=bool)
    new[0] = True
    new[1:] = x_sorted[1:] != x_sorted[:-1]
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, m))
    run_end = np.repeat(starts + counts, counts)
    reps = run_end - np.arange(m) - 1
    total = int(reps.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    lefts = np.repeat(np.arange(m), reps)
    block_base = np.repeat(np.cumsum(reps) - reps, reps)
    rights = lefts + 1 + (np.arange(total) - block_base)
    return lefts, rights


def triangle_count(edges_ds, src: str = "src", dst: str = "dst",
                   num_buckets: int | None = None,
                   degree_mode: str = "broadcast"):
    """Exact distributed triangle count (engine-added; the classic
    MapReduce shape of Suri & Vassilvitskii's MR-NodeIterator++):

    1. canonicalize (u < v, self-loops dropped) and dedupe multi-edges
       in PAIR-keyed buckets — one exchange;
    2. orient every edge from its (degree, id)-smaller endpoint — the
       total order caps every out-degree at O(√m), which bounds the
       wedge blow-up;
    3. generate wedges (pairs of out-neighbors) per source, vectorized
       (triu indices per source run), and meet them with the edge set
       in PAIR-keyed buckets — membership count = triangles, each
       counted exactly once.

    ``degree_mode="broadcast"`` (default) rides degrees on a ``ray.put``
    broadcast (nodes ≪ edges — the usual graph regime).
    ``degree_mode="exchange"`` never materializes the degree table
    anywhere: deg(u) then deg(v) are attached by two node-keyed
    exchanges (degree partials and edge rows co-bucketed on the node,
    merged per bucket) — the billion-node path where even the node set
    exceeds driver memory.  Both modes produce identical counts (the
    orientation order is a pure function of (deg, id)).  Node ids must
    fit 31 bits so a (u, v) pair packs into one int64 bucket key —
    loudly asserted, not wrapped.

    Returns a one-row table ``(n_edges, n_triangles)``.
    """
    import ray

    from commons_codec_ray.util import adaptive_buckets, hash_bucket

    nb = num_buckets or adaptive_buckets()

    edges = _canon_pair_edges(edges_ds, src, dst, nb, "triangle_count")
    n_edges = edges.count()
    deg_partial = _pair_deg_partial

    def pack_sb(x: np.ndarray, y: np.ndarray) -> pa.Table:
        return pa.table(
            {
                "_sb": hash_bucket(x, nb),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
            }
        )

    if degree_mode == "exchange":
        oriented = _orient_by_exchange(edges, deg_partial, pack_sb, nb)
    else:
        degp = edges.map_batches(deg_partial, batch_format="pyarrow").to_pandas()
        deg = degp.groupby("n")["c"].sum()
        deg_nodes = deg.index.to_numpy(np.int64)
        deg_vals = deg.to_numpy(np.int64)
        dref = ray.put((deg_nodes, deg_vals))

        def orient(t: pa.Table) -> pa.Table:
            nodes_s, degs = ray.get(dref)
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            du = degs[np.searchsorted(nodes_s, u)]
            dv = degs[np.searchsorted(nodes_s, v)]
            # total order (deg, id): u first iff (du, u) < (dv, v); u < v always
            u_first = (du < dv) | (du == dv)
            x = np.where(u_first, u, v)
            y = np.where(u_first, v, u)
            return pack_sb(x, y)

        oriented = edges.map_batches(orient, batch_format="pyarrow")

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["x", "y"], kind="mergesort")
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        lefts, rights = _wedge_index_pairs(x)
        if not len(lefts):
            return pd.DataFrame({"a": [], "b": []}).astype("int64")
        ya, yb = y[lefts], y[rights]
        return pd.DataFrame({"a": np.minimum(ya, yb), "b": np.maximum(ya, yb)})

    def wedge_bucket(df: pd.DataFrame) -> pa.Table:
        pack = (df["a"].to_numpy(np.int64) << 32) | df["b"].to_numpy(np.int64)
        return pa.table(
            {
                "_pb": hash_bucket(pack, nb),
                "p": pa.array(pack, pa.int64()),
                "is_edge": pa.array(np.zeros(len(df), dtype=bool)),
            }
        )

    def edge_rows(t: pa.Table) -> pa.Table:
        pack = (
            t["u"].to_numpy(zero_copy_only=False) << 32
        ) | t["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_pb": hash_bucket(pack, nb),
                "p": pa.array(pack, pa.int64()),
                "is_edge": pa.array(np.ones(t.num_rows, dtype=bool)),
            }
        )

    tagged = (
        oriented.groupby("_sb")
        .map_groups(wedges, batch_format="pandas")
        .map_batches(wedge_bucket, batch_format="pandas")
        .union(edges.map_batches(edge_rows, batch_format="pyarrow"))
    )

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        eset = df.loc[df["is_edge"], "p"]
        w = df.loc[~df["is_edge"], "p"]
        return pd.DataFrame({"tri": [int(w.isin(eset).sum())]})

    tri = (
        tagged.groupby("_pb")
        .map_groups(count_bucket, batch_format="pandas")
        .to_pandas()["tri"]
        .sum()
    )
    return pa.table(
        {
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_triangles": pa.array([int(tri)], pa.int64()),
        }
    )


@ray.remote
class _CCShard:
    """One shard of static connected-components state: the symmetric
    adjacency (CSR) of every node whose hash bucket this shard owns,
    plus the node's current min-reachable label.

    The adjacency is routed here ONCE (same setup path as
    :class:`_PagerankShard`); afterwards only label messages cross
    shards — a *hop* phase (changed labels flow along edges, classic
    delta min-label propagation) alternating with a *pointer-jump*
    phase (label <- label[label], a query/answer pair keyed by the
    label's owner), so rounds ≈ log2(component diameter) instead of
    diameter. Labels are component member ids, hence always resolvable
    at hash(label)'s owner. Compare
    :func:`~commons_codec_ray.stages.dedup.dedup_clusters_distributed`,
    the pure-Dataset variant that re-unions the edge table into a sort
    every round; results are identical (min id per component).
    """

    def __init__(self, num_shards: int, nb: int):
        self.A = num_shards
        self.nb = nb
        self._parts: list[pa.Table] = []

    def add_static(self, tbl: pa.Table) -> None:
        if tbl.num_rows:
            self._parts.append(tbl)

    def build(self) -> int:
        if self._parts:
            t = pa.concat_tables(self._parts)
            k = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
            p = t["peer"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            k = p = np.empty(0, np.int64)
        self._parts = []
        if len(k):
            order = np.lexsort((p, k))
            k, p = k[order], p[order]
            keep = np.r_[True, (k[1:] != k[:-1]) | (p[1:] != p[:-1])]
            k, p = k[keep], p[keep]
            starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
            self.v = k[starts]
            self.counts = np.diff(np.r_[starts, len(k)])
            self.peer = p
            self.p_owner = (
                hash_bucket(p, self.nb).to_numpy(zero_copy_only=False) % self.A
            )
            # local head start: min over own id and direct neighbors
            self.label = np.minimum(self.v, np.minimum.reduceat(p, starts))
        else:
            self.v = np.empty(0, np.int64)
            self.counts = np.empty(0, np.int64)
            self.peer = np.empty(0, np.int64)
            self.p_owner = np.empty(0, np.int64)
            self.label = np.empty(0, np.int64)
        self.changed = np.ones(len(self.v), bool)
        return int(len(self.v))

    def _route(self, keys: np.ndarray, labs: np.ndarray, owners: np.ndarray):
        order = np.argsort(owners, kind="stable")
        keys, labs = keys[order], labs[order]
        bounds = np.searchsorted(owners[order], np.arange(self.A + 1))
        outs = [
            pa.table(
                {
                    "key": pa.array(keys[bounds[o]:bounds[o + 1]]),
                    "lab": pa.array(labs[bounds[o]:bounds[o + 1]]),
                }
            )
            for o in range(self.A)
        ]
        return outs if self.A > 1 else outs[0]

    def hop(self):
        """Emit (peer, label[u]) for every node u whose label changed
        since the last hop, deduped to the min label per peer; a
        message is dropped when label[u] >= peer (then label[peer] <=
        peer <= label[u], it cannot improve)."""
        e_sel = np.repeat(self.changed, self.counts)
        self.changed[:] = False
        peers = self.peer[e_sel]
        labs = np.repeat(self.label, self.counts)[e_sel]
        owners = self.p_owner[e_sel]
        imp = labs < peers
        peers, labs, owners = peers[imp], labs[imp], owners[imp]
        if len(peers):
            order = np.lexsort((labs, peers))
            peers, labs, owners = peers[order], labs[order], owners[order]
            first = np.r_[True, peers[1:] != peers[:-1]]
            peers, labs, owners = peers[first], labs[first], owners[first]
        return self._route(peers, labs, owners)

    def jump_query(self):
        """Emit (u, label[u]) to the shard owning node label[u] for
        every non-root node: the pointer-jump read of label[label[u]]."""
        sel = self.label != self.v
        q, l = self.v[sel], self.label[sel]
        owners = (
            hash_bucket(l, self.nb).to_numpy(zero_copy_only=False) % self.A
            if len(l)
            else np.empty(0, np.int64)
        )
        return self._route(q, l, owners)

    def jump_answer(self, *inboxes: pa.Table):
        """Answer pointer-jump queries: (u, l) -> (u, label[l]) routed
        back to u's owner, dropping non-improving answers."""
        if inboxes:
            q = np.concatenate(
                [t["key"].to_numpy(zero_copy_only=False) for t in inboxes]
            )
            l = np.concatenate(
                [t["lab"].to_numpy(zero_copy_only=False) for t in inboxes]
            )
        else:
            q = l = np.empty(0, np.int64)
        if len(q):
            ans = self.label[np.searchsorted(self.v, l)]
            imp = ans < l
            q, ans = q[imp], ans[imp]
        else:
            ans = l
        owners = (
            hash_bucket(q, self.nb).to_numpy(zero_copy_only=False) % self.A
            if len(q)
            else np.empty(0, np.int64)
        )
        return self._route(q, ans, owners)

    def apply(self, *inboxes: pa.Table) -> int:
        """Fold incoming (node, label) messages with min; returns the
        number of labels that improved (drives driver-side convergence)."""
        if not inboxes:
            return 0
        keys = np.concatenate(
            [t["key"].to_numpy(zero_copy_only=False) for t in inboxes]
        )
        labs = np.concatenate(
            [t["lab"].to_numpy(zero_copy_only=False) for t in inboxes]
        )
        if not len(keys):
            return 0
        pos = np.searchsorted(self.v, keys)
        order = np.argsort(pos, kind="stable")
        ps, ls = pos[order], labs[order]
        starts = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]])
        mn = np.minimum.reduceat(ls, starts)
        idx = ps[starts]
        imp = mn < self.label[idx]
        upd = idx[imp]
        self.label[upd] = mn[imp]
        self.changed[upd] = True
        return int(len(upd))

    def result(self) -> pa.Table:
        return pa.table(
            {"node": pa.array(self.v), "cluster_id": pa.array(self.label)}
        )


def components_sharded(
    pairs_ds,
    id_a: str = "id_a",
    id_b: str = "id_b",
    num_buckets: int | None = None,
    num_shards: int | None = None,
    max_rounds: int = 64,
):
    """(node:int64, cluster_id:int64) = min node id per connected
    component — the actor-sharded variant.

    The symmetric adjacency is bucketed by hash(node) and routed to
    shard actors ONCE; each round exchanges only label messages as
    direct plasma objects (the driver forwards A² refs and two int
    counters per round, never data). A round = one hop phase (delta
    min-label propagation along edges) + one pointer-jump phase
    (label <- label[label]), so rounds ≈ log2(diameter); the loop stops
    at the first round with zero improvements anywhere. Identical
    output to ``dedup_clusters_distributed`` at any shard count.
    """
    from commons_codec_ray.util import pool_size

    nb = num_buckets or adaptive_buckets()

    def explode_setup(t: pa.Table) -> pa.Table:
        a = t[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        k = np.concatenate([a, b])
        p = np.concatenate([b, a])
        return pa.table(
            {"_b": hash_bucket(k, nb), "key": pa.array(k), "peer": pa.array(p)}
        )

    setup_refs = (
        pairs_ds.map_batches(explode_setup, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    A = num_shards or pool_size(max(1, len(setup_refs)))
    shards = [
        _CCShard.options(scheduling_strategy="SPREAD").remote(A, nb)
        for _ in range(A)
    ]
    try:
        acks = []
        for blk in setup_refs:
            parts = _pagerank_route.options(num_returns=A).remote(blk, A)
            if A == 1:
                parts = [parts]
            acks.extend(
                shards[o].add_static.remote(parts[o]) for o in range(A)
            )
        ray.get(acks)
        ray.get([w.build.remote() for w in shards])

        def _fan(refs_or_ref):
            return [refs_or_ref] if A == 1 else refs_or_ref

        for _ in range(max_rounds):
            houts = [
                _fan(w.hop.options(num_returns=A).remote()) for w in shards
            ]
            ch_hop = ray.get(
                [
                    shards[o].apply.remote(*[houts[i][o] for i in range(A)])
                    for o in range(A)
                ]
            )
            qouts = [
                _fan(w.jump_query.options(num_returns=A).remote())
                for w in shards
            ]
            aouts = [
                _fan(
                    shards[o].jump_answer.options(num_returns=A).remote(
                        *[qouts[i][o] for i in range(A)]
                    )
                )
                for o in range(A)
            ]
            ch_jump = ray.get(
                [
                    shards[o].apply.remote(*[aouts[i][o] for i in range(A)])
                    for o in range(A)
                ]
            )
            if sum(ch_hop) + sum(ch_jump) == 0:
                break
        outs = [w.result.remote() for w in shards]
        ray.wait(outs, num_returns=len(outs), fetch_local=False)
        return rd.from_arrow_refs(outs)
    finally:
        for w in shards:
            ray.kill(w, no_restart=True)


def _sym_edges(edges_ds, src: str, dst: str, op_name: str = "graph op"):
    """Canonical symmetric simple-graph edge table (u, v) + (v, u):
    self-loops dropped, multi-edges collapsed via a packed-int64 dedupe
    exchange with COARSE hash buckets (same packed edge → same bucket,
    so per-bucket ``np.unique`` is globally exact — one vectorized UDF
    call per bucket, not one per distinct edge). Node ids must lie in
    [0, 2^32): the pack is done in unsigned space (an id at 2^31 would
    wrap the int64 sign bit under a signed shift)."""

    def canon(t: pa.Table) -> pa.Table:
        a = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        if len(u) and (int(u.min()) < 0 or int(v.max()) >= 1 << 32):
            raise ValueError(
                f"{op_name} packs (u, v) into one int64: node ids must be "
                "in [0, 2**32); use the sharded variants for full-int64 ids"
            )
        packed = (u.astype(np.uint64) << np.uint64(32)) | v.astype(np.uint64)
        packed = packed.view(np.int64)
        return pa.table(
            {
                "_db": hash_bucket(packed, adaptive_buckets()),
                "_uv": pa.array(packed, pa.int64()),
            }
        )

    def uniq(t: pa.Table) -> pa.Table:
        uv = np.unique(
            t["_uv"].to_numpy(zero_copy_only=False).astype(np.int64)
        ).view(np.uint64)
        u = (uv >> np.uint64(32)).astype(np.int64)
        v = (uv & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(np.concatenate([u, v]), pa.int64()),
                "v": pa.array(np.concatenate([v, u]), pa.int64()),
            }
        )

    return (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby("_db")
        .map_groups(uniq, batch_format="pyarrow")
        .materialize()
    )


def kcore(edges_ds, k: int = 3, max_rounds: int = 64, src: str = "src", dst: str = "dst"):
    """k-core decomposition by simultaneous peeling (the classic
    Matula–Beck coreness peel, distributed as in Montresor et al.'s
    message-passing formulation): repeatedly delete EVERY node whose
    current degree is < k, until fixpoint; returns the (unique,
    maximal) k-core as ``(node, deg)`` with each survivor's in-core
    degree.

    Semantics: undirected simple graph — multi-edges collapse,
    self-loops drop. Each peel round is TWO node-keyed exchanges over
    the symmetric edge table (attach deg(u), then deg(v) — both
    degrees must come from the SAME pre-round snapshot for the peel to
    be simultaneous, which is what makes the result order- and
    layout-invariant) plus a vectorized filter; rounds stop early when
    the edge count reaches fixpoint. Peel depth is data-dependent
    (worst case O(n) on a path with k=2); at 100 TB scale the
    escalation path is the actor-sharded message engine (`_CCShard` /
    `_PagerankShard` pattern) where the adjacency is routed once and
    only degree deltas move per round.

    An unrolled-CTE SQL oracle replays the same rounds exactly
    (degree = COUNT(*) per node over the symmetric table, join-filter
    both endpoints, repeat); any rounds past fixpoint are no-ops on
    both sides, so a fixed unroll ≥ the actual peel depth matches the
    early-stopped engine bit-for-bit.
    """

    sym = _sym_edges(edges_ds, src, dst, op_name="kcore")

    def attach(col: str, out: str):
        def body(g: pa.Table) -> pa.Table:
            return g.append_column(
                out, pa.array(np.full(g.num_rows, g.num_rows, np.int64))
            )

        return body

    n_prev = sym.count()
    converged = n_prev == 0
    for _ in range(max_rounds):
        if n_prev == 0:
            break
        peeled = (
            sym.groupby("u")
            .map_groups(attach("u", "du"), batch_format="pyarrow")
            .groupby("v")
            .map_groups(attach("v", "dv"), batch_format="pyarrow")
        )

        def keep_core(t: pa.Table, _k=k) -> pa.Table:
            du = t["du"].to_numpy(zero_copy_only=False)
            dv = t["dv"].to_numpy(zero_copy_only=False)
            m = (du >= _k) & (dv >= _k)
            return t.select(["u", "v"]).filter(pa.array(m))

        sym = peeled.map_batches(keep_core, batch_format="pyarrow").materialize()
        n = sym.count()
        if n == n_prev:
            converged = True
            break
        n_prev = n
    if not converged and n_prev != 0:
        # returning the intermediate edge set would be a silently wrong
        # "core" (it still contains sub-k-degree nodes)
        raise RuntimeError(
            f"kcore did not reach fixpoint within max_rounds={max_rounds}; "
            "raise max_rounds (peel depth is data-dependent, worst case "
            "O(n) on a path) or use kcore_sharded"
        )

    if n_prev == 0:  # empty core: keep the (node, deg) schema stable
        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
            )
        )

    def final_deg(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array([g["u"][0].as_py()], pa.int64()),
                "deg": pa.array([g.num_rows], pa.int64()),
            }
        )

    return sym.groupby("u").map_groups(final_deg, batch_format="pyarrow")


@ray.remote(num_cpus=0.5)
class _KCoreShard:
    """One shard of static k-core state: the deduped symmetric
    adjacency (CSR) of every node whose hash bucket this shard owns,
    plus each owned node's current alive-degree.

    The adjacency is routed here ONCE (same setup path as
    :class:`_CCShard`); afterwards the only cross-shard traffic is
    death notices — when node u is peeled, one (peer) message per
    incident edge tells the peer's owner to decrement. Every edge
    crosses shards at most once over the WHOLE run (when its first
    endpoint dies), so total message volume is ≤ 2|E| regardless of
    peel depth — vs the Dataset variant's two full-edge-table
    exchanges per round. Simultaneous-peel semantics are preserved
    because decrements emitted in round r are applied before round
    r+1's death check, exactly the Dataset variant's "degree from the
    pre-round snapshot" rule.
    """

    def __init__(self, num_shards: int, nb: int, k: int):
        self.A = num_shards
        self.nb = nb
        self.k = k
        self._parts: list[pa.Table] = []

    def add_static(self, tbl: pa.Table) -> None:
        if tbl.num_rows:
            self._parts.append(tbl)

    def build(self) -> int:
        if self._parts:
            t = pa.concat_tables(self._parts)
            k = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
            p = t["peer"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            k = p = np.empty(0, np.int64)
        self._parts = []
        if len(k):
            order = np.lexsort((p, k))
            k, p = k[order], p[order]
            keep = np.r_[True, (k[1:] != k[:-1]) | (p[1:] != p[:-1])]
            k, p = k[keep], p[keep]
            starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
            self.v = k[starts]
            self.counts = np.diff(np.r_[starts, len(k)])
            self.starts = np.r_[starts, len(k)]
            self.peer = p
            self.p_owner = (
                hash_bucket(p, self.nb).to_numpy(zero_copy_only=False) % self.A
            )
        else:
            self.v = np.empty(0, np.int64)
            self.counts = np.empty(0, np.int64)
            self.starts = np.zeros(1, np.int64)
            self.peer = np.empty(0, np.int64)
            self.p_owner = np.empty(0, np.int64)
        self.deg = self.counts.copy()
        self.alive = np.ones(len(self.v), bool)
        return int(len(self.v))

    def peel(self):
        """Mark every alive node with deg < k dead; emit one (peer)
        death notice per incident edge, routed to the peer's owner.
        Returns A message tables + the local death count."""
        dead = self.alive & (self.deg < self.k)
        self.alive[dead] = False
        e_sel = np.repeat(dead, self.counts)
        peers = self.peer[e_sel]
        owners = self.p_owner[e_sel]
        order = np.argsort(owners, kind="stable")
        peers = peers[order]
        bounds = np.searchsorted(owners[order], np.arange(self.A + 1))
        outs = [
            pa.table({"key": pa.array(peers[bounds[o]:bounds[o + 1]])})
            for o in range(self.A)
        ]
        return (*outs, int(dead.sum()))

    def decrement(self, *inboxes: pa.Table) -> None:
        """Apply death notices: each occurrence of an owned node means
        one of its neighbors died this round."""
        if not len(self.v):
            return
        keys = [t["key"].to_numpy(zero_copy_only=False) for t in inboxes if t.num_rows]
        if not keys:
            return
        keys = np.concatenate(keys)
        pos = np.searchsorted(self.v, keys)
        np.subtract.at(self.deg, pos, 1)

    def result(self) -> pa.Table:
        sel = self.alive
        return pa.table(
            {
                "node": pa.array(self.v[sel], pa.int64()),
                "deg": pa.array(self.deg[sel], pa.int64()),
            }
        )


def kcore_sharded(
    edges_ds,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int | None = None,
    num_shards: int | None = None,
    max_rounds: int = 64,
):
    """k-core decomposition, actor-sharded — the 100 TB shape of
    :func:`kcore`: the deduped symmetric adjacency is hash-routed to
    shard actors ONCE; each peel round moves only death notices (one
    message per edge incident to a just-peeled node, so ≤ 2|E| message
    bytes over the entire run), while the Dataset variant re-exchanges
    the full edge table twice per round. Identical (node, deg) output
    at any shard count; rounds = peel depth, same early stop.
    """
    from commons_codec_ray.util import pool_size

    nb = num_buckets or adaptive_buckets()

    def explode_setup(t: pa.Table) -> pa.Table:
        a = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        kk = np.concatenate([a, b])
        p = np.concatenate([b, a])
        return pa.table(
            {"_b": hash_bucket(kk, nb), "key": pa.array(kk), "peer": pa.array(p)}
        )

    setup_refs = (
        edges_ds.map_batches(explode_setup, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    A = num_shards or pool_size(max(1, len(setup_refs)))
    shards = [
        _KCoreShard.options(scheduling_strategy="SPREAD").remote(A, nb, k)
        for _ in range(A)
    ]
    try:
        acks = []
        for blk in setup_refs:
            parts = _pagerank_route.options(num_returns=A).remote(blk, A)
            if A == 1:
                parts = [parts]
            acks.extend(
                shards[o].add_static.remote(parts[o]) for o in range(A)
            )
        ray.get(acks)
        ray.get([w.build.remote() for w in shards])

        converged = False
        for _ in range(max_rounds):
            # peel returns A message tables + the local death count
            pouts = [w.peel.options(num_returns=A + 1).remote() for w in shards]
            n_dead = sum(ray.get([p[A] for p in pouts]))
            if n_dead == 0:
                converged = True
                break
            ray.get(
                [
                    shards[o].decrement.remote(*[pouts[i][o] for i in range(A)])
                    for o in range(A)
                ]
            )
        if not converged:
            # same contract as kcore: an intermediate state still contains
            # sub-k-degree nodes — raising beats a silently wrong "core"
            raise RuntimeError(
                f"kcore_sharded did not reach fixpoint within "
                f"max_rounds={max_rounds}; raise max_rounds (peel depth is "
                "data-dependent, worst case O(n) on a path)"
            )
        outs = [w.result.remote() for w in shards]
        ray.wait(outs, num_returns=len(outs), fetch_local=False)
        ds = rd.from_arrow_refs(outs)
        if ds.count() == 0:  # keep the (node, deg) schema stable
            return rd.from_arrow(
                pa.table(
                    {"node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
                )
            )
        return ds
    finally:
        for w in shards:
            ray.kill(w, no_restart=True)


def densest_subgraph(
    edges_ds, max_rounds: int = 32, src: str = "src", dst: str = "dst"
):
    """Densest-subgraph 2-approximation by iterated average-degree
    peeling — Bahmani, Kumar & Vassilvitskii's published MapReduce
    algorithm (VLDB 2012), ε = 0 variant: each round removes EVERY
    node whose degree is ≤ the current average (the exact integer test
    ``deg·V ≤ 2·E`` — no floats anywhere), records the pre-removal
    (V, E), and the answer is the round whose prefix subgraph maximizes
    density E/V (exact cross-product rational compare; ties → earliest
    round). At least every minimum-degree node is removed each round,
    so the peel always terminates; on real graphs rounds ≈ log V.

    Engine shape per round: two node-keyed exchanges over the current
    symmetric edge table (attach deg(u) then deg(v) — same snapshot
    discipline as :func:`kcore`) plus a kilobyte (V, E) stat partial;
    per-round survivor tables stay materialized in the object store so
    the winning round's node set is read back without re-peeling
    (total retained ≤ the sum of shrinking rounds < 2·|E| rows).
    Returns ``(node, r, v_count, e_count)`` — the winning round's
    nodes with its round index and exact size stats.
    """
    sym = _sym_edges(edges_ds, src, dst, op_name="densest_subgraph")

    def attach_first(g: pa.Table) -> pa.Table:
        flag = np.zeros(g.num_rows, bool)
        flag[0] = True
        return g.append_column(
            "du", pa.array(np.full(g.num_rows, g.num_rows, np.int64))
        ).append_column("first_u", pa.array(flag))

    def attach_v(g: pa.Table) -> pa.Table:
        return g.append_column(
            "dv", pa.array(np.full(g.num_rows, g.num_rows, np.int64))
        )

    def stat_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": pa.array(
                    [int(t["first_u"].to_numpy(zero_copy_only=False).sum())]
                ),
                "e2": pa.array([t.num_rows]),
            }
        )

    stats: list[tuple[int, int, int]] = []
    rounds: list = []  # per-round NODE tables only (V rows each — the
    # full deg-attached edge tables would hold ~2|E| rows per round in
    # the object store for the whole call; the winner readback needs
    # just the node set)
    for r in range(max_rounds + 1):
        if sym.count() == 0:
            break
        t1 = sym.groupby("u").map_groups(attach_first, batch_format="pyarrow")
        t1 = t1.materialize()
        parts = t1.map_batches(stat_partial, batch_format="pyarrow").take_all()
        V = sum(int(p["v"]) for p in parts)
        E2 = sum(int(p["e2"]) for p in parts)
        stats.append((r, V, E2 // 2))
        rounds.append(
            t1.map_batches(
                lambda t: t.filter(t["first_u"]).select(["u"]),
                batch_format="pyarrow",
            ).materialize()
        )

        def keep_dense(t: pa.Table, _V=V, _E2=E2) -> pa.Table:
            du = t["du"].to_numpy(zero_copy_only=False)
            dv = t["dv"].to_numpy(zero_copy_only=False)
            m = (du * _V > _E2) & (dv * _V > _E2)
            return t.select(["u", "v"]).filter(pa.array(m))

        sym = (
            t1.groupby("v")
            .map_groups(attach_v, batch_format="pyarrow")
            .map_batches(keep_dense, batch_format="pyarrow")
            .materialize()
        )
    else:
        raise RuntimeError(
            f"densest_subgraph did not terminate within max_rounds="
            f"{max_rounds} (every round removes at least the min-degree "
            "nodes, so this indicates max_rounds set below log-depth)"
        )

    if not stats:  # empty graph
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "r": pa.array([], pa.int64()),
                    "v_count": pa.array([], pa.int64()),
                    "e_count": pa.array([], pa.int64()),
                }
            )
        )

    # exact rational argmax of E/V: a beats b iff E_a·V_b > E_b·V_a
    best_r, best_v, best_e = stats[0]
    for r, V, E in stats[1:]:
        if E * best_v > best_e * V:
            best_r, best_v, best_e = r, V, E

    def winner_nodes(t: pa.Table, _r=best_r, _v=best_v, _e=best_e) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "node": t["u"].cast(pa.int64()),
                "r": pa.array(np.full(n, _r, np.int64)),
                "v_count": pa.array(np.full(n, _v, np.int64)),
                "e_count": pa.array(np.full(n, _e, np.int64)),
            }
        )

    return rounds[best_r].map_batches(winner_nodes, batch_format="pyarrow")


def clustering_coeff(edges_ds, src: str = "src", dst: str = "dst",
                     num_buckets: int | None = None):
    """Per-node triangle counts and LOCAL clustering coefficient —
    the node-resolved variant of :func:`triangle_count` (same
    Suri–Vassilvitskii oriented-wedge shape, but every wedge row
    carries its CENTER so a closed wedge credits all three corners):

    cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), emitted as the exact
    integer ``cc_ppm = 2_000_000·tri // (deg·(deg−1))`` (0 when
    deg < 2) so the SQL oracle matches bit-for-bit.

    Scale shape: one pair-keyed dedupe exchange, one oriented wedge
    generation (out-degrees capped at O(√m) by the (deg, id) order),
    one pair-keyed meet; degrees and the final per-node reduction ride
    the driver under the same nodes ≪ edges assumption as
    triangle_count's broadcast mode (the `_orient_by_exchange`
    machinery is the escalation path). Returns
    ``(node, deg, triangles, cc_ppm)`` for every node with an edge.
    """
    import ray

    from commons_codec_ray.util import adaptive_buckets, hash_bucket

    nb = num_buckets or adaptive_buckets()

    edges = _canon_pair_edges(edges_ds, src, dst, nb, "clustering_coeff")

    degp = edges.map_batches(_pair_deg_partial, batch_format="pyarrow").to_pandas()
    deg = degp.groupby("n")["c"].sum()
    deg_nodes = deg.index.to_numpy(np.int64)
    deg_vals = deg.to_numpy(np.int64)
    dref = ray.put((deg_nodes, deg_vals))

    def orient(t: pa.Table) -> pa.Table:
        nodes_s, degs = ray.get(dref)
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        du = degs[np.searchsorted(nodes_s, u)]
        dv = degs[np.searchsorted(nodes_s, v)]
        u_first = (du < dv) | (du == dv)
        x = np.where(u_first, u, v)
        y = np.where(u_first, v, u)
        return pa.table(
            {
                "_sb": hash_bucket(x, nb),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
            }
        )

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["x", "y"], kind="mergesort")
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        lefts, rights = _wedge_index_pairs(x)
        if not len(lefts):
            return pd.DataFrame(
                {"a": [], "b": [], "center": []}
            ).astype("int64")
        ya, yb = y[lefts], y[rights]
        return pd.DataFrame(
            {
                "a": np.minimum(ya, yb),
                "b": np.maximum(ya, yb),
                "center": x[lefts],
            }
        )

    def wedge_rows(df: pd.DataFrame) -> pa.Table:
        pack = (df["a"].to_numpy(np.int64) << 32) | df["b"].to_numpy(np.int64)
        return pa.table(
            {
                "_pb": hash_bucket(pack, nb),
                "p": pa.array(pack, pa.int64()),
                "center": pa.array(df["center"].to_numpy(np.int64), pa.int64()),
                "is_edge": pa.array(np.zeros(len(df), dtype=bool)),
            }
        )

    def edge_rows(t: pa.Table) -> pa.Table:
        pack = (
            t["u"].to_numpy(zero_copy_only=False) << 32
        ) | t["v"].to_numpy(zero_copy_only=False)
        n = len(pack)
        return pa.table(
            {
                "_pb": hash_bucket(pack, nb),
                "p": pa.array(pack, pa.int64()),
                "center": pa.array(np.full(n, -1, np.int64)),
                "is_edge": pa.array(np.ones(n, dtype=bool)),
            }
        )

    def meet(df: pd.DataFrame) -> pd.DataFrame:
        closed = df.loc[df["is_edge"], "p"]
        w = df[~df["is_edge"]]
        hit = w[w["p"].isin(closed)]
        if not len(hit):
            return pd.DataFrame({"node": [], "t": []}).astype("int64")
        p = hit["p"].to_numpy(np.int64)
        nodes = np.concatenate(
            [hit["center"].to_numpy(np.int64), p >> 32, p & 0x7FFFFFFF]
        )
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": uniq, "t": cnt.astype(np.int64)})

    oriented = edges.map_batches(orient, batch_format="pyarrow")
    tri_parts = (
        oriented.groupby("_sb")
        .map_groups(wedges, batch_format="pandas")
        .map_batches(wedge_rows, batch_format="pandas")
        .union(edges.map_batches(edge_rows, batch_format="pyarrow"))
        .groupby("_pb")
        .map_groups(meet, batch_format="pandas")
        .to_pandas()
    )
    tri = (
        tri_parts.groupby("node")["t"].sum()
        if len(tri_parts)
        else pd.Series(dtype=np.int64)
    )
    tri_map = tri.to_dict()
    t_arr = np.array([int(tri_map.get(int(n), 0)) for n in deg_nodes], np.int64)
    d = deg_vals
    cc = np.where(d >= 2, (2_000_000 * t_arr) // np.maximum(d * (d - 1), 1), 0)
    return pa.table(
        {
            "node": pa.array(deg_nodes, pa.int64()),
            "deg": pa.array(d, pa.int64()),
            "triangles": pa.array(t_arr, pa.int64()),
            "cc_ppm": pa.array(cc.astype(np.int64), pa.int64()),
        }
    )


RA_SCALE = 1_000_000_000  # fixed-point scale for resource-allocation scores


def link_prediction(edges_ds, src: str = "src", dst: str = "dst",
                    top_k: int = 50, num_buckets: int | None = None,
                    score: str = "jaccard"):
    """Top-k link prediction by common-neighbor count + an exact
    integer overlap score (engine-added; the classic
    neighborhood-overlap predictors of Liben-Nowell & Kleinberg 2003)
    — all-integer, so bit-identical at any cluster size and
    SQL-replayable:

    1. canonicalize + dedupe edges in PAIR-keyed buckets (one exchange,
       shared ``_canon_pair_edges``);
    2. degrees via per-batch partials, broadcast once with ``ray.put``
       (nodes ≪ edges — same regime note as ``triangle_count``);
    3. wedge generation over the SYMMETRIC adjacency (center = every
       node, pairs of its neighbors): each common neighbor c of (a, b)
       contributes exactly one wedge centered at c, so the per-pair
       wedge count IS CN(a, b).  Unlike triangle counting, orientation
       must NOT be applied here — an oriented wedge set would undercount
       CN.  Cost is O(Σ deg²) wedges, inherent to exact all-pairs CN;
       at hub-heavy scale callers cap candidate degree upstream.
    4. wedges meet the edge set in PAIR-keyed buckets; pairs that ARE
       edges are dropped (we predict absent links), survivors get
       ``cn`` and the requested score;
    5. per-bucket top-k, then one driver-side merge of ``buckets × k``
       kilobyte partials — exact, since every global winner is in its
       bucket's top-k.

    ``score="jaccard"`` (default) ranks by
    ``jaccard_ppm = (10^6·cn) // (deg(a)+deg(b)-cn)``.
    ``score="resource_allocation"`` ranks by the RA index of Zhou, Lü
    & Zhang 2009 — each common neighbor c contributes ``1/deg(c)``,
    here the exact integer ``RA_SCALE // deg(c)`` attached to the
    wedge AT GENERATION (the center is gone after packing), summed
    per pair — the hub-discounting predictor that beats plain CN on
    skewed graphs.

    Returns ``(a, b, cn, <score_col>)`` where ``<score_col>`` is
    ``jaccard_ppm`` or ``ra``, ordered by (score DESC, cn DESC, a, b),
    at most ``top_k`` rows.
    """
    from commons_codec_ray.util import adaptive_buckets, hash_bucket

    if score not in ("jaccard", "resource_allocation"):
        raise ValueError(f"unknown link-prediction score: {score!r}")
    scol = "jaccard_ppm" if score == "jaccard" else "ra"
    order = [scol, "cn", "a", "b"]
    asc = [False, False, True, True]
    nb = num_buckets or adaptive_buckets()

    edges = _canon_pair_edges(edges_ds, src, dst, nb, "link_prediction")

    degp = edges.map_batches(_pair_deg_partial, batch_format="pyarrow").to_pandas()
    deg = degp.groupby("n")["c"].sum()
    dref = ray.put((deg.index.to_numpy(np.int64), deg.to_numpy(np.int64)))

    def sym_rows(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        x = np.concatenate([u, v])  # center
        y = np.concatenate([v, u])  # neighbor
        return pa.table(
            {
                "_sb": hash_bucket(x, nb),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
            }
        )

    ra_mode = score == "resource_allocation"

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["x", "y"], kind="mergesort")
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        lefts, rights = _wedge_index_pairs(x)
        if not len(lefts):
            cols = {"a": [], "b": []} | ({"w": []} if ra_mode else {})
            return pd.DataFrame(cols).astype("int64")
        # y is sorted within each x-run, so y[lefts] < y[rights] always
        out = pd.DataFrame({"a": y[lefts], "b": y[rights]})
        if ra_mode:
            # RA weight rides the wedge: the center is gone after packing
            nodes_s, degs = ray.get(dref)
            cw = RA_SCALE // degs[np.searchsorted(nodes_s, x)]
            out["w"] = cw[lefts]
        return out

    def wedge_rows(df: pd.DataFrame) -> pa.Table:
        pack = (df["a"].to_numpy(np.int64) << 32) | df["b"].to_numpy(np.int64)
        cols = {
            "_pb": hash_bucket(pack, nb),
            "p": pa.array(pack, pa.int64()),
            "is_edge": pa.array(np.zeros(len(df), dtype=bool)),
        }
        if ra_mode:
            cols["w"] = pa.array(df["w"].to_numpy(np.int64), pa.int64())
        return pa.table(cols)

    def edge_rows(t: pa.Table) -> pa.Table:
        pack = (
            t["u"].to_numpy(zero_copy_only=False) << 32
        ) | t["v"].to_numpy(zero_copy_only=False)
        cols = {
            "_pb": hash_bucket(pack, nb),
            "p": pa.array(pack, pa.int64()),
            "is_edge": pa.array(np.ones(len(pack), dtype=bool)),
        }
        if ra_mode:
            cols["w"] = pa.array(np.zeros(len(pack), np.int64), pa.int64())
        return pa.table(cols)

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": [], "b": [], "cn": [], scol: []}
        ).astype("int64")
        closed = df.loc[df["is_edge"], "p"]
        open_w = df.loc[~df["is_edge"]]
        open_w = open_w[~open_w["p"].isin(closed)]  # ABSENT links only
        if not len(open_w):
            return empty
        if ra_mode:
            g = open_w.groupby("p", as_index=False).agg(
                cn=("w", "size"), ra=("w", "sum")  # int64-exact sums
            )
            packs = g["p"].to_numpy(np.int64)
            cn = g["cn"].to_numpy(np.int64)
            sc = g["ra"].to_numpy(np.int64)
            a = packs >> 32
            b = packs & 0x7FFFFFFF
        else:
            packs, cn = np.unique(open_w["p"].to_numpy(np.int64),
                                  return_counts=True)
            a = packs >> 32
            b = packs & 0x7FFFFFFF
            nodes_s, degs = ray.get(dref)
            da = degs[np.searchsorted(nodes_s, a)]
            db = degs[np.searchsorted(nodes_s, b)]
            cn = cn.astype(np.int64)
            sc = (1_000_000 * cn) // (da + db - cn)
        out = pd.DataFrame({"a": a, "b": b, "cn": cn, scol: sc})
        return out.sort_values(order, ascending=asc, kind="mergesort").head(
            top_k
        )

    tops = (
        edges.map_batches(sym_rows, batch_format="pyarrow")
        .groupby("_sb")
        .map_groups(wedges, batch_format="pandas")
        .map_batches(wedge_rows, batch_format="pandas")
        .union(edges.map_batches(edge_rows, batch_format="pyarrow"))
        .groupby("_pb")
        .map_groups(score_bucket, batch_format="pandas")
        .to_pandas()  # buckets × top_k rows — kilobytes
    )
    if not len(tops):  # zero-row to_pandas drops columns — guard the sort
        empty = pa.array([], pa.int64())
        return pa.table({"a": empty, "b": empty, "cn": empty, scol: empty})
    best = tops.sort_values(order, ascending=asc, kind="mergesort").head(top_k)
    return pa.table(
        {
            "a": pa.array(best["a"].to_numpy(np.int64), pa.int64()),
            "b": pa.array(best["b"].to_numpy(np.int64), pa.int64()),
            "cn": pa.array(best["cn"].to_numpy(np.int64), pa.int64()),
            scol: pa.array(best[scol].to_numpy(np.int64), pa.int64()),
        }
    )


def hits(edges_ds, iterations: int = 2, src: str = "src", dst: str = "dst",
         num_buckets: int | None = None):
    """Exact-integer HITS (Kleinberg, JACM 1999): ``iterations`` rounds
    of the alternating power iteration, long-format output —
    ``(node:int64, kind:'auth'|'hub', score:int64)``.

        h_0(u) = 1
        a_k(v) = Σ_{(u,v)∈E} h_{k-1}(u)
        h_k(u) = Σ_{(u,v)∈E} a_k(v)

    over DISTINCT directed edges (multi-edges collapse, self-loops
    allowed); nodes with no in-edges (no out-edges) report authority
    (hub) 0. The textbook per-round L2 normalization only rescales —
    in exact arithmetic the rankings and score *ratios* are unchanged —
    so it is SKIPPED: every score stays an exact int64 and a SQL oracle
    replays the rounds with unrolled CTE joins, bit-for-bit at any
    cluster size. Growth is bounded instead by a guard: scores are
    checked against 2^44 each round (one more round multiplies by at
    most the max degree, so int64 cannot wrap silently); callers with
    hotter graphs lower ``iterations`` or rescale inputs.

    Scale shape: the unioned-exchange Pregel variant
    (:func:`pagerank_unioned`'s shape, alternating key sides). Setup is
    ONE exchange that dedupes edges and node sentinels into TWO keyed
    copies — hash(src) buckets ``[0, nb)`` for the hub phase, hash(dst)
    buckets ``[nb, 2nb)`` for the authority phase (disjoint bucket-id
    namespaces, so a single groupby routes both). Each half-iteration
    is then one ``union + groupby`` exchange in which the sums AND the
    next phase's per-edge contributions are emitted in the same group
    pass. Because HITS alternates key sides every half-round, the
    static edge copies do ride each exchange (the documented cost of
    the zero-actor variant; the actor-sharded fix is the same
    :class:`_PagerankShard` machinery with both copies pinned — edges
    move at setup only — left as the >billion-edge path).
    """
    nb = num_buckets or adaptive_buckets()
    kinds = {"edge": np.int8(0), "sentinel": np.int8(1), "contrib": np.int8(2),
             "score": np.int8(3)}

    def explode_setup(t: pa.Table) -> pa.Table:
        s = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.unique(np.concatenate([s, d]))  # batch-local node candidates
        ne, nv = len(s), len(v)
        b_src = hash_bucket(s, nb).to_numpy(zero_copy_only=False)
        b_dst = hash_bucket(d, nb).to_numpy(zero_copy_only=False) + nb
        b_v0 = hash_bucket(v, nb).to_numpy(zero_copy_only=False)
        zero_e = np.zeros(ne, np.int64)
        zero_v = np.zeros(nv, np.int64)
        return pa.table(
            {
                "_b": pa.array(np.concatenate([b_src, b_dst, b_v0, b_v0 + nb])),
                "key": pa.array(np.concatenate([s, d, v, v])),
                "other": pa.array(np.concatenate([d, s, zero_v, zero_v])),
                "c": pa.array(np.concatenate([zero_e, zero_e, zero_v, zero_v])),
                "kind": pa.array(
                    np.concatenate(
                        [
                            np.zeros(2 * ne, np.int8),
                            np.ones(2 * nv, np.int8),
                        ]
                    )
                ),
            }
        )

    def setup_group(g: pd.DataFrame) -> pa.Table:
        e = g[g["kind"] == kinds["edge"]].drop_duplicates(["key", "other"])
        v = np.unique(g.loc[g["kind"] == kinds["sentinel"], "key"].to_numpy(np.int64))
        bucket = np.int64(g["_b"].iloc[0])
        ne, nv = len(e), len(v)
        return pa.table(
            {
                "_b": pa.array(np.full(ne + nv, bucket)),
                "key": pa.array(
                    np.concatenate([e["key"].to_numpy(np.int64), v])
                ),
                "other": pa.array(
                    np.concatenate([e["other"].to_numpy(np.int64), np.zeros(nv, np.int64)])
                ),
                "c": pa.array(np.zeros(ne + nv, np.int64)),
                "kind": pa.array(
                    np.concatenate([np.zeros(ne, np.int8), np.ones(nv, np.int8)])
                ),
            }
        )

    static = (
        edges_ds.map_batches(explode_setup, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(setup_group, batch_format="pandas")
        .materialize()
    )

    def side(lo: int, hi: int):
        def pick(t: pa.Table) -> pa.Table:
            b = t["_b"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((b >= lo) & (b < hi)))

        return pick

    # round-0 contributions (h0 = 1) fall straight out of the dst-keyed
    # static edges: each distinct edge (u,v) contributes 1 at hash(v)
    def contrib0(t: pa.Table) -> pa.Table:
        b = t["_b"].to_numpy(zero_copy_only=False)
        k = t["kind"].to_numpy(zero_copy_only=False)
        sel = (b >= nb) & (k == kinds["edge"])
        n = int(sel.sum())
        return pa.table(
            {
                "_b": pa.array(b[sel]),
                "key": pa.array(t["key"].to_numpy(zero_copy_only=False)[sel]),
                "other": pa.array(np.zeros(n, np.int64)),
                "c": pa.array(np.ones(n, np.int64)),
                "kind": pa.array(np.full(n, kinds["contrib"], np.int8)),
            }
        )

    _GUARD = np.int64(1) << np.int64(44)

    def _rows(b, key, other, c, kind) -> pa.Table:
        return pa.table(
            {
                "_b": pa.array(np.asarray(b, np.int64)),
                "key": pa.array(np.asarray(key, np.int64)),
                "other": pa.array(np.asarray(other, np.int64)),
                "c": pa.array(np.asarray(c, np.int64)),
                "kind": pa.array(np.asarray(kind, np.int8)),
            }
        )

    def half_step(out_label: str | None, next_lo: int, emit_contribs: bool = True):
        """One half-iteration: sum contribs per key (sentinels keep the
        zero-score nodes), emit next-phase contributions per edge; when
        ``out_label`` is set also emit tagged score rows (kind=3), which
        every later exchange passes through untouched. Returns ARROW
        tables — the output unions with arrow static blocks and Ray's
        sort sampler requires one block type."""

        def step(g: pd.DataFrame) -> pa.Table:
            passthru = g[g["kind"] == kinds["score"]]
            cont = g[g["kind"] == kinds["contrib"]]
            v = np.unique(
                g.loc[g["kind"] == kinds["sentinel"], "key"].to_numpy(np.int64)
            )
            # pre-SUM guard (exact python ints): max contribution × bucket
            # rows bounds every per-key sum, so the int64 groupby below can
            # never wrap silently — the post-sum 2^44 check alone would miss
            # a wrap on a >2^19-degree hub whose addends each passed it
            if len(cont):
                m = int(cont["c"].max())
                if m and m * len(cont) >= (1 << 62):
                    raise OverflowError(
                        "hits(): contribution sum may exceed int64 "
                        "(max contribution x bucket rows >= 2^62); "
                        "lower iterations or rescale"
                    )
            tot = cont.groupby("key")["c"].sum()
            score = pd.Series(np.zeros(len(v), np.int64), index=v)
            score.loc[tot.index] = tot.to_numpy(np.int64)
            if len(score) and int(score.max()) >= int(_GUARD):
                raise OverflowError(
                    "hits(): score exceeded 2^44; lower iterations or rescale"
                )
            outs = [
                _rows(
                    passthru["_b"].to_numpy(np.int64),
                    passthru["key"].to_numpy(np.int64),
                    passthru["other"].to_numpy(np.int64),
                    passthru["c"].to_numpy(np.int64),
                    passthru["kind"].to_numpy(np.int8),
                )
            ]
            e = g[g["kind"] == kinds["edge"]]
            if emit_contribs and len(e):
                u = e["other"].to_numpy(np.int64)  # opposite endpoint
                c = score.loc[e["key"].to_numpy(np.int64)].to_numpy(np.int64)
                outs.append(
                    _rows(
                        hash_bucket(u, nb).to_numpy(zero_copy_only=False) + next_lo,
                        u,
                        np.zeros(len(u), np.int64),
                        c,
                        np.full(len(u), kinds["contrib"], np.int8),
                    )
                )
            if out_label is not None:
                outs.append(
                    _rows(
                        np.full(len(v), -1 if out_label == "auth" else -2, np.int64),
                        score.index.to_numpy(np.int64),
                        np.zeros(len(v), np.int64),
                        score.to_numpy(np.int64),
                        np.full(len(v), kinds["score"], np.int8),
                    )
                )
            return pa.concat_tables(outs)

        return step

    stream = static.map_batches(contrib0, batch_format="pyarrow")
    for k in range(iterations):
        last = k == iterations - 1
        # authority phase: dst-keyed buckets [nb, 2nb)
        stream = (
            static.map_batches(side(nb, 2 * nb), batch_format="pyarrow")
            .union(stream)
            .groupby("_b")
            .map_groups(half_step("auth" if last else None, 0), batch_format="pandas")
        )
        # hub phase: src-keyed buckets [0, nb); the final half-step has
        # no next phase, so it skips the contribution emission
        stream = (
            static.map_batches(side(0, nb), batch_format="pyarrow")
            .union(stream)
            .groupby("_b")
            .map_groups(
                half_step("hub" if last else None, nb, emit_contribs=not last),
                batch_format="pandas",
            )
        )

    def finalize(t: pa.Table) -> pa.Table:
        k = t["kind"].to_numpy(zero_copy_only=False)
        sel = k == kinds["score"]
        b = t["_b"].to_numpy(zero_copy_only=False)[sel]
        return pa.table(
            {
                "node": pa.array(t["key"].to_numpy(zero_copy_only=False)[sel]),
                "kind": pa.array(np.where(b == -1, "auth", "hub")),
                "score": pa.array(t["c"].to_numpy(zero_copy_only=False)[sel]),
            }
        )

    return stream.map_batches(finalize, batch_format="pyarrow")


def bfs_levels(edges_ds, source: int, max_levels: int = 6,
               src: str = "src", dst: str = "dst",
               num_buckets: int | None = None):
    """Single-source BFS levels — ``(node:int64, level:int64)`` for every
    node whose shortest DIRECTED hop distance from ``source`` is
    ≤ ``max_levels`` (the traversal primitive pagerank/components don't
    cover: reachability with exact hop counts, e.g. link-depth crawl
    frontiers or citation-hop cuts).

    The hop count IS the min-plus distance under unit weights, so this
    is a named entry point over :func:`sssp` with ``w = 1`` — one
    adjacency-bucketing setup exchange, one ``union + groupby``
    exchange per level, the per-node best level riding the stream as
    partitioned state rows, and only newly-reached (improved) nodes
    expanding — exactly the level-synchronous frontier. See
    :func:`sssp` for the exchange shape and exactness notes.
    """

    def unit(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                src: t[src],
                dst: t[dst],
                "_w1": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    out = sssp(
        edges_ds.map_batches(unit, batch_format="pyarrow"),
        source=source,
        rounds=max_levels,
        src=src,
        dst=dst,
        weight="_w1",
        num_buckets=num_buckets,
    )
    return out.map_batches(
        lambda t: pa.table({"node": t["node"], "level": t["dist"]}),
        batch_format="pyarrow",
    )


def sssp(edges_ds, source: int, rounds: int = 6,
         src: str = "src", dst: str = "dst", weight: str = "w",
         num_buckets: int | None = None):
    """Single-source shortest paths, ``rounds`` Bellman–Ford
    relaxation rounds — ``(node:int64, dist:int64)`` for every node
    reachable from ``source`` by a path of ≤ ``rounds`` edges, with the
    exact min-plus distance over int64 weights (the WEIGHTED traversal
    member; :func:`bfs_levels` is the hop-count special case).

    Same level-synchronous tagged-union shape as :func:`bfs_levels`:
    one setup exchange buckets the distinct adjacency at hash(src)
    (multi-edges collapse to their MIN weight — the only one a
    shortest path can use), then each round is one ``union + groupby``
    exchange. Per-node best-so-far distances ride the stream as
    partitioned state rows; a round folds incoming relaxation
    candidates into the state and re-relaxes only the IMPROVED nodes —
    bit-identical to the textbook d_k(v) = min(d_{k-1}(v),
    min_{(u,v,w)} d_{k-1}(u)+w) recurrence (an unimproved node's
    relaxations were already folded in an earlier round), which is
    exactly what the oracle's unrolled min-CTEs replay. Exact integer
    arithmetic throughout; weights must be ≥ 0 for the ≤-rounds-edges
    truncation to bound true distances.
    """
    nb = num_buckets or adaptive_buckets()
    KIND_EDGE, KIND_STATE, KIND_CAND = np.int8(0), np.int8(1), np.int8(2)

    def explode(t: pa.Table) -> pa.Table:
        s = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_b": hash_bucket(s, nb),
                "key": pa.array(s),
                "other": pa.array(d),
                "val": pa.array(w),
                "kind": pa.array(np.full(len(s), KIND_EDGE)),
            }
        )

    def dedupe_group(g: pd.DataFrame) -> pa.Table:
        e = g.groupby(["key", "other"], sort=False, as_index=False)["val"].min()
        n = len(e)
        bucket = np.int64(g["_b"].iloc[0])
        return pa.table(
            {
                "_b": pa.array(np.full(n, bucket)),
                "key": pa.array(e["key"].to_numpy(np.int64)),
                "other": pa.array(e["other"].to_numpy(np.int64)),
                "val": pa.array(e["val"].to_numpy(np.int64)),
                "kind": pa.array(np.full(n, KIND_EDGE)),
            }
        )

    static = (
        edges_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(dedupe_group, batch_format="pandas")
        .materialize()
    )

    seed_b = int(hash_bucket(np.array([source], np.int64), nb)[0].as_py())
    seed = rd.from_arrow(
        pa.table(
            {
                "_b": pa.array([seed_b], pa.int64()),
                "key": pa.array([int(source)], pa.int64()),
                "other": pa.array([0], pa.int64()),
                "val": pa.array([0], pa.int64()),
                "kind": pa.array([KIND_CAND], pa.int8()),
            }
        )
    )

    def step(last: bool):
        def go(g: pd.DataFrame) -> pa.Table:
            state = g[g["kind"] == KIND_STATE]
            cand = g[g["kind"] == KIND_CAND]
            bucket = np.int64(g["_b"].iloc[0])
            old = pd.Series(
                state["val"].to_numpy(np.int64),
                index=state["key"].to_numpy(np.int64),
            )
            cbest = cand.groupby("key")["val"].min()
            best = pd.concat([old, cbest]).groupby(level=0).min()
            nodes = best.index.to_numpy(np.int64)
            dist = best.to_numpy(np.int64)
            # improved = nodes whose best dropped below their old state
            # (or that had no state at all). Pure-int64 alignment: a
            # pandas reindex would NaN-promote to float64 and lose
            # exactness above 2^53
            imp_mask = np.ones(len(nodes), dtype=bool)
            if len(old):
                oi = old.index.to_numpy(np.int64)
                ov = old.to_numpy(np.int64)
                srt = np.argsort(oi, kind="stable")
                oi, ov = oi[srt], ov[srt]
                pos = np.minimum(np.searchsorted(oi, nodes), len(oi) - 1)
                has = oi[pos] == nodes
                imp_mask = ~has | (dist < ov[pos])
            outs = [
                pa.table(
                    {
                        "_b": pa.array(np.full(len(nodes), bucket)),
                        "key": pa.array(nodes),
                        "other": pa.array(np.zeros(len(nodes), np.int64)),
                        "val": pa.array(dist),
                        "kind": pa.array(np.full(len(nodes), KIND_STATE)),
                    }
                )
            ]
            if not last and imp_mask.any():
                imp_nodes = nodes[imp_mask]
                imp_dist = pd.Series(dist[imp_mask], index=imp_nodes)
                e = g[g["kind"] == KIND_EDGE]
                sel = e[np.isin(e["key"].to_numpy(np.int64), imp_nodes)]
                if len(sel):
                    u = sel["key"].to_numpy(np.int64)
                    nxt = sel["other"].to_numpy(np.int64)
                    relax = imp_dist.loc[u].to_numpy(np.int64) + sel["val"].to_numpy(np.int64)
                    outs.append(
                        pa.table(
                            {
                                "_b": hash_bucket(nxt, nb),
                                "key": pa.array(nxt),
                                "other": pa.array(np.zeros(len(nxt), np.int64)),
                                "val": pa.array(relax),
                                "kind": pa.array(np.full(len(nxt), KIND_CAND)),
                            }
                        )
                    )
            return pa.concat_tables(outs)

        return go

    stream = seed
    for k in range(rounds + 1):
        stream = (
            static.union(stream)
            .groupby("_b")
            .map_groups(step(last=(k == rounds)), batch_format="pandas")
        )

    def finalize(t: pa.Table) -> pa.Table:
        sel = t["kind"].to_numpy(zero_copy_only=False) == KIND_STATE
        return pa.table(
            {
                "node": pa.array(t["key"].to_numpy(zero_copy_only=False)[sel]),
                "dist": pa.array(t["val"].to_numpy(zero_copy_only=False)[sel]),
            }
        )

    return stream.map_batches(finalize, batch_format="pyarrow")
