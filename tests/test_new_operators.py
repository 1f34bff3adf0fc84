"""Round-3 operators: per-key top-N capping, exact distributed
quantiles (histogram refinement), exact n-gram Jaccard pairs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def test_top_n_per_key_matches_pandas(ray_session, tmp_path):
    from commons_codec_ray.stages.grouptop import top_n_per_key

    rng = np.random.RandomState(5)
    n = 5000
    tbl = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "key": pa.array(rng.randint(0, 97, n).astype("int64")),
            "score": pa.array(rng.randint(0, 50, n).astype("int64")),  # many ties
        }
    )
    pq.write_table(tbl, tmp_path / "t.parquet")
    ds = rd.read_parquet(str(tmp_path / "t.parquet"))
    got = (
        top_n_per_key(ds, key="key", order_by="score", n=3, tiebreak="id")
        .to_pandas()
        .sort_values(["key", "score", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    df = tbl.to_pandas()
    want = (
        df.sort_values(["key", "score", "id"], ascending=[True, False, True], kind="mergesort")
        .groupby("key")
        .head(3)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["id", "key", "score"]], want[["id", "key", "score"]])


def test_distributed_quantiles_exact_vs_duckdb(ray_session, tmp_path):
    import duckdb

    from commons_codec_ray.stages.quantiles import distributed_quantiles

    rng = np.random.RandomState(11)
    # skewed + heavy duplicates + exact-edge values
    vals = np.concatenate(
        [rng.lognormal(0, 2, 20_000), np.full(5_000, 1.25), rng.uniform(-5, 5, 10_000)]
    )
    tbl = pa.table({"v": pa.array(vals, pa.float64())})
    pq.write_table(tbl, tmp_path / "v.parquet")
    ds = rd.read_parquet(str(tmp_path / "v.parquet"))
    qs = [0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = distributed_quantiles(ds, "v", qs)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{tmp_path}/v.parquet')")
    for q, g in zip(qs, got):
        want = con.execute("SELECT quantile_disc(v, ?) FROM t", [q]).fetchone()[0]
        assert g == want, (q, g, want)  # bit-exact, no interpolation


def test_distributed_quantiles_refinement_path(ray_session, tmp_path):
    """Tiny scan_limit forces multi-round interval narrowing; duplicates
    sitting exactly on bucket edges exercise the inclusivity tracking."""
    import duckdb

    from commons_codec_ray.stages.quantiles import distributed_quantiles

    rng = np.random.RandomState(3)
    vals = np.round(rng.uniform(0, 10, 50_000), 1)  # massive edge-duplication
    tbl = pa.table({"v": pa.array(vals, pa.float64())})
    pq.write_table(tbl, tmp_path / "v.parquet")
    ds = rd.read_parquet(str(tmp_path / "v.parquet"))
    got = distributed_quantiles(ds, "v", [0.5, 0.95], bins=16, scan_limit=500)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{tmp_path}/v.parquet')")
    for q, g in zip([0.5, 0.95], got):
        want = con.execute("SELECT quantile_disc(v, ?) FROM t", [q]).fetchone()[0]
        assert g == want, (q, g, want)


def test_distributed_quantiles_cont_vs_duckdb(ray_session, tmp_path):
    """Interpolated (quantile_cont) path: bit-exact against DuckDB,
    including q=0/1 endpoints and a q whose h lands exactly on an
    integer (no interpolation)."""
    import duckdb

    from commons_codec_ray.stages.quantiles import distributed_quantiles_cont

    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [rng.lognormal(0, 2, 15_000), np.full(3_000, 2.5), rng.uniform(-9, 9, 12_000)]
    )
    tbl = pa.table({"v": pa.array(vals, pa.float64())})
    pq.write_table(tbl, tmp_path / "v.parquet")
    ds = rd.read_parquet(str(tmp_path / "v.parquet"))
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = distributed_quantiles_cont(ds, "v", qs)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{tmp_path}/v.parquet')")
    for q, g in zip(qs, got):
        want = con.execute("SELECT quantile_cont(v, ?) FROM t", [q]).fetchone()[0]
        assert g == want, (q, g, want)


def test_exact_jaccard_pairs_threshold_and_dedupe(ray_session):
    from commons_codec_ray.stages.dedup import exact_jaccard_pairs

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "one two three four five six seven eight",
                    "ONE TWO THREE FOUR FIVE SIX SEVEN EIGHT",  # J=1: all 8 bands match
                    "completely unrelated vocabulary over here instead",
                ]
            ),
        }
    )
    out = exact_jaccard_pairs(rd.from_arrow(docs), threshold=0.7).to_pandas()
    # matched by every band yet emitted exactly once, with exact J=1.0
    assert out[["id_a", "id_b", "jaccard"]].values.tolist() == [[1, 2, 1.0]]


def test_approx_quantiles_by_key_bitexact_and_bounded(ray_session, tmp_path):
    import duckdb

    from commons_codec_ray.stages.quantiles import approx_quantiles_by_key

    rng = np.random.RandomState(23)
    n = 30_000
    keys = rng.randint(0, 40, n).astype("int64")
    vals = rng.lognormal(0, 1.5, n) * (1 + keys)  # per-key scale differences
    # one single-value key (hi == lo path) and one single-row key
    keys = np.concatenate([keys, np.full(10, 100, "int64"), [101]])
    vals = np.concatenate([vals, np.full(10, 7.5), [3.25]])
    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.float64())})
    pq.write_table(tbl, tmp_path / "kv.parquet")
    ds = rd.read_parquet(str(tmp_path / "kv.parquet"), override_num_blocks=8)

    got = (
        approx_quantiles_by_key(ds, "k", "v", qs=[0.5, 0.9], bins=256)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{tmp_path}/kv.parquet')")
    want = con.execute(
        """
        WITH stats AS (SELECT k, min(v) lo, max(v) hi, count(*) n FROM t GROUP BY k),
        b AS (SELECT e.k, CAST(least(255.0, greatest(0.0,
                 floor(((e.v - s.lo) * 256.0) / (s.hi - s.lo)))) AS BIGINT) AS bucket
              FROM t e JOIN stats s USING (k) WHERE s.hi > s.lo),
        counts AS (SELECT k, bucket, count(*) c FROM b GROUP BY k, bucket),
        cum AS (SELECT k, bucket, sum(c) OVER (PARTITION BY k ORDER BY bucket) cum FROM counts),
        pick AS (SELECT c.k,
                   min(CASE WHEN c.cum >= ceil(0.5 * s.n) THEN c.bucket END) b50,
                   min(CASE WHEN c.cum >= ceil(0.9 * s.n) THEN c.bucket END) b90
                 FROM cum c JOIN stats s USING (k) GROUP BY c.k)
        SELECT s.k,
               CASE WHEN s.hi > s.lo THEN s.lo + ((p.b50 + 1) * (s.hi - s.lo)) / 256.0
                    ELSE s.lo END AS p50_est,
               CASE WHEN s.hi > s.lo THEN s.lo + ((p.b90 + 1) * (s.hi - s.lo)) / 256.0
                    ELSE s.lo END AS p90_est
        FROM stats s LEFT JOIN pick p USING (k) ORDER BY s.k
        """
    ).df()
    # bit-exact against the SQL replica of the estimator
    assert got["k"].tolist() == want["k"].tolist()
    assert got["p50_est"].tolist() == want["p50_est"].tolist()
    assert got["p90_est"].tolist() == want["p90_est"].tolist()

    # error bound: |est - exact quantile_disc| <= (hi - lo) / bins per key
    df = tbl.to_pandas()
    for q, cname in ((0.5, "p50_est"), (0.9, "p90_est")):
        for k, g in df.groupby("k"):
            v = np.sort(g["v"].to_numpy())
            exact = v[max(1, int(np.ceil(q * len(v)))) - 1]
            width = (v[-1] - v[0]) / 256.0
            est = got.loc[got["k"] == k, cname].iloc[0]
            assert abs(est - exact) <= width + 1e-12, (k, q, est, exact, width)

    # single-value / single-row keys return the value itself
    assert got.loc[got["k"] == 100, "p50_est"].iloc[0] == 7.5
    assert got.loc[got["k"] == 101, "p90_est"].iloc[0] == 3.25


def test_equi_width_histogram_counts_and_edges(ray_session, tmp_path):
    from commons_codec_ray.stages.quantiles import equi_width_histogram

    rng = np.random.RandomState(41)
    v = np.concatenate([rng.uniform(-3, 7, 9000), [-3.0, 7.0]])  # exact edges
    pq.write_table(pa.table({"v": pa.array(v, pa.float64())}), tmp_path / "h.parquet")
    ds = rd.read_parquet(str(tmp_path / "h.parquet"), override_num_blocks=5)
    got = equi_width_histogram(ds, "v", bins=32).to_pandas()
    lo, hi = v.min(), v.max()
    b = np.minimum(31.0, np.maximum(0.0, np.floor(((v - lo) * 32.0) / (hi - lo))))
    want = np.bincount(b.astype(np.int64), minlength=32)
    assert got["c"].to_numpy().tolist() == want.tolist()
    assert got["c"].sum() == len(v)
    assert got["lo_edge"].iloc[0] == lo and got["hi_edge"].iloc[31] == hi


def test_normalize_text_kernel_edges(ray_session):
    from commons_codec_ray.stages.text import normalize_text

    t = pa.table(
        {"text": pa.array(["  A--B  c!! ", "", "ALREADY clean", "\t\nx\n"])}
    )
    assert normalize_text(t)["norm"].to_pylist() == [
        "a b c",
        "",
        "already clean",
        "x",
    ]


def test_rank_sketch_per_key_exact_when_uncompressed(ray_session):
    from commons_codec_ray.stages.quantiles import rank_sketch_quantiles_per_key

    rng = np.random.RandomState(8)
    keys = rng.randint(0, 30, 2000).astype("int64")
    vals = rng.normal(0, 10, 2000)
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.float64())})
    got = (
        rank_sketch_quantiles_per_key(
            rd.from_arrow(t).repartition(4), "k", "v", qs=[0.5, 0.9], m=512
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"k": keys, "v": vals})
    for q, name in ((0.5, "p50_est"), (0.9, "p90_est")):
        want = df.groupby("k")["v"].apply(
            lambda s, q=q: np.sort(s.to_numpy())[max(1, int(np.ceil(q * len(s)))) - 1]
        )
        assert got[name].tolist() == want.tolist()


def test_rank_sketch_per_key_compressed_rank_bound(ray_session):
    from commons_codec_ray.stages.quantiles import rank_sketch_quantiles_per_key

    rng = np.random.RandomState(15)
    # one heavy key forced through compression: n=20_000 per batch ≫ m=16
    n = 20_000
    vals = rng.lognormal(0, 2, n)
    t = pa.table(
        {"k": pa.array(np.zeros(n, np.int64)), "v": pa.array(vals, pa.float64())}
    )
    B = 4
    got = rank_sketch_quantiles_per_key(
        rd.from_arrow(t).repartition(B), "k", "v", qs=[0.5, 0.9], m=16
    ).to_pandas()
    sv = np.sort(vals)
    for q, name in ((0.5, "p50_est"), (0.9, "p90_est")):
        est = got[name].iloc[0]
        rank = np.searchsorted(sv, est, side="right")
        target = int(np.ceil(q * n))
        # total rank error ≤ Σ_batches ⌈n_b/m⌉ ≈ n·B/(m·B) per batch sum
        bound = B * int(np.ceil(n / B / 16)) + B
        assert abs(rank - target) <= bound, (q, rank, target, bound)


def test_activity_gaps_edge_cases(ray_session, tmp_path):
    from commons_codec_ray.pipelines.queries import q_activity_gaps

    hour = 3_600_000_000  # us
    base = 1_700_000_000_000_000
    rows = [
        # user 1: single event → span 1, no gaps
        (1, base),
        # user 2: hours 0,1,2 → contiguous, no gaps
        (2, base), (2, base + hour), (2, base + 2 * hour),
        # user 3: hours 0 and 5 → 4 silent hours, max run 4
        (3, base), (3, base + 5 * hour),
        # user 4: two events inside ONE hour → 1 active hour
        (4, base), (4, base + 60_000_000),
        # user 5: hours 0, 2, 10 → gaps of 1 and 7
        (5, base), (5, base + 2 * hour), (5, base + 10 * hour),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = (
        q_activity_gaps(str(tmp_path))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    want = {
        1: (1, 0, 0),
        2: (3, 0, 0),
        3: (2, 4, 4),
        4: (1, 0, 0),
        5: (3, 8, 7),
    }
    for u, (act, gap, mx) in want.items():
        r = out.loc[u]
        assert (r["n_active_hours"], r["n_gap_hours"], r["max_gap_hours"]) == (act, gap, mx), u
