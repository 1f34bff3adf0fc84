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
