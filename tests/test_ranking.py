"""Exact distributed global rank (stages/ranking.py): must equal
pandas row_number under ORDER BY (value, tiebreak) for any tie pattern
and any partition count."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from commons_codec_ray.stages.ranking import global_rank


def _check(df, num_partitions):
    ds = rd.from_pandas(df).repartition(5)
    got = (
        global_rank(ds, value="v", tiebreak="id", num_partitions=num_partitions)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = df.sort_values(["v", "id"], kind="mergesort").reset_index(drop=True)
    want["global_rank"] = np.arange(1, len(want) + 1, dtype=np.int64)
    want = want.sort_values("id").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["global_rank"], want["global_rank"], check_names=False
    )


def test_global_rank_random_with_heavy_ties():
    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "id": np.arange(3000, dtype="int64"),
            # quantized values force cross-partition tie runs
            "v": np.round(rng.normal(0, 5, 3000), 0),
        }
    )
    for parts in (1, 4, 64):
        _check(df, parts)


def test_global_rank_sorted_input_skew():
    # pre-sorted input (the lake-order worst case for naive sampling)
    df = pd.DataFrame(
        {"id": np.arange(2000, dtype="int64"), "v": np.arange(2000, dtype="float64")}
    )
    _check(df, 16)


class TestBM25:
    def _corpus(self):
        import pyarrow as pa
        import ray.data as rd

        rows = [
            (1, "apple banana apple cherry"),
            (2, "apple apple apple apple banana banana"),
            (3, "cherry date elderberry fig grape"),
            (4, "banana"),
        ]
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        )

    def test_matches_integer_reference(self, ray_session):
        from commons_codec_ray.stages.ranking import bm25_topk

        out = bm25_topk(self._corpus(), ["apple", "banana"], k=10).to_pandas()
        # single-process replay of the same integer formula
        docs = {1: "apple banana apple cherry",
                2: "apple apple apple apple banana banana",
                3: "cherry date elderberry fig grape",
                4: "banana"}
        N = len(docs)
        A = sum(len(t.split(" ")) for t in docs.values())
        S = 1_000_000
        want = {}
        for term in ("apple", "banana"):
            df = sum(term in t.split(" ") for t in docs.values())
            idf = (2 * N - 2 * df + 1) * S // (2 * df + 1)
            for d, t in docs.items():
                tf = t.split(" ").count(term)
                if tf:
                    dl = len(t.split(" "))
                    want[d] = want.get(d, 0) + idf * (44 * tf * A) // (
                        20 * tf * A + 6 * A + 18 * dl * N
                    )
        got = dict(zip(out["doc_id"], out["score"]))
        assert got == want

    def test_irrelevant_docs_absent_and_order_deterministic(self, ray_session):
        from commons_codec_ray.stages.ranking import bm25_topk

        out = bm25_topk(self._corpus(), ["apple"], k=10).to_pandas()
        assert set(out["doc_id"]) == {1, 2}
        assert list(out["score"]) == sorted(out["score"], reverse=True)

    def test_absent_term_ignored(self, ray_session):
        from commons_codec_ray.stages.ranking import bm25_topk

        out = bm25_topk(self._corpus(), ["zzz_missing"], k=10).to_pandas()
        assert len(out) == 0


class TestSkyline:
    def test_matches_bruteforce_with_duplicates(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from commons_codec_ray.stages.ranking import skyline

        rng = np.random.RandomState(7)
        # coarse grid → plenty of exact duplicates and ties on each axis
        x = rng.randint(0, 25, 3000).astype("float64")
        y = rng.randint(0, 25, 3000).astype("float64")
        t = pa.table(
            {
                "id": pa.array(np.arange(3000), pa.int64()),
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )
        got = (
            skyline(rd.from_arrow(t).repartition(9), "x", "y")
            .to_pandas()
            .sort_values("id")
        )
        dominated = np.zeros(3000, dtype=bool)
        for i in range(3000):
            dominated[i] = np.any(
                (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
            )
        want = np.flatnonzero(~dominated)
        assert got["id"].to_numpy().tolist() == want.tolist()


def test_ntile_matches_duckdb(ray_session):
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from commons_codec_ray.stages.ranking import ntile

    rng = np.random.RandomState(2)
    n = 2003  # not divisible by k: exercises the big/small bucket split
    v = rng.randint(0, 50, n).astype("float64")  # heavy ties
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()), "v": pa.array(v)})
    got = (
        ntile(rd.from_arrow(t).repartition(7), "v", "id", k=7)
        .to_pandas()
        .sort_values("id")
    )
    want = duckdb.connect().execute(
        "SELECT id, ntile(7) OVER (ORDER BY v, id) AS tile FROM t ORDER BY id"
    ).df()
    assert got["tile"].tolist() == want["tile"].tolist()


def test_bm25_duplicate_query_terms_do_not_double_count(ray_session):
    from commons_codec_ray.stages.ranking import bm25_topk

    rows = [
        (1, "apple banana apple cherry"),
        (2, "apple apple apple apple banana banana"),
        (3, "cherry date elderberry fig grape"),
        (4, "banana"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    once = bm25_topk(ds, ["apple", "banana"], k=10).to_pandas()
    # a duplicated term must not inflate df (idf skew): scores identical
    twice = bm25_topk(ds, ["apple", "apple", "banana"], k=10).to_pandas()
    assert dict(zip(once["doc_id"], once["score"])) == dict(
        zip(twice["doc_id"], twice["score"])
    )
