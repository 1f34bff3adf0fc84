"""Mergeable grouped-moment sketches (stages/stats.py): Chan-merge
partials must equal a single-pass numpy computation regardless of how
the rows are split into batches."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from commons_codec_ray.stages.stats import (
    finalize_stats,
    grouped_moments,
    merge_moments,
    moments_partial,
)


def _ref_stats(df, key, x, y):
    out = {}
    for k, g in df.groupby(key):
        xs, ys = g[x].to_numpy(float), g[y].to_numpy(float)
        out[k] = (
            len(xs),
            np.corrcoef(xs, ys)[0, 1],
            np.cov(xs, ys, ddof=1)[0, 1],
            np.std(xs, ddof=1),
        )
    return out


def _rand_df(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "g": rng.integers(0, 4, n),
            "x": rng.normal(10, 3, n),
            "y": rng.normal(-2, 7, n),
        }
    )


def test_partial_merge_matches_single_pass_any_split():
    df = _rand_df()
    ref = _ref_stats(df, "g", "x", "y")
    for splits in (1, 3, 17):
        parts = [
            moments_partial(chunk, "g", "x", "y")
            for chunk in np.array_split(df, splits)
        ]
        merged = merge_moments(pd.concat(parts, ignore_index=True), "g")
        s = finalize_stats(pa.Table.from_pandas(merged), "g")
        for i, k in enumerate(merged["g"]):
            n, corr, cov, sd = ref[k]
            assert s["n"][i] == n
            assert abs(s["corr"][i] - corr) < 1e-10
            assert abs(s["covar"][i] - cov) < 1e-8
            assert abs(s["sdx"][i] - sd) < 1e-10


def test_merge_is_order_deterministic():
    df = _rand_df(seed=9)
    parts = pd.concat(
        [moments_partial(c, "g", "x", "y") for c in np.array_split(df, 7)],
        ignore_index=True,
    )
    a = merge_moments(parts, "g").sort_values("g").reset_index(drop=True)
    b = (
        merge_moments(parts.sample(frac=1.0, random_state=1), "g")
        .sort_values("g")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)  # bit-identical despite shuffled input


def test_grouped_moments_dataset(ray_session):
    df = _rand_df(seed=5)
    ref = _ref_stats(df, "g", "x", "y")
    ds = rd.from_pandas(df).repartition(6)
    t = pa.concat_tables(
        grouped_moments(ds, "g", "x", "y").iter_batches(batch_format="pyarrow")
    )
    s = finalize_stats(t, "g")
    got = {int(k): i for i, k in enumerate(t["g"].to_pylist())}
    for k, (n, corr, cov, sd) in ref.items():
        i = got[int(k)]
        assert s["n"][i] == n
        assert abs(s["corr"][i] - corr) < 1e-10


def test_retention_cohorts_vs_pandas(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from commons_codec_ray.stages.stats import DAY_US, retention_cohorts

    rng = np.random.RandomState(31)
    n = 8000
    users = rng.randint(0, 300, n).astype("int64")
    days = rng.randint(0, 45, n).astype("int64")
    ts = pa.array(days * DAY_US + rng.randint(0, DAY_US, n), pa.timestamp("us"))
    t = pa.table({"user_id": pa.array(users), "ts": ts})
    got = (
        retention_cohorts(rd.from_arrow(t).repartition(9))
        .to_pandas()
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"u": users, "d": days}).drop_duplicates()
    first = df.groupby("u")["d"].min().rename("cohort")
    j = df.join(first, on="u")
    want = (
        j.assign(off=j["d"] - j["cohort"])
        .groupby(["cohort", "off"], as_index=False)
        .size()
        .sort_values(["cohort", "off"])
        .reset_index(drop=True)
    )
    assert got["cohort_day"].tolist() == want["cohort"].tolist()
    assert got["day_offset"].tolist() == want["off"].tolist()
    assert got["n_users"].tolist() == want["size"].tolist()


class TestEmbeddingMoments:
    @staticmethod
    def _ds(m, blocks=6):
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
                "embedding": pa.array(
                    [r.tolist() for r in m], pa.list_(pa.float32())
                ),
            }
        )
        return rd.from_arrow(t).repartition(blocks)

    def test_second_moments_match_single_pass(self, ray_session):
        from commons_codec_ray.stages.kmeans import _quantize
        from commons_codec_ray.stages.stats import embedding_second_moments

        rng = np.random.RandomState(2)
        m = rng.uniform(-0.8, 0.8, (300, 12)).astype(np.float32)
        S, sums, n = embedding_second_moments(self._ds(m))
        q = _quantize(m)
        assert n == 300
        assert (sums == q.sum(axis=0)).all()
        assert (S == q.T @ q).all()
        # block-layout invariance (integer partials are order-free)
        S2, sums2, n2 = embedding_second_moments(self._ds(m, blocks=2))
        assert (S2 == S).all() and (sums2 == sums).all() and n2 == n

    def test_pca_recovers_planted_direction(self, ray_session):
        from commons_codec_ray.stages.stats import pca_components

        rng = np.random.RandomState(8)
        d = 10
        axis = np.zeros(d)
        axis[3] = 0.8
        axis[7] = 0.6
        coef = rng.normal(0, 0.5, 1000)[:, None]
        noise = rng.normal(0, 0.01, (1000, d))
        m = (coef * axis[None, :] + noise).astype(np.float32)
        comps, eigvals = pca_components(self._ds(m), n_components=2)
        # top component aligns with the planted axis, dominant variance
        assert abs(float(comps[0] @ axis)) > 0.99
        assert eigvals[0] > 50 * eigvals[1]

    def test_pca_sign_determinism(self, ray_session):
        from commons_codec_ray.stages.stats import pca_components

        rng = np.random.RandomState(9)
        m = rng.normal(0, 0.3, (400, 6)).astype(np.float32)
        a, _ = pca_components(self._ds(m, blocks=3), n_components=3)
        b, _ = pca_components(self._ds(m, blocks=9), n_components=3)
        assert np.allclose(a, b)
        # the largest-|coefficient| entry of every component is positive
        for row in a:
            assert row[int(np.argmax(np.abs(row)))] > 0
