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
