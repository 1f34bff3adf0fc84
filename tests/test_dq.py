"""Declarative data-quality expectation checks (stages/dq.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from commons_codec_ray.stages.dq import Expectation, run_expectations


def _ds():
    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 3, 4, 5, 5, 5, 6, 7], pa.int64()),
            "val": pa.array(
                [10.0, -1.0, 25.0, None, 120.0, 50.0, 0.0, 99.0, None, 30.0]
            ),
            "status": pa.array(
                ["O", "F", "P", "O", None, "F", "X", "O", "F", "O"]
            ),
            "name": pa.array(
                ["a", "b", "a", None, "c", "d", "d", "e", "f", "g"]
            ),
        }
    )
    return rd.from_arrow(t).repartition(4)


def test_suite_counts(ray_session):
    fk_ref = ray.put(np.array([1, 2, 3, 4, 5], dtype=np.int64))
    got = run_expectations(
        _ds(),
        [
            Expectation("val_not_null", "val", "not_null"),
            Expectation("val_range", "val", "range", lo=0.0, hi=100.0),
            Expectation("status_domain", "status", "isin", values=("O", "F", "P")),
            Expectation("id_unique", "id", "unique"),
            Expectation("name_unique", "name", "unique"),
            Expectation("id_fk", "id", "fk", ref=fk_ref),
        ],
        num_buckets=4,
    ).to_pandas().set_index("check_name")

    # 2 NULL vals
    assert got.loc["val_not_null"].tolist() == [10, 2, False]
    # -1.0 and 120.0 out of [0, 100]; NULLs skipped
    assert got.loc["val_range"].tolist() == [10, 2, False]
    # one 'X'; NULL skipped
    assert got.loc["status_domain"].tolist() == [10, 1, False]
    # ids: 3 twice (+1), 5 thrice (+2) → 3 dup rows over 10 non-null
    assert got.loc["id_unique"].tolist() == [10, 3, False]
    # names (9 non-null): 'a' twice, 'd' twice → 2 dup rows
    assert got.loc["name_unique"].tolist() == [9, 2, False]
    # ids 6, 7 (three rows: 6 once, 7 once) outside ref {1..5}
    assert got.loc["id_fk"].tolist() == [10, 2, False]


def test_passed_flag_and_order(ray_session):
    got = run_expectations(
        _ds(),
        [
            Expectation("z_id_not_null", "id", "not_null"),
            Expectation("a_val_hi_only", "val", "range", hi=1000.0),
        ],
    ).to_pandas()
    assert got["check_name"].tolist() == ["a_val_hi_only", "z_id_not_null"]
    assert got["passed"].tolist() == [True, True]
    assert got["violations"].tolist() == [0, 0]


def test_bucket_count_invariance(ray_session):
    suite = [
        Expectation("id_unique", "id", "unique"),
        Expectation("name_unique", "name", "unique"),
    ]
    a = run_expectations(_ds(), suite, num_buckets=2).to_pandas()
    b = run_expectations(_ds(), suite, num_buckets=64).to_pandas()
    assert a.equals(b)


def test_declaration_errors(ray_session):
    with pytest.raises(ValueError, match="unknown expectation kind"):
        Expectation("x", "id", "regex")
    with pytest.raises(ValueError, match="needs lo or hi"):
        Expectation("x", "id", "range")
    with pytest.raises(ValueError, match="needs a ref"):
        Expectation("x", "id", "fk")
    with pytest.raises(ValueError, match="duplicate expectation names"):
        run_expectations(
            _ds(),
            [
                Expectation("x", "id", "not_null"),
                Expectation("x", "val", "not_null"),
            ],
        )


def test_unique_over_all_null_and_empty_inputs(ray_session):
    """The one-row-per-expectation contract holds even when a unique
    check's key column yields zero non-null rows (no groups at all)."""
    t = pa.table(
        {
            "k": pa.array([None, None, None], pa.int64()),
            "v": pa.array([1, 2, 3], pa.int64()),
        }
    )
    got = run_expectations(
        rd.from_arrow(t),
        [
            Expectation("k_unique", "k", "unique"),
            Expectation("v_not_null", "v", "not_null"),
        ],
    ).to_pandas().set_index("check_name")
    assert got.loc["k_unique"].tolist() == [0, 0, True]
    assert got.loc["v_not_null"].tolist() == [3, 0, True]

    # suite of ONLY unique checks over an all-NULL key: still one row
    only = run_expectations(
        rd.from_arrow(t), [Expectation("k_unique", "k", "unique")]
    ).to_pandas()
    assert only["check_name"].tolist() == ["k_unique"]
    assert only["passed"].tolist() == [True]


def test_profile_columns(ray_session):
    from commons_codec_ray.stages.dq import profile_columns

    t = pa.table(
        {
            "i": pa.array([1, 2, 2, None, 5], pa.int64()),
            "f": pa.array([1.5, None, -2.0, 3.25, 1.5]),
            "s": pa.array(["a", "b", "a", None, "c"]),
            "e": pa.array([None] * 5, pa.string()),
        }
    )
    got = (
        profile_columns(rd.from_arrow(t).repartition(3),
                        ["i", "f", "s", "e"], num_buckets=4)
        .to_pandas()
        .set_index("col_name")
    )
    assert got.index.tolist() == ["i", "f", "s", "e"]  # input order kept
    assert got.loc["i"].tolist() == [5, 1, 3, 1.0, 5.0]
    assert got.loc["f"].tolist() == [5, 1, 3, -2.0, 3.25]
    row_s = got.loc["s"]
    assert row_s[["n_rows", "n_nulls", "n_distinct"]].tolist() == [5, 1, 3]
    assert pd.isna(row_s["min_num"]) and pd.isna(row_s["max_num"])
    row_e = got.loc["e"]
    assert row_e[["n_rows", "n_nulls", "n_distinct"]].tolist() == [5, 5, 0]
    assert pd.isna(row_e["min_num"])
    with pytest.raises(ValueError, match="duplicate columns"):
        profile_columns(rd.from_arrow(t), ["i", "i"])


def test_profile_columns_binary_nan_and_zero_lanes(ray_session):
    """Review regressions: binary columns must profile without a UTF-8
    cast crash; -0.0/+0.0 and differently-payloaded NaNs each count as
    ONE distinct value (SQL DISTINCT semantics)."""
    import struct

    from commons_codec_ray.stages.dq import profile_columns

    qnan = struct.unpack("<d", struct.pack("<Q", 0x7FF8000000000000))[0]
    snan = struct.unpack("<d", struct.pack("<Q", 0x7FF0000000000001))[0]
    t = pa.table(
        {
            "b": pa.array([b"\xff\xfe", b"\x00", b"\xff\xfe", None], pa.binary()),
            "z": pa.array([0.0, -0.0, 1.0, None], pa.float64()),
            "n": pa.array([qnan, snan, 2.0, 2.0], pa.float64()),
        }
    )
    got = (
        profile_columns(rd.from_arrow(t).repartition(2), ["b", "z", "n"], num_buckets=4)
        .to_pandas()
        .set_index("col_name")
    )
    assert got.loc["b", "n_distinct"] == 2  # raw bytes, no UTF-8 crash
    assert got.loc["z", "n_distinct"] == 2  # {0.0, 1.0}: -0.0 folds in
    assert got.loc["n", "n_distinct"] == 2  # {NaN, 2.0}: payloads fold
