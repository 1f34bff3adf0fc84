"""Prefix-dominated conversation dedup (q_conv_prefix_dedup):
proper-prefix removal, equal-sequence tie-break, planted halves."""

import pyarrow as pa
import pyarrow.parquet as pq

from commons_codec_ray.pipelines.queries import q_conv_prefix_dedup


def _events(rows):
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "props": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def test_prefix_domination_and_ties(ray_session, tmp_path):
    rows = [
        # user 1: A B C D  (planted p-1 = A B)
        (1, 10, "A"), (1, 11, "B"), (1, 12, "C"), (1, 13, "D"),
        # user 2: A B -> proper prefix of c-1, dominated (planted p-2 = A)
        (2, 20, "A"), (2, 21, "B"),
        # users 4/5: X Y == X Y -> tie, min conv_id 'c-4' survives
        (4, 40, "X"), (4, 41, "Y"),
        (5, 50, "X"), (5, 51, "Y"),
    ]
    pq.write_table(_events(rows), tmp_path / "events.parquet")
    got = (
        q_conv_prefix_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert dict(zip(got.conv_id, got.n_turns)) == {"c-1": 4, "c-4": 2}


def test_no_domination_all_kept(ray_session, tmp_path):
    rows = [
        # single-turn conversations with distinct texts: planted halves
        # are empty (n // 2 == 0), nothing dominates anything
        (1, 1, "u"), (2, 2, "v"), (3, 3, "w"),
    ]
    pq.write_table(_events(rows), tmp_path / "events.parquet")
    got = q_conv_prefix_dedup(str(tmp_path)).to_pandas()
    assert sorted(got.conv_id) == ["c-1", "c-2", "c-3"]
    assert set(got.n_turns) == {1}


def test_separator_in_text_engine_oracle_parity(ray_session, tmp_path):
    """A turn text containing the oracle's chr(31) separator must not
    fabricate a prefix relation (length-prefixed oracle encoding)."""
    import duckdb

    from commons_codec_ray.pipelines.queries import ORACLE_SQL

    sep = chr(31)
    rows = [
        (1, 10, "x"),                 # c-1 = ["x"]
        (2, 20, "x" + sep + "y"),     # c-2 = ["x\x1fy", "z"]; p-2 = ["x\x1fy"]
        (2, 21, "z"),
    ]
    pq.write_table(_events(rows), tmp_path / "events.parquet")
    got = (
        q_conv_prefix_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    # naive separator-joined encoding would claim c-1 ("x") is a prefix
    # of c-2 ("x\x1fy..."); it is not a TURN prefix
    assert dict(zip(got.conv_id, got.n_turns)) == {"c-1": 1, "c-2": 2}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    oracle = (
        con.execute(ORACLE_SQL["conv_prefix_dedup"])
        .df()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert dict(zip(oracle.conv_id, oracle.n_turns)) == {"c-1": 1, "c-2": 2}
