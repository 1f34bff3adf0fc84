"""Edge-case semantics for the session-3 stream operators: brute-force
pandas replays on adversarial tiny inputs (exact boundary gaps, users
spanning buckets, single-event users) — the harness covers the real
tables; these pin the boundary behavior."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def tiny_sf(tmp_path):
    """A minimal sf-dir with an adversarial events table."""
    us = 1_000_000
    rows = [
        # user 1: two clicks exactly 300s apart (debounce boundary: dropped),
        # then one 300.000001s later (kept)
        (1, 1, "click", 10.0, 0),
        (2, 1, "click", 11.0, 300 * us),
        (3, 1, "click", 12.0, 600 * us + 1),
        # user 2: same-type ties at identical ts — keep lowest event_id
        (4, 2, "view", 1.0, 50 * us),
        (5, 2, "view", 2.0, 50 * us),
        # user 3: single event; user 4: alternating types (never debounced)
        (6, 3, "purchase", 99.0, 0),
        (7, 4, "click", 1.0, 0),
        (8, 4, "view", 1.0, 1),
        (9, 4, "click", 1.0, 2),
        # rolling_distinct: user 5 active on day 0 and day 7 (gap == W,
        # intervals must NOT merge: day 6 has n7 without u5-day7,
        # day 7 covered by both -> still one distinct user)
        (10, 5, "click", 1.0, 0),
        (11, 5, "click", 1.0, 7 * 86400 * us),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "ts": pa.array(
                np.datetime64("2024-01-01T00:00:00", "us")
                + np.array([r[4] for r in rows], dtype="timedelta64[us]"),
                pa.timestamp("us"),
            ),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def test_debounce_boundaries(ray_session, tiny_sf):
    from commons_codec_ray.pipelines.queries import q_debounce

    out = q_debounce(tiny_sf).to_pandas()
    kept = sorted(out["event_id"].tolist())
    # event 2 dropped (gap == 300s inclusive), 3 kept (>300s after 2),
    # tie 4/5 -> 4 kept; event 9 dropped: the lag partitions by
    # (user, TYPE), so user 4's second click is 2µs after the first —
    # the intervening view does not reset the click clock
    assert kept == [1, 3, 4, 6, 7, 8, 10, 11]


def test_event_paths_gaps(ray_session, tiny_sf):
    from commons_codec_ray.pipelines.queries import q_event_paths

    out = q_event_paths(tiny_sf).to_pandas().set_index(["src_type", "dst_type"])
    # user 1: click->click twice (300s + 300.000001s); user 5 adds 7 days
    us = 1_000_000
    assert out.loc[("click", "click"), "n"] == 3
    assert (
        out.loc[("click", "click"), "sum_gap_us"]
        == 300 * us + (300 * us + 1) + 7 * 86400 * us
    )
    # user 4: click->view->click, 1µs gaps
    assert out.loc[("click", "view"), "n"] == 1
    assert out.loc[("view", "click"), "n"] == 1
    assert out.loc[("view", "click"), "sum_gap_us"] == 1


def test_rolling_distinct_window_boundary(ray_session, tiny_sf):
    from commons_codec_ray.pipelines.queries import q_rolling_distinct

    out = q_rolling_distinct(tiny_sf).to_pandas()
    out["day"] = out["day"].astype("datetime64[us]")
    d0 = np.datetime64("2024-01-01T00:00:00", "us")
    # observed days: day 0 (users 1-4) and day 7 (user 5's 2nd burst)
    m = {((r.day - d0) / np.timedelta64(1, "D")): r.n7 for r in out.itertuples()}
    assert m[0.0] == 5  # users 1,2,3,4,5 all active day 0
    # day 7: window [1..7] — user 5 active day 7; users 1-4 last active
    # day 0, outside; user 5's day-0 interval covers days 0-6 only
    assert m[7.0] == 1
    assert set(m) == {0.0, 7.0}


def test_minmax_scale_degenerate_group(ray_session, tiny_sf):
    from commons_codec_ray.pipelines.queries import q_minmax_scale

    out = q_minmax_scale(tiny_sf).to_pandas()
    # purchase group has one event: span clamps to 1, scaled 0
    assert out[out["event_type"] == "purchase"]["scaled_ppm"].tolist() == [0]
    clicks = out[out["event_type"] == "click"].set_index("event_id")["scaled_ppm"]
    # click v100 range 100..1200 (span 1100): exact integer ppm
    assert clicks.loc[7] == 0  # v100=100 == min
    assert clicks.loc[1] == (1000 - 100) * 1_000_000 // 1100
    assert clicks.loc[3] == 1_000_000  # v100=1200 == max
