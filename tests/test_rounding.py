"""Half-away-from-zero rounding parity with DuckDB round(DOUBLE).

Round-3 driver hash-fails on shipping_priority/big_orders traced to
np.rint (banker's rounding) in the integer-cents lanes while the
oracles use DuckDB round() (half away from zero). These tests pin the
exact .5 boundary where the two diverge so a regression to np.rint
fails immediately, without needing driver data that hits the boundary.
"""

import duckdb
import numpy as np
import pytest

from commons_codec_ray.util import duck_rint, duckdb_round

# values whose *100 product lands EXACTLY on .5 in IEEE double:
# 1.125*100 == 112.5, 0.005*100 != 0.5 (not representable) — pick
# dyadic-rational inputs so the product is exact.
BOUNDARY = [1.125, -1.125, 2.375, -2.375, 0.625, 3.625, -0.625, 113.5, -113.5]


def test_duck_rint_matches_duckdb_round_on_boundary():
    con = duckdb.connect()
    vals = np.array([v * 100 for v in BOUNDARY] + [0.0, -0.0, 267.49999999999997])
    expect = [
        con.execute("select round(?::DOUBLE)", [float(v)]).fetchone()[0]
        for v in vals
    ]
    got = duck_rint(vals)
    assert list(got) == [pytest.approx(e) for e in expect]
    # explicit divergence from np.rint at the boundary
    assert duck_rint(np.array([112.5]))[0] == 113.0
    assert np.rint(np.array([112.5]))[0] == 112.0
    assert duck_rint(np.array([-112.5]))[0] == -113.0


def test_duck_rint_vectorized_shapes_and_nan():
    out = duck_rint(np.array([1.5, 2.5, -1.5, np.nan]))
    assert out[0] == 2.0 and out[1] == 3.0 and out[2] == -2.0
    assert np.isnan(out[3])
    assert out.dtype == np.float64


def test_queries_module_has_no_np_rint():
    """The integer-cents lanes must never regress to np.rint."""
    import inspect

    import commons_codec_ray.pipelines.queries as q

    src = inspect.getsource(q)
    assert "np.rint(" not in src, "queries.py must use duck_rint, not np.rint"


def test_duckdb_round_ndigits_boundary():
    con = duckdb.connect()
    vals = [1.125, -1.125, 0.015625, 2.675]
    for v in vals:
        expect = con.execute("select round(?::DOUBLE, 2)", [v]).fetchone()[0]
        got = duckdb_round(np.array([v]), 2)[0]
        assert got == pytest.approx(expect, abs=0.0), (v, got, expect)
