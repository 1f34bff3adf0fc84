"""Z-order layout: Morton codes and per-bucket bounding stats."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from commons_codec_ray.stages.layout import morton2, zorder_stats


def _morton_ref(x: int, y: int) -> int:
    c = 0
    for i in range(16):
        c |= ((x >> i) & 1) << (2 * i)
        c |= ((y >> i) & 1) << (2 * i + 1)
    return c


def test_morton2_matches_bit_loop():
    rng = np.random.RandomState(1)
    x = rng.randint(0, 1 << 16, 500).astype("int64")
    y = rng.randint(0, 1 << 16, 500).astype("int64")
    got = morton2(x, y)
    assert got.tolist() == [_morton_ref(a, b) for a, b in zip(x, y)]


def test_zorder_stats_buckets_are_quadrant_cells(ray_session):
    rng = np.random.RandomState(4)
    n = 20_000
    x = rng.randint(100, 1100, n).astype("int64")
    y = rng.randint(5000, 5800, n).astype("int64")
    ds = rd.from_arrow(
        pa.table({"x": pa.array(x), "y": pa.array(y)})
    ).repartition(8)
    out = zorder_stats(ds, "x", "y", prefix_bits=6).to_pandas()
    assert out["n"].sum() == n
    # replicate: 6-bit prefix = 3 bits per dim → 8×8 grid over the
    # normalized 16-bit space; every bucket must stay inside one cell
    xs = ((x - x.min()) * 65536) // (x.max() - x.min() + 1)
    ys = ((y - y.min()) * 65536) // (y.max() - y.min() + 1)
    cell_x = xs >> 13
    cell_y = ys >> 13
    import pandas as pd

    cells = pd.DataFrame(
        {"zb": morton2(xs, ys) >> 26, "cx": cell_x, "cy": cell_y}
    ).drop_duplicates()
    # one (cx, cy) cell per zbucket — tight rectangles, the pruning property
    assert cells.groupby("zb").size().max() == 1
    assert len(out) == cells["zb"].nunique()
