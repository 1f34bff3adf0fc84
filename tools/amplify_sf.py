"""Deterministic 10x amplification of sf0.1 -> /tmp/sf1.0.

The sf1.0 spot-sweep (VERDICT r4 #8) needs a 10x-scale input that BOTH
the Ray pipelines and the DuckDB oracle read, to catch scale-dependent
drift (int overflows, driver-size guards, partition-fits assumptions).
Tiles the sf0.1 tables with CONSISTENT key offsets so every foreign-key
relationship survives: tile j shifts each table's surrogate keys by
j * (max_key + 1) of the base table; tiny dimension tables
(region/nation) are not tiled and keep their key space.

Usage: python tools/amplify_sf.py [tiles] [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _span(t: pa.Table, col: str) -> int:
    return int(pc.max(t[col]).as_py()) + 1


def amplify(tiles: int = 10, out_dir: str = "/tmp/sf1.0") -> str:
    out = Path(out_dir)
    done = out / "_DONE"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)

    base = {
        name: pq.read_table(f"{SRC}/{name}.parquet")
        for name in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }
    spans = {
        "cust": _span(base["customer"], "c_custkey"),
        "supp": _span(base["supplier"], "s_suppkey"),
        "part": _span(base["part"], "p_partkey"),
        "ok": _span(base["orders"], "o_orderkey"),
        "ev": _span(base["events"], "event_id"),
        "user": _span(base["events"], "user_id"),
        "doc": _span(base["documents"], "doc_id"),
        "vec": _span(base["embeddings"], "vec_id"),
    }
    # per-table: {column: span_key}; untabled columns copy through
    shifted = {
        "customer": {"c_custkey": "cust"},
        "supplier": {"s_suppkey": "supp"},
        "part": {"p_partkey": "part"},
        "orders": {"o_orderkey": "ok", "o_custkey": "cust"},
        "lineitem": {"l_orderkey": "ok", "l_partkey": "part", "l_suppkey": "supp"},
        "events": {"event_id": "ev", "user_id": "user"},
        "documents": {"doc_id": "doc"},
        "embeddings": {"vec_id": "vec"},
    }

    for name in ("region", "nation"):  # dimensions: one copy
        pq.write_table(base[name], out / f"{name}.parquet")

    for name, shifts in shifted.items():
        t = base[name]
        parts = []
        for j in range(tiles):
            tt = t
            for col, key in shifts.items():
                idx = tt.schema.get_field_index(col)
                typ = tt.schema.field(idx).type
                shifted_col = pc.cast(
                    pc.add(pc.cast(tt[col], pa.int64()), j * spans[key]), typ
                )
                tt = tt.set_column(idx, col, shifted_col)
            parts.append(tt)
        pq.write_table(
            pa.concat_tables(parts), out / f"{name}.parquet", row_group_size=200_000
        )
    done.touch()
    return str(out)


if __name__ == "__main__":
    tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    print(amplify(tiles, dst))
