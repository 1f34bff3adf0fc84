"""Stateful-sequence tests for LWW apply (pattern: reference
tests/transform/test_aws_dms_universal.py order-sensitive sequences +
the idempotence precedent in tests/transform/test_dynamodb_cdc.py:365-369)."""

import numpy as np
import pyarrow as pa

from commons_codec_ray.schemas import OP_DELETE, OP_UPSERT
from commons_codec_ray.stages.applier import (
    LSN_COLUMN,
    apply_ops_to_base,
    base_as_ops,
    lww_combine_batch,
    lww_reduce,
)


def ops_table(rows):
    """rows: (op, conv_id, turn_idx, text, lsn)"""
    return pa.table(
        {
            "op": pa.array([r[0] for r in rows], pa.int8()),
            "conv_id": pa.array([r[1] for r in rows], pa.string()),
            "turn_idx": pa.array([r[2] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([1000 + r[4] for r in rows], pa.timestamp("us")),
            "lsn": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def final_dict(out):
    return {
        (r["conv_id"], r["turn_idx"]): (r["text"], r[LSN_COLUMN])
        for r in out.to_pylist()
    }


def test_insert_update_delete_sequence():
    ops = ops_table(
        [
            (OP_UPSERT, "a", 0, "v1", 1),
            (OP_UPSERT, "a", 0, "v2", 2),
            (OP_DELETE, "a", 0, None, 3),
            (OP_UPSERT, "a", 1, "w1", 4),
        ]
    )
    out = apply_ops_to_base(None, ops)
    assert final_dict(out) == {("a", 1): ("w1", 4)}


def test_out_of_order_lsn_arrival():
    # arrival order ≠ lsn order; LWW must pick max-lsn, not last-arrived
    ops = ops_table(
        [
            (OP_UPSERT, "a", 0, "newest", 9),
            (OP_UPSERT, "a", 0, "oldest", 1),
            (OP_UPSERT, "a", 0, "middle", 5),
        ]
    )
    out = apply_ops_to_base(None, ops)
    assert final_dict(out) == {("a", 0): ("newest", 9)}


def test_duplicate_delivery_idempotent():
    # same (key, lsn) delivered twice (retry storm) → exactly one row
    ops = ops_table(
        [
            (OP_UPSERT, "a", 0, "v", 1),
            (OP_UPSERT, "a", 0, "v", 1),
        ]
    )
    out = apply_ops_to_base(None, ops)
    assert out.num_rows == 1
    assert final_dict(out) == {("a", 0): ("v", 1)}


def test_delete_then_reinsert():
    ops = ops_table(
        [
            (OP_UPSERT, "a", 0, "v1", 1),
            (OP_DELETE, "a", 0, None, 2),
            (OP_UPSERT, "a", 0, "v2", 3),
        ]
    )
    out = apply_ops_to_base(None, ops)
    assert final_dict(out) == {("a", 0): ("v2", 3)}


def test_base_merge_respects_stored_lsn():
    base = apply_ops_to_base(None, ops_table([(OP_UPSERT, "a", 0, "stored", 10)]))
    # replayed older op must NOT overwrite newer stored state
    out = apply_ops_to_base(base, ops_table([(OP_UPSERT, "a", 0, "stale", 5)]))
    assert final_dict(out) == {("a", 0): ("stored", 10)}
    # newer op wins
    out2 = apply_ops_to_base(base, ops_table([(OP_UPSERT, "a", 0, "fresh", 11)]))
    assert final_dict(out2) == {("a", 0): ("fresh", 11)}


def test_reapply_same_epoch_is_noop():
    ops = ops_table([(OP_UPSERT, "a", 0, "v1", 1), (OP_UPSERT, "b", 3, "v2", 2)])
    once = apply_ops_to_base(None, ops)
    twice = apply_ops_to_base(once, ops)
    assert final_dict(once) == final_dict(twice)


def test_empty_string_vs_null_text():
    ops = ops_table([(OP_UPSERT, "a", 0, "", 1), (OP_UPSERT, "a", 1, None, 2)])
    out = apply_ops_to_base(None, ops).sort_by("turn_idx")
    texts = out["text"].to_pylist()
    assert texts == ["", None]


def test_lww_combine_batch_passthrough_special():
    from commons_codec_ray.schemas import OP_DEAD, OPS_SCHEMA

    tbl = pa.table(
        {
            "op": pa.array([OP_UPSERT, OP_UPSERT, OP_DEAD], pa.int8()),
            "table_name": pa.array(["transcripts"] * 3, pa.string()).dictionary_encode(),
            "conv_id": pa.array(["a", "a", None], pa.string()),
            "turn_idx": pa.array([0, 0, None], pa.int32()),
            "role": pa.array([None] * 3, pa.string()),
            "text": pa.array(["v1", "v2", None], pa.string()),
            "tool": pa.array([None] * 3, pa.string()),
            "ts": pa.array([None] * 3, pa.timestamp("us")),
            "aux": pa.array([None, None, "junk"], pa.string()),
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "source_offset": pa.array([1, 2, 3], pa.int64()),
            "partition_id": pa.array([0, 0, 0], pa.int32()),
            "shuffle_key": pa.array([0, 0, 0], pa.int64()),
            "error": pa.array([None, None, "boom"], pa.string()),
        },
        schema=OPS_SCHEMA,
    )
    out = lww_combine_batch(tbl)
    assert out.num_rows == 2  # one combined data row + one dead letter
    by_op = {r["op"]: r for r in out.to_pylist()}
    assert by_op[OP_UPSERT]["text"] == "v2"
    assert by_op[OP_DEAD]["error"] == "boom"


def test_lww_reduce_scales_many_keys():
    n = 200_000
    rng = np.random.RandomState(0)
    conv = np.char.add("c-", (rng.randint(0, 5000, n)).astype(str))
    turn = rng.randint(0, 50, n).astype(np.int32)
    lsn = rng.permutation(n).astype(np.int64)
    tbl = pa.table(
        {
            "op": pa.array(np.full(n, OP_UPSERT, dtype=np.int8)),
            "conv_id": pa.array(conv.astype(object), pa.string()),
            "turn_idx": pa.array(turn),
            "role": pa.array([None] * n, pa.string()),
            "text": pa.array(lsn.astype(str).astype(object), pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(np.full(n, 0), pa.timestamp("us")),
            "lsn": pa.array(lsn),
        }
    )
    out = lww_reduce(tbl)
    # one row per distinct key, each carrying its max lsn
    import pandas as pd

    df = tbl.to_pandas()
    expect = df.groupby(["conv_id", "turn_idx"])["lsn"].max()
    got = out.to_pandas().set_index(["conv_id", "turn_idx"])["lsn"].sort_index()
    pd.testing.assert_series_equal(got, expect.sort_index(), check_names=False)


def test_apply_ops_partial_merge_semantics():
    import numpy as np
    import pandas as pd

    from commons_codec_ray.stages.applier import apply_ops_partial

    rows = [
        # key A: insert full, then patch role only, then patch tool=NULL (present!)
        ("A", 0, 1, 1, "user", "t1", "search", "x1", True, True, True, True),
        ("A", 0, 1, 2, "asst", None, None, None, True, False, False, False),
        ("A", 0, 1, 3, None, None, None, None, False, False, True, False),
        # key B: insert, delete, then partial recreate carrying only text
        ("B", 1, 1, 4, "user", "old", "search", "x2", True, True, True, True),
        ("B", 1, 0, 5, None, None, None, None, False, False, False, False),
        ("B", 1, 1, 6, None, "new", None, None, False, True, False, False),
        # key C: insert then delete → gone
        ("C", 2, 1, 7, "user", "bye", None, "x3", True, True, True, True),
        ("C", 2, 0, 8, None, None, None, None, False, False, False, False),
    ]
    df = pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "op", "lsn", "role", "text", "tool", "ts",
                 "has_role", "has_text", "has_tool", "has_ts"],
    )
    out = apply_ops_partial(df).sort_values("conv_id").reset_index(drop=True)
    assert out["conv_id"].tolist() == ["A", "B"]
    a = out.iloc[0]
    # role from lsn 2, text/ts from lsn 1, tool NULLED by the present-NULL patch
    assert (a["role"], a["text"], a["ts"]) == ("asst", "t1", "x1")
    assert a["tool"] is None or (isinstance(a["tool"], float) and np.isnan(a["tool"]))
    b = out.iloc[1]
    # tombstone reset: only the recreate's text survives
    assert b["text"] == "new"
    for c in ("role", "tool", "ts"):
        assert pd.isna(b[c])


def test_apply_ops_partial_property_vs_fold():
    """Randomized op sequences vs a row-at-a-time reference fold."""
    import numpy as np
    import pandas as pd

    from commons_codec_ray.stages.applier import apply_ops_partial

    rng = np.random.RandomState(77)
    for trial in range(25):
        n = rng.randint(1, 60)
        rows = []
        for lsn in range(n):
            key = ("k%d" % rng.randint(0, 4), int(rng.randint(0, 3)))
            if rng.rand() < 0.25:
                rows.append((*key, 0, lsn, None, None, None, None,
                             False, False, False, False))
            else:
                has = rng.rand(4) < 0.6
                vals = [
                    ("r%d" % lsn) if has[0] else None,
                    ("t%d" % lsn) if has[1] else None,
                    (None if rng.rand() < 0.3 else "x%d" % lsn) if has[2] else None,
                    ("s%d" % lsn) if has[3] else None,
                ]
                rows.append((*key, 1, lsn, *vals, *has.tolist()))
        df = pd.DataFrame(
            rows,
            columns=["conv_id", "turn_idx", "op", "lsn", "role", "text", "tool",
                     "ts", "has_role", "has_text", "has_tool", "has_ts"],
        )
        # reference fold in lsn order
        state = {}
        for r in df.sort_values("lsn").itertuples(index=False):
            k = (r.conv_id, r.turn_idx)
            if r.op == 0:
                state.pop(k, None)
            else:
                cur = state.setdefault(k, {"role": None, "text": None,
                                           "tool": None, "ts": None})
                for c in ("role", "text", "tool", "ts"):
                    if getattr(r, "has_" + c):
                        cur[c] = getattr(r, c)
        got = apply_ops_partial(df.sample(frac=1.0, random_state=trial))
        got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        want_keys = sorted(state)
        assert list(zip(got["conv_id"], got["turn_idx"])) == want_keys, trial
        for i, k in enumerate(want_keys):
            for c in ("role", "text", "tool", "ts"):
                g = got.iloc[i][c]
                w = state[k][c]
                assert (pd.isna(g) and w is None) or g == w, (trial, k, c, g, w)
