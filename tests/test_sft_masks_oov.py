"""SFT loss-mask accounting (q_sft_masks) and OOV-rate diagnostics
(q_oov_rate) semantics on hand-built corpora."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from commons_codec_ray.pipelines.queries import q_oov_rate, q_sft_masks


def test_sft_masks_segments_and_lengths(ray_session, tmp_path):
    # user 1: view(asst) click(asst) error view(asst) -> 2 segments
    # user 2: error signup -> 0 segments (boundary from user 1's
    #         trailing assistant turn must NOT leak into user 2)
    rows = [
        (1, 10, "view", "aa"),
        (1, 11, "click", "bbb"),
        (1, 12, "error", "c"),
        (1, 13, "view", "dd"),
        (2, 20, "error", "e"),
        (2, 21, "signup", "ff"),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "props": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = q_sft_masks(str(tmp_path)).to_pandas().set_index("conv_id")
    c1 = got.loc["c-1"]
    # rendered: sum(len(role)+len(text)+5) = (4+2+5)+(5+3+5)+(5+1+5)+(4+2+5)
    assert c1.n_turns == 4
    assert c1.rendered_chars == 11 + 13 + 11 + 11
    assert c1.assistant_chars == 2 + 3 + 2
    assert c1.mask_segments == 2
    c2 = got.loc["c-2"]
    assert c2.n_turns == 2
    assert c2.assistant_chars == 0
    assert c2.mask_segments == 0


def test_oov_rate_topk_vocab(ray_session, tmp_path):
    # 25 docs saying "common words" -> vocab(top-20) surely contains
    # both; one doc adds rare tokens
    rows = [{"doc_id": i, "text": "common words"} for i in range(25)]
    rows.append({"doc_id": 25, "text": "common rare1 rare2 rare3"})
    rows.append({"doc_id": 26, "text": ""})  # zero tokens
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")
    got = q_oov_rate(str(tmp_path)).to_pandas().set_index("doc_id")
    assert (got.loc[range(25), "oov_tokens"] == 0).all()
    r = got.loc[25]
    # vocab has only 5 distinct corpus tokens total, so top-20 holds
    # them all -> nothing is OOV; shrink is exercised in the oracle
    assert (r.n_tokens, r.oov_tokens) == (4, 0)
    z = got.loc[26]
    assert (z.n_tokens, z.oov_tokens, z.oov_ppm) == (0, 0, 0)


def test_oov_rate_rare_tokens_flagged(ray_session, tmp_path):
    # 21 distinct high-df tokens + 2 singletons: top-20 excludes the
    # lowest-df one ('z9' by tie-break) and both singletons
    common = [f"w{i:02d}" for i in range(20)]
    rows = [{"doc_id": i, "text": " ".join(common)} for i in range(10)]
    # 'z9' appears in 2 docs (less than the 10 above), singles in 1
    rows.append({"doc_id": 10, "text": "z9 single1"})
    rows.append({"doc_id": 11, "text": "z9 single2 w00"})
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")
    got = q_oov_rate(str(tmp_path)).to_pandas().set_index("doc_id")
    # vocab = 20 w-tokens (df 10 or 11) ... z9 has df 2 > singles df 1,
    # but top-20 is full of w-tokens; z9 and singles are OOV
    assert got.loc[10].oov_tokens == 2
    assert got.loc[11].oov_tokens == 2
    assert got.loc[11].n_tokens == 3
    assert got.loc[11].oov_ppm == 2 * 1_000_000 // 3
    assert (got.loc[range(10), "oov_tokens"] == 0).all()


def test_tool_call_stats_null_first_turn(ray_session, tmp_path):
    from commons_codec_ray.pipelines.queries import q_tool_call_stats

    # user 1 never crosses the tool threshold (value < 50); user 2 does
    # on its second surviving turn. event_id % 10 == 7 rows are deletes
    # and event_id % 40 is the turn -- keep ids low and distinct.
    rows = [
        (1, 0, "click", 10.0), (1, 1, "view", 20.0), (1, 2, "error", 49.0),
        (2, 20, "click", 10.0), (2, 21, "view", 99.0), (2, 22, "click", 75.0),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(len(rows))], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = q_tool_call_stats(str(tmp_path)).to_pandas().set_index("conv_id")
    c1 = got.loc["c-1"]
    assert (c1.n_turns, c1.n_tool_calls, c1.n_distinct_tools) == (3, 0, 0)
    assert pd.isna(c1.first_tool_turn)
    c2 = got.loc["c-2"]
    assert (c2.n_turns, c2.n_tool_calls, c2.n_distinct_tools) == (3, 2, 1)
    assert c2.first_tool_turn == 21


def test_context_truncate_suffix_and_oversize_turn(ray_session, tmp_path):
    from commons_codec_ray.pipelines.queries import q_context_truncate

    # user 1: rendered lens 105,105,105,105,105,105 -> budget 512 keeps
    #         the last 4 (420) but not 5 (525)
    # user 2: single oversize turn (rendered 605) -> kept anyway
    rows = [(1, i, "role", "x" * 96) for i in range(6)]  # 4+96+5 = 105
    rows.append((2, 10, "role", "y" * 596))  # 4+596+5 = 605
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "props": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = q_context_truncate(str(tmp_path)).to_pandas().set_index("conv_id")
    assert (got.loc["c-1"].n_kept, got.loc["c-1"].kept_chars) == (4, 420)
    assert (got.loc["c-2"].n_kept, got.loc["c-2"].kept_chars) == (1, 605)
