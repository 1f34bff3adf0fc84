"""Transcript-native prep operators (stages/transcripts.py): SFT pair
extraction, conversation dedup, validation stats, role transitions —
pure-kernel tests on hand-built frames plus end-to-end bucket-count
invariance."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from commons_codec_ray.stages import transcripts as tr


def _frame(rows):
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "op", "lsn", "role", "text", "tool", "ts"]
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="s").astype("datetime64[us]")
    return df


BASE = _frame(
    [
        # conv A: three surviving turns; turn 1 superseded (lsn 10 < 11)
        ("c-1", 0, 1, 1, "user", "hi", None, 100),
        ("c-1", 1, 1, 10, "assistant", "OLD", None, 101),
        ("c-1", 1, 1, 11, "assistant", "hello", "search", 102),
        ("c-1", 2, 1, 12, "user", "bye", None, 103),
        # conv B: one turn deleted (max-lsn delete wins), one survives
        ("c-2", 0, 1, 2, "user", "x", None, 200),
        ("c-2", 1, 1, 3, "assistant", "y", None, 201),
        ("c-2", 1, 0, 4, "assistant", None, None, 202),
        # conv C: single turn → no SFT pair
        ("c-3", 0, 1, 5, "user", "solo", None, 300),
    ]
)


def test_lww_finalize_keeps_max_lsn_and_drops_deletes():
    out = tr.lww_finalize(BASE)
    assert list(out["conv_id"]) == ["c-1", "c-1", "c-1", "c-2", "c-3"]
    assert list(out["text"]) == ["hi", "hello", "bye", "x", "solo"]


def test_sft_pairs_contexts():
    out = tr.sft_pairs_bucket(BASE)
    # conv A contributes turns 1 and 2; conv B/C have <2 surviving turns
    assert list(out["conv_id"]) == ["c-1", "c-1"]
    assert list(out["turn_idx"]) == [1, 2]
    assert out["context"].iloc[0] == "user: hi"
    assert out["context"].iloc[1] == "user: hi\nassistant: hello"
    assert list(out["target"]) == ["hello", "bye"]


def test_conv_fingerprints_and_dedup():
    fps = tr.conv_fingerprints_bucket(BASE, clone_mod=None)
    assert len(fps) == 3
    want = hashlib.md5("user|hi\x1fassistant|hello\x1fuser|bye".encode()).hexdigest()
    assert fps.set_index("conv_id")["fp"]["c-1"] == want

    # clone_mod plants a shadow copy for user_id % 2 == 0 (c-2 here)
    fps2 = tr.conv_fingerprints_bucket(BASE, clone_mod=2)
    assert len(fps2) == 4
    dedup = tr.conv_dedup_bucket(fps2)
    by_id = dedup.set_index("conv_id")["n_copies"]
    assert by_id["c-2"] == 2  # original + dup-2 collapse, min id survives
    assert "dup-2" not in by_id.index
    assert by_id["c-1"] == 1


def test_conv_stats():
    out = tr.conv_stats_bucket(BASE).set_index("conv_id")
    assert out.loc["c-1", "n_turns"] == 3
    assert out.loc["c-1", "n_tool"] == 1
    # user → assistant → user alternates cleanly
    assert out.loc["c-1", "n_role_repeats"] == 0
    assert out.loc["c-2", "n_turns"] == 1
    rep = _frame(
        [
            ("c-9", 0, 1, 1, "user", "a", None, 1),
            ("c-9", 1, 1, 2, "user", "b", None, 2),
            ("c-9", 2, 1, 3, "user", "c", None, 3),
        ]
    )
    assert tr.conv_stats_bucket(rep)["n_role_repeats"].iloc[0] == 2


def test_role_transitions_partials_and_split():
    out = tr.role_transitions_bucket(BASE)
    pairs = dict(zip(out["pair"], out["n"]))
    # c-1: user→assistant, assistant→user; c-2 loses its turn 1 to the
    # max-lsn delete so it contributes nothing; c-3 is a single turn
    assert pairs == {"user\x1fassistant": 1, "assistant\x1fuser": 1}
    split = tr.split_transition_pairs(
        pa.table({"pair": list(pairs), "n": list(pairs.values())})
    )
    assert split["prev_role"].to_pylist() == ["user", "assistant"]
    assert split["role"].to_pylist() == ["assistant", "user"]


def test_ops_from_events_combines_within_batch():
    events = pa.table(
        {
            "event_id": pa.array([0, 40, 80, 7], pa.int64()),  # turns 0,0,0 + delete(7)
            "ts": pa.array([0, 1, 2, 3], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 1], pa.int64()),
            "event_type": ["a", "b", "c", "d"],
            "value": pa.array([0.0, 0.0, 99.0, 0.0]),
            "props": ["t0", "t1", "t2", "t3"],
        }
    )
    out = tr.ops_from_events(events, 8)
    # three deliveries of (c-1, 0) collapse to lsn 80; delete row kept
    assert out.num_rows == 2
    d = {(r["conv_id"], r["turn_idx"]): r for r in out.to_pylist()}
    assert d[("c-1", 0)]["lsn"] == 80 and d[("c-1", 0)]["tool"] == "search"
    assert d[("c-1", 7)]["op"] == 0


def test_bucket_count_invariance(sf_dir):
    """Same answer at 8 and 64 buckets — the result never depends on the
    bucket count, only parallelism/memory do."""
    import ray.data as rd

    events = rd.read_parquet(f"{sf_dir}/events.parquet").limit(2000).materialize()

    def run(nb):
        ds = events.map_batches(
            lambda t: tr.ops_from_events(t, nb, ("role", "text")),
            batch_format="pyarrow",
        )
        out = (
            ds.groupby("_b")
            .map_groups(tr.sft_pairs_bucket, batch_format="pandas")
            .to_pandas()
        )
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(run(8), run(64))


def test_pack_sequences_greedy_budget():
    rows = _frame(
        [
            ("c-1", 0, 1, 1, "u", "aaaaaaaaaa", None, 1),   # 10
            ("c-1", 1, 1, 2, "a", "bbbbbbbbbb", None, 2),   # 10 → acc 20
            ("c-1", 2, 1, 3, "u", "ccccc", None, 3),        # +5 > 24 → chunk 1
            ("c-1", 3, 1, 4, "a", "d" * 30, None, 4),       # 30 > 24 alone → chunk 2
            ("c-1", 4, 1, 5, "u", "e", None, 5),            # 30+1 > 24 → chunk 3
            ("c-2", 0, 1, 6, "u", "x", None, 6),            # fresh conv → chunk 0
        ]
    )
    out = tr.pack_sequences_bucket(rows, budget=24)
    assert list(out["chunk"]) == [0, 0, 1, 2, 3, 0]


def test_envelope_extra_int_field():
    import json

    import pyarrow as pa
    import pytest as _pytest

    from commons_codec_ray.envelopes import EventsToEnvelopes

    events = pa.table(
        {
            "event_id": pa.array([0, 7], pa.int64()),  # upsert + delete
            "ts": pa.array([0, 1], pa.timestamp("us")),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": ["a", "b"],
            "value": pa.array([41.7, 10.0]),
            "props": ["t0", "t1"],
        }
    )
    env = EventsToEnvelopes(dialect="debezium", duplicates=False, extra_int_field="rating")(events)
    payloads = [json.loads(p) for p in env["payload"].to_pylist()]
    assert payloads[0]["data"]["rating"] == 41  # floor, matches SQL oracle
    assert "rating" not in payloads[1]["data"]  # deletes carry no image
    with _pytest.raises(ValueError):
        EventsToEnvelopes(dialect="binlog", extra_int_field="rating")


class TestBpeTrain:
    @staticmethod
    def _ds(texts, blocks=4):
        import pyarrow as pa
        import ray.data as rd

        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        return rd.from_arrow(t).repartition(blocks)

    def test_merges_chain_and_tiebreak(self, ray_session):
        from commons_codec_ray.stages.text import bpe_train

        # every word 'abc': pairs (a,b) and (b,c) tie at n -> lexicographic
        # tie-break picks (a,b); merge 2 must then use the LEARNED symbol
        # 'ab' in pair (ab, c) — proving merges feed later iterations
        out = bpe_train(self._ds(["abc abc abc", "abc abc"]), merges=2).to_pandas()
        assert list(out.itertuples(index=False, name=None)) == [
            (1, "a", "b", 5),
            (2, "ab", "c", 5),
        ]

    def test_block_layout_invariance(self, ray_session):
        import numpy as np

        from commons_codec_ray.stages.text import bpe_train

        rng = np.random.RandomState(3)
        words = ["".join(rng.choice(list("abcdefg"), 5)) for _ in range(40)]
        texts = [" ".join(rng.choice(words, 12)) for _ in range(60)]
        a = bpe_train(self._ds(texts, blocks=2), merges=4).to_pandas()
        b = bpe_train(self._ds(texts, blocks=9), merges=4).to_pandas()
        assert a.equals(b)
        assert len(a) == 4 and (a["pair_count"] > 0).all()

    def test_repeated_pair_left_to_right_consumption(self, ray_session):
        from commons_codec_ray.stages.text import bpe_train

        # 'aaa': pairs (a,a) x2 per word; replace ' a a ' consumes left-to-
        # right so 'a a a' -> 'aa a' (one merge site), matching DuckDB
        out = bpe_train(self._ds(["aaa aaa"]), merges=2).to_pandas()
        assert (out.iloc[0][["l", "r"]] == ["a", "a"]).all()
        assert out.iloc[0]["pair_count"] == 4
        # second merge pairs the merged 'aa' with the leftover 'a'
        assert (out.iloc[1][["l", "r"]] == ["aa", "a"]).all()

    def test_tab_symbols_survive_and_match_oracle_semantics(self, ray_session):
        # regression (session-3 review): symbols from words containing \t
        # must be counted like DuckDB string_split(s, ' ') would — an
        # any-whitespace split would swallow the tab symbol entirely
        import duckdb

        from commons_codec_ray.stages.text import bpe_train

        texts = ["ab\tab ab\tab ab\tab", "ab\tab"]
        got = bpe_train(self._ds(texts, blocks=2), merges=2).to_pandas()
        con = duckdb.connect()
        con.register(
            "documents",
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
        )
        from commons_codec_ray.pipelines.queries import _bpe_train_sql

        want = con.execute(_bpe_train_sql(2)).df()
        assert list(got.itertuples(index=False, name=None)) == list(
            want.itertuples(index=False, name=None)
        )

    def test_segment_fewer_learnable_merges_and_null_text(self, ray_session):
        # regression (session-3 review): corpora supporting < `merges`
        # merges must still segment every doc, and NULL text counts 0
        import duckdb

        import ray.data as rd

        from commons_codec_ray.pipelines.queries import _BPE_SEGMENT_SQL
        from commons_codec_ray.stages.text import bpe_segment

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["ab ab", "ab", None], pa.string()),
            }
        )
        got = (
            bpe_segment(rd.from_arrow(t).repartition(2), merges=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", t)
        want = con.execute(_BPE_SEGMENT_SQL).df().sort_values("doc_id").reset_index(drop=True)
        assert got["n_tokens"].tolist() == want["n_tokens"].tolist() == [2, 1, 0]

    def test_bpe_fuzz_vs_duckdb_oracle(self, ray_session):
        # seeded fuzz: adversarial corpora (tabs, unicode spaces, empty
        # and NULL docs, repeated chars, multi-space runs) — engine
        # train AND segment must match the SQL oracle exactly
        import duckdb

        import ray.data as rd

        from commons_codec_ray.pipelines.queries import (
            _BPE_SEGMENT_SQL,
            _bpe_train_sql,
        )
        from commons_codec_ray.stages.text import bpe_segment, bpe_train

        rng = np.random.RandomState(42)
        alphabet = list("abcde") + ["\t", "é", "　"]
        for case in range(6):
            texts = []
            for _ in range(rng.randint(3, 12)):
                if rng.rand() < 0.15:
                    texts.append(None)
                    continue
                words = [
                    "".join(rng.choice(alphabet, rng.randint(1, 6)))
                    for _ in range(rng.randint(0, 8))
                ]
                sep = "  " if rng.rand() < 0.2 else " "
                texts.append(sep.join(words))
            t = pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
            con = duckdb.connect()
            con.register("documents", t)
            ds = rd.from_arrow(t).repartition(3)

            got_t = bpe_train(ds, merges=3).to_pandas()
            want_t = con.execute(_bpe_train_sql(3)).df()
            assert got_t.values.tolist() == want_t.values.tolist(), (case, texts)

            got_s = (
                bpe_segment(ds, merges=4)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            want_s = (
                con.execute(_BPE_SEGMENT_SQL)
                .df()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            assert got_s["n_tokens"].tolist() == want_s["n_tokens"].tolist(), (
                case,
                texts,
            )
