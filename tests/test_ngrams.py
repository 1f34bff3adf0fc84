"""Token n-gram operators: decontamination, duplicated spans, chunking,
repetition signals (stages/ngrams.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from commons_codec_ray.stages import ngrams


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


class TestNgramHashes:
    def test_window_count(self):
        H, starts, m = ngrams.ngram_hashes(pa.array(["a b c d", "x y", ""]), 3)
        assert list(m) == [2, 1, 1]  # 4 toks → 2 windows; short docs → 1
        assert list(starts) == [0, 2, 3]
        assert len(H) == 4

    def test_identical_texts_share_hashes(self):
        H, _, _ = ngrams.ngram_hashes(pa.array(["p q r s", "p q r s"]), 3)
        assert H[0] == H[2] and H[1] == H[3]

    def test_case_and_whitespace_insensitive(self):
        a, _, _ = ngrams.ngram_hashes(pa.array(["Foo  Bar baz"]), 2)
        b, _, _ = ngrams.ngram_hashes(pa.array(["foo bar BAZ"]), 2)
        assert list(a) == list(b)

    def test_order_sensitive(self):
        H, _, _ = ngrams.ngram_hashes(pa.array(["a b", "b a"]), 2)
        assert H[0] != H[1]

    def test_no_cross_doc_windows(self):
        # windows never read a neighbor document's tokens: doc0's last
        # window must not equal a window built over (c, x)
        joint, _, _ = ngrams.ngram_hashes(pa.array(["b c x y"]), 2)
        split, _, m = ngrams.ngram_hashes(pa.array(["b c", "x y"]), 2)
        assert joint[1] not in split  # the (c, x) window

    def test_eval_hashes_sorted_unique(self):
        ev = ngrams.eval_ngram_hashes(["a b c", "a b c"], 2)
        assert list(ev) == sorted(set(ev))


class TestDecontaminate:
    def test_drops_only_overlapping_docs(self, ray_session):
        corpus = _ds(
            [
                (1, "alpha beta gamma delta epsilon"),
                (2, "zeta eta theta iota kappa"),
                (3, "one two three four five"),
            ]
        )
        ev = ray.put(ngrams.eval_ngram_hashes(["zeta eta theta iota kappa tail"], 3))
        out = ngrams.decontaminate(corpus, ev, n=3).to_pandas()
        assert sorted(out["doc_id"]) == [1, 3]

    def test_invert_returns_contaminated(self, ray_session):
        corpus = _ds([(1, "a b c d"), (2, "p q r s")])
        ev = ray.put(ngrams.eval_ngram_hashes(["x a b c y"], 3))
        out = ngrams.decontaminate(corpus, ev, n=3, invert=True).to_pandas()
        assert list(out["doc_id"]) == [1]

    def test_short_eval_doc_matches_itself(self, ray_session):
        # an eval doc with < n tokens still contaminates its own copy
        corpus = _ds([(1, "tiny doc"), (2, "long clean document here")])
        ev = ray.put(ngrams.eval_ngram_hashes(["tiny doc"], 13))
        out = ngrams.decontaminate(corpus, ev, n=13).to_pandas()
        assert list(out["doc_id"]) == [2]

    def test_empty_eval_set_keeps_all(self, ray_session):
        corpus = _ds([(1, "a b c"), (2, "d e f")])
        ev = ray.put(np.array([], dtype=np.uint64))
        out = ngrams.decontaminate(corpus, ev, n=3).to_pandas()
        assert sorted(out["doc_id"]) == [1, 2]


class TestDuplicatedSpans:
    def test_shared_span_flags_both(self, ray_session):
        shared = "w1 w2 w3 w4 w5"
        corpus = _ds(
            [
                (1, f"a b c {shared}"),
                (2, f"{shared} x y z"),
                (3, "totally unrelated words here now"),
            ]
        )
        out = ngrams.duplicated_span_docs(corpus, window=5).to_pandas()
        assert sorted(out["doc_id"]) == [1, 2]

    def test_within_doc_repeat_not_flagged(self, ray_session):
        corpus = _ds(
            [
                (1, "r1 r2 r3 r1 r2 r3"),  # repeated span, same doc
                (2, "c1 c2 c3 c4 c5 c6"),
            ]
        )
        out = ngrams.duplicated_span_docs(corpus, window=3).to_pandas()
        assert len(out) == 0

    def test_exact_short_duplicates_flagged_via_fallback(self, ray_session):
        corpus = _ds([(1, "same tiny"), (2, "same tiny"), (3, "other text")])
        out = ngrams.duplicated_span_docs(corpus, window=50).to_pandas()
        assert sorted(out["doc_id"]) == [1, 2]

    def test_bucket_count_invariance(self, ray_session):
        rows = [(i, f"s{i} t{i} u{i} v{i} w{i} shared1 shared2 shared3") for i in range(20)]
        a = ngrams.duplicated_span_docs(_ds(rows), window=3, num_buckets=4).to_pandas()
        b = ngrams.duplicated_span_docs(_ds(rows), window=3, num_buckets=64).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"]) == list(range(20))


class TestChunkTokens:
    def test_chunks_match_token_slices(self, ray_session):
        text = " ".join(f"t{i}" for i in range(10))
        out = (
            ngrams.chunk_tokens(_ds([(7, text)]), chunk=4, stride=3)
            .to_pandas()
            .sort_values("chunk_idx")
        )
        toks = text.split(" ")
        assert list(out["chunk_idx"]) == [0, 1, 2, 3]
        for _, r in out.iterrows():
            s = int(r["chunk_idx"]) * 3
            assert r["chunk_text"] == " ".join(toks[s : s + 4])
            assert r["n_tokens"] == len(toks[s : s + 4])

    def test_exact_multiple_no_empty_tail(self, ray_session):
        # 6 tokens, stride 3, chunk 3 → starts 0 and 3 only
        out = ngrams.chunk_tokens(_ds([(1, "a b c d e f")]), chunk=3, stride=3).to_pandas()
        assert sorted(out["chunk_idx"]) == [0, 1]
        assert set(out["n_tokens"]) == {3}

    def test_short_doc_single_chunk(self, ray_session):
        out = ngrams.chunk_tokens(_ds([(1, "only two")]), chunk=32, stride=24).to_pandas()
        assert len(out) == 1
        assert out.iloc[0]["chunk_text"] == "only two"
        assert out.iloc[0]["n_tokens"] == 2

    def test_unicode_offsets(self, ray_session):
        # multi-byte code points: char offsets must be code-point counts
        out = ngrams.chunk_tokens(
            _ds([(1, "héllo wörld ünïcode ok")]), chunk=2, stride=2
        ).to_pandas().sort_values("chunk_idx")
        assert list(out["chunk_text"]) == ["héllo wörld", "ünïcode ok"]


class TestRepSignals:
    def test_counts(self):
        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a b a b a", "x y z"], pa.string()),
            }
        )
        out = ngrams.rep_signals_batch(t).to_pandas().set_index("doc_id")
        assert out.loc[1, "n_tokens"] == 5
        assert out.loc[1, "n_distinct"] == 2
        assert out.loc[1, "top_token"] == 3  # 'a' ×3
        assert out.loc[1, "top_bigram"] == 2  # 'a b' ×2
        assert out.loc[2, "n_tokens"] == 3
        assert out.loc[2, "top_bigram"] == 1

    def test_single_token_doc_has_zero_bigrams(self):
        t = pa.table(
            {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["solo"], pa.string())}
        )
        out = ngrams.rep_signals_batch(t).to_pandas()
        assert out.iloc[0]["top_bigram"] == 0
        assert out.iloc[0]["top_token"] == 1

    def test_bigrams_do_not_cross_docs(self):
        # doc1 ends 'p', doc2 starts 'q' — the cross pair must not count
        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["o p", "q r"], pa.string()),
            }
        )
        out = ngrams.rep_signals_batch(t).to_pandas().set_index("doc_id")
        assert out.loc[1, "top_bigram"] == 1
        assert out.loc[2, "top_bigram"] == 1


class TestRemoveDuplicatedSpans:
    def test_shared_span_cut_from_both(self, ray_session):
        shared = "w1 w2 w3 w4"
        corpus = _ds(
            [
                (1, f"a b c {shared} d e"),
                (2, f"x y {shared} z"),
                (3, "clean doc stays whole here"),
            ]
        )
        out = (
            ngrams.remove_duplicated_spans(corpus, window=4)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[1, "clean_text"] == "a b c d e"
        assert out.loc[2, "clean_text"] == "x y z"
        assert out.loc[3, "clean_text"] == "clean doc stays whole here"
        assert out.loc[1, "n_kept"] == 5
        # doc1 kept positions: 0,1,2,7,8
        assert out.loc[1, "kept_pos_sum"] == 0 + 1 + 2 + 7 + 8

    def test_overlapping_windows_merge_extents(self, ray_session):
        # 5 shared tokens, window 4 → two overlapping dup windows per
        # doc; the mask must union them, not double-cut
        shared = "s1 s2 s3 s4 s5"
        corpus = _ds([(1, f"{shared} tail1"), (2, f"head2 {shared}")])
        out = (
            ngrams.remove_duplicated_spans(corpus, window=4)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[1, "clean_text"] == "tail1"
        assert out.loc[2, "clean_text"] == "head2"

    def test_within_doc_repeat_not_cut(self, ray_session):
        corpus = _ds([(1, "r1 r2 r1 r2"), (2, "c1 c2 c3 c4")])
        out = (
            ngrams.remove_duplicated_spans(corpus, window=2)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[1, "clean_text"] == "r1 r2 r1 r2"

    def test_fully_duplicate_doc_becomes_empty(self, ray_session):
        corpus = _ds([(1, "all same text"), (2, "all same text")])
        out = (
            ngrams.remove_duplicated_spans(corpus, window=3)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[1, "clean_text"] == "" and out.loc[1, "n_kept"] == 0
        assert out.loc[2, "clean_text"] == "" and out.loc[2, "n_kept"] == 0

    def test_case_preserved_in_output(self, ray_session):
        # hashing lowercases (UPPER copy matches) but output keeps case
        corpus = _ds([(1, "Keep Me safe a b c"), (2, "keep me SAFE x y z")])
        out = (
            ngrams.remove_duplicated_spans(corpus, window=3)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[1, "clean_text"] == "a b c"
        assert out.loc[2, "clean_text"] == "x y z"

    def test_bucket_count_invariance(self, ray_session):
        rows = [(i, f"u{i} v{i} shared1 shared2 shared3 w{i}") for i in range(12)]
        a = (
            ngrams.remove_duplicated_spans(_ds(rows), window=3, num_buckets=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            ngrams.remove_duplicated_spans(_ds(rows), window=3, num_buckets=64)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


def test_top_bigrams_exact_vs_bruteforce(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from commons_codec_ray.stages.text import top_bigrams

    rng = np.random.RandomState(13)
    vocab = np.array([f"w{i}" for i in range(12)])
    docs = [" ".join(rng.choice(vocab, rng.randint(1, 30))) for _ in range(400)]
    docs += ["solo"]  # single-token doc contributes no bigram
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)})).repartition(7)
    got = top_bigrams(ds, k=15, num_buckets=8).to_pandas()

    allb = []
    for d in docs:
        t = d.split(" ")
        allb += [f"{a} {b}" for a, b in zip(t, t[1:])]
    want = (
        pd.Series(allb)
        .value_counts()
        .rename_axis("bg")
        .reset_index(name="c")
        .sort_values(["c", "bg"], ascending=[False, True])
        .head(15)
        .reset_index(drop=True)
    )
    assert got["bg"].tolist() == want["bg"].tolist()
    assert got["c"].tolist() == want["c"].tolist()
