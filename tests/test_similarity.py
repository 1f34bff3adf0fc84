"""ANN variants: brute force is the exactness baseline (oracle-checked in
queries); LSH and IVF are approximate scale paths — assert recall here."""

import numpy as np
import ray.data as rd

from commons_codec_ray.stages.similarity import ann_topk, ivf_topk, lsh_topk

SF_DIR = "/root/testdata/sf0.01"
QUERIES = [0, 1, 2]


def _topk_sets(df, k=10):
    out = {}
    for qid, g in df.groupby("query_id"):
        out[qid] = set(g.nlargest(k, "score")["vec_id"])
    return out


def test_ivf_recall_vs_brute_force():
    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = _topk_sets(ann_topk(ds, QUERIES, k=10, round_to=None).to_pandas())
    approx = _topk_sets(ivf_topk(ds, QUERIES, k=10, n_clusters=16, nprobe=6).to_pandas())
    recalls = [len(exact[q] & approx.get(q, set())) / 10 for q in exact]
    # nprobe=6/16 clusters: expect high but not perfect recall
    assert np.mean(recalls) >= 0.6, recalls


def test_ivf_deterministic():
    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    a = _topk_sets(ivf_topk(ds, QUERIES, k=10).to_pandas())
    b = _topk_sets(ivf_topk(ds, QUERIES, k=10).to_pandas())
    assert a == b  # seeded k-means + deterministic scan


def test_lsh_returns_reasonable_neighbors():
    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = _topk_sets(ann_topk(ds, QUERIES, k=10, round_to=None).to_pandas())
    lsh = _topk_sets(lsh_topk(ds, QUERIES, k=10, bits=4).to_pandas())
    # single-probe LSH on RANDOM vectors has genuinely weak recall (no
    # cluster structure to exploit) — assert the structural properties:
    # each query finds itself (identical vector → identical bucket) and
    # some true neighbors surface overall
    for q in QUERIES:
        assert q in lsh.get(q, set())
    recalls = [len(exact[q] & lsh.get(q, set())) / 10 for q in exact]
    assert np.mean(recalls) >= 0.1, recalls


def test_embed_pairs_empty_bucket_no_duplicates(tmp_path):
    """Regression: an off-diagonal bucket-pair group whose second bucket
    is EMPTY must not re-emit the non-empty bucket's intra pairs (all
    vec_ids below share residue 0 mod 8, leaving 7 buckets empty)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from commons_codec_ray.pipelines.queries import q_embed_pairs

    vec = [1.0, 0.0, 0.0, 0.0]
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 8, 16], pa.int64()),
            "embedding": pa.array([vec, vec, vec], pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    out = q_embed_pairs(str(tmp_path)).to_pandas()
    pairs = sorted(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert pairs == [(0, 8), (0, 16), (8, 16)]  # each exactly once
