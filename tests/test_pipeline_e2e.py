"""End-to-end pipeline tests: replay → lake → byte-equality vs the
single-process oracle; exactly-once across simulated crash/resume.
(Pattern: reference integration tests tests/transform/test_dynamodb_full.py:112-136
+ the replay-twice idempotence test at test_dynamodb_cdc.py:365-369.)"""

import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from commons_codec_ray.config import PipelineConfig
from commons_codec_ray.envelopes import EventsToEnvelopes
from commons_codec_ray.pipelines.cdc import CDCPipeline
from commons_codec_ray.pipelines.oracle import replay_envelopes, sorted_canonical

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def envelope_log(tmp_path_factory):
    """Deterministic envelope parquet derived from the events table."""
    out = tmp_path_factory.mktemp("envlog") / "envelopes.parquet"
    events = pq.read_table(f"{SF_DIR}/events.parquet")
    env = EventsToEnvelopes(duplicates=True)(events)
    env = env.sort_by("lsn")
    pq.write_table(env, out, row_group_size=200)
    return str(out)


def run_full(lake_dir, envelope_log, epoch_size=300):
    cfg = PipelineConfig(num_partitions=16, epoch_size=epoch_size)
    pipe = CDCPipeline(lake_dir, cfg)
    results = pipe.replay(envelope_log, epoch_size=epoch_size)
    return pipe, results


def canonical(tbl: pa.Table) -> pa.Table:
    return sorted_canonical(tbl.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"]))


def test_replay_matches_oracle(tmp_path, envelope_log):
    pipe, results = run_full(tmp_path / "lake", envelope_log)
    assert len(results) >= 3  # multiple epochs exercised
    got = canonical(pa.Table.from_pandas(pipe.read_lake().to_pandas()))
    want = canonical(replay_envelopes(pq.read_table(envelope_log)))
    assert got.num_rows == want.num_rows
    # byte-equality of per-turn text under stable ordering (BASELINE.json:14-15)
    assert got.equals(want.cast(got.schema))


def test_resume_after_partial_run_matches_uninterrupted(tmp_path, envelope_log):
    # uninterrupted run
    pipe_a, _ = run_full(tmp_path / "lake_a", envelope_log)
    # interrupted: stop after ~half the offsets (simulated crash), then resume
    lake_b = tmp_path / "lake_b"
    cfg = PipelineConfig(num_partitions=16, epoch_size=300)
    pipe_b1 = CDCPipeline(lake_b, cfg)
    pipe_b1.replay(envelope_log, epoch_size=300, max_offset=499)
    ck_mid = pipe_b1.checkpoint()
    assert 0 <= ck_mid.last_epoch < 3
    # fresh pipeline object = fresh process state; resumes from checkpoint
    pipe_b2 = CDCPipeline(lake_b, PipelineConfig(num_partitions=16, epoch_size=300))
    results = pipe_b2.replay(envelope_log, epoch_size=300)
    assert all(not r.get("skipped") for r in results)
    got_a = canonical(pa.Table.from_pandas(pipe_a.read_lake().to_pandas()))
    got_b = canonical(pa.Table.from_pandas(pipe_b2.read_lake().to_pandas()))
    assert got_a.equals(got_b)


def test_replaying_committed_epoch_is_skipped(tmp_path, envelope_log):
    pipe, results = run_full(tmp_path / "lake", envelope_log)
    ck = pipe.checkpoint()
    env = rd.read_parquet(envelope_log)
    again = pipe.run_epoch(env, epoch=0, offset_range=(0, 300))
    assert again["skipped"] is True
    assert pipe.checkpoint().last_epoch == ck.last_epoch


def test_uncommitted_staging_is_overwritten_on_resume(tmp_path, envelope_log):
    """Crash between staging write and checkpoint commit: the epoch dir
    exists but CHECKPOINT doesn't know it → resume rewrites it."""
    lake = tmp_path / "lake"
    cfg = PipelineConfig(num_partitions=16, epoch_size=300)
    pipe = CDCPipeline(lake, cfg)
    pipe.replay(envelope_log, epoch_size=300, max_offset=299)  # commit epoch 0
    ck = pipe.checkpoint()
    assert ck.last_epoch == 0
    # simulate a crash mid-epoch-1: stage some files without committing
    fake = pipe.store.partition_file(1, 3)
    fake.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.table({"conv_id": pa.array(["junk"])}), fake)
    # resume: epoch 1 re-runs and overwrites the junk
    pipe2 = CDCPipeline(lake, PipelineConfig(num_partitions=16, epoch_size=300))
    pipe2.replay(envelope_log, epoch_size=300)
    got = canonical(pa.Table.from_pandas(pipe2.read_lake().to_pandas()))
    want = canonical(replay_envelopes(pq.read_table(envelope_log)))
    assert got.equals(want.cast(got.schema))


def test_lineage_manifest_contents(tmp_path, envelope_log):
    pipe, results = run_full(tmp_path / "lake", envelope_log)
    m = pipe.store.read_manifest(0)
    assert m["offset_range"] == [0, 300]
    assert m["metrics"]["events"] > 0
    for pid, info in m["files"].items():
        p = pipe.store.root / info["path"]
        assert p.exists()
        assert pq.read_metadata(p).num_rows == info["rows"]


def test_dead_letters_written(tmp_path):
    events = pq.read_table(f"{SF_DIR}/events.parquet")
    env = EventsToEnvelopes(duplicates=False, corrupt=True)(events).sort_by("lsn")
    log = tmp_path / "envelopes.parquet"
    pq.write_table(env, log)
    pipe = CDCPipeline(tmp_path / "lake", PipelineConfig(num_partitions=8, epoch_size=10_000))
    [res] = pipe.replay(str(log))
    n_corrupt = sum(1 for e in events["event_id"].to_pylist() if e % 97 == 13)
    assert res["dead_letters"] == n_corrupt
    dl = rd.read_parquet(str(pipe.store.dead_letter_dir(0))).to_pandas()
    assert len(dl) == n_corrupt
    assert set(dl.columns) == {"lsn", "source_offset", "aux", "error"}


@pytest.mark.parametrize("dialect", ["maxwell", "canal"])
def test_new_dialect_replay_equals_debezium(tmp_path, dialect):
    # the SAME logical stream encoded as Maxwell/Canal envelopes must
    # produce a lake byte-equal to the Debezium encoding's lake — the
    # round trip is lossless per dialect (incl. Canal's all-string
    # cells recovered via sqlType)
    events = pq.read_table(f"{SF_DIR}/events.parquet")
    lakes = {}
    for d in ("debezium", dialect):
        env = EventsToEnvelopes(dialect=d, duplicates=True)(events).sort_by("lsn")
        log = tmp_path / f"env_{d}.parquet"
        pq.write_table(env, log, row_group_size=200)
        pipe, _ = run_full(tmp_path / f"lake_{d}", str(log))
        lakes[d] = canonical(pa.Table.from_pandas(pipe.read_lake().to_pandas()))
    assert lakes[dialect].num_rows == lakes["debezium"].num_rows
    assert lakes[dialect].equals(lakes["debezium"].cast(lakes[dialect].schema))


def test_log_compaction_upserts_equal_replayed_lake(ray_session):
    """Cross-query invariant: the compacted changelog restricted to
    op=1 must carry exactly the replayed lake's rows (compaction is
    the topic-side view of the same LWW state; tombstones are the
    only difference)."""
    from commons_codec_ray.pipelines.queries import q_cdc_log_compaction, q_cdc_replay

    sf = "/root/testdata/sf0.001"
    comp = q_cdc_log_compaction(sf).to_pandas()
    lake = q_cdc_replay(sf).to_pandas()
    up = comp[comp["op"] == 1][["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    key = ["conv_id", "turn_idx"]
    up = up.sort_values(key, kind="mergesort").reset_index(drop=True)
    lk = lake[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    lk = lk.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert up.equals(lk)
