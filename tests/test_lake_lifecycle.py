"""Time travel, vacuum, metrics/lag over the committed lake."""

import pyarrow as pa
import pyarrow.parquet as pq

from commons_codec_ray.config import PipelineConfig
from commons_codec_ray.envelopes import EventsToEnvelopes
from commons_codec_ray.pipelines.cdc import CDCPipeline
from commons_codec_ray.pipelines.oracle import replay_envelopes, sorted_canonical

SF_DIR = "/root/testdata/sf0.001"


def _build(tmp_path, epoch_size=300):
    events = pq.read_table(f"{SF_DIR}/events.parquet")
    env = EventsToEnvelopes(duplicates=False)(events).sort_by("lsn")
    log = tmp_path / "env.parquet"
    pq.write_table(env, log, row_group_size=100)
    pipe = CDCPipeline(tmp_path / "lake", PipelineConfig(num_partitions=8, epoch_size=epoch_size))
    pipe.replay(str(log))
    return pipe, env


def test_time_travel_reads_past_epoch(tmp_path):
    pipe, env = _build(tmp_path)
    # state as of epoch 0 == oracle replay of offsets [0, 300)
    got = sorted_canonical(
        pa.Table.from_pandas(pipe.read_lake(epoch=0).to_pandas())
    )
    first = env.filter(pa.compute.less(env["source_offset"], 300))
    want = sorted_canonical(replay_envelopes(first))
    assert got.equals(want.cast(got.schema))
    # current state == full replay
    got_now = sorted_canonical(pa.Table.from_pandas(pipe.read_lake().to_pandas()))
    want_now = sorted_canonical(replay_envelopes(env))
    assert got_now.equals(want_now.cast(got_now.schema))


def test_vacuum_bounds_history_keeps_current(tmp_path):
    pipe, env = _build(tmp_path)
    res = pipe.vacuum(keep_last=0)
    assert res["orphans_removed"] > 0  # superseded epoch files gone
    assert res["bytes_reclaimed"] > 0
    # current state still fully readable and correct
    got = sorted_canonical(pa.Table.from_pandas(pipe.read_lake().to_pandas()))
    want = sorted_canonical(replay_envelopes(env))
    assert got.equals(want.cast(got.schema))
    # vacuum is idempotent
    assert pipe.vacuum(keep_last=0)["orphans_removed"] == 0


def test_metrics_and_lag(tmp_path):
    pipe, env = _build(tmp_path)
    m = pipe.metrics()
    assert m["last_epoch"] >= 2
    assert m["events_total"] > 0
    assert m["events_per_s_overall"] > 0
    assert len(m["epochs"]) == m["last_epoch"] + 1
    assert all(e["offset_range"] for e in m["epochs"])
    # lag: fully caught up vs a source that advanced
    assert pipe.lag(source_max_offset=int(m["next_offset"])) == 0
    assert pipe.lag(source_max_offset=int(m["next_offset"]) + 500) == 500


def test_offline_compact_folds_chains(tmp_path):
    from commons_codec_ray.sink.manifest import entry_files

    events = pq.read_table(f"{SF_DIR}/events.parquet")
    env = EventsToEnvelopes(duplicates=False)(events).sort_by("lsn")
    log = tmp_path / "env.parquet"
    pq.write_table(env, log, row_group_size=100)
    # inline auto-compaction disabled so offline compact() has chains
    pipe = CDCPipeline(
        tmp_path / "lake",
        PipelineConfig(num_partitions=8, epoch_size=200, sink_mode="delta",
                       compact_ratio=1e9, compact_max_deltas=10**6),
    )
    pipe.replay(str(log))
    before = pipe.checkpoint()
    assert any(entry_files(e)[1] for e in before.partitions.values())
    want = sorted_canonical(replay_envelopes(env))

    res = pipe.compact()
    assert not res["skipped"] and res["partitions_compacted"] > 0
    assert res["files_after"] < res["files_before"]
    after = pipe.checkpoint()
    # zero-width maintenance epoch: cursor unchanged, epoch advanced
    assert after.next_offset == before.next_offset
    assert after.last_epoch == before.last_epoch + 1
    # every chain folded to one full file; merge-on-read == compacted
    for key, entry in after.partitions.items():
        assert entry_files(entry)[1] == [], key
    got = sorted_canonical(pa.Table.from_pandas(pipe.read_lake().to_pandas()))
    assert got.equals(want.cast(got.schema))
    # idempotent: nothing left to fold
    assert pipe.compact()["skipped"] is True
    # superseded base+delta files reclaimable; current state intact
    assert pipe.vacuum(keep_last=0)["orphans_removed"] > 0
    got2 = sorted_canonical(pa.Table.from_pandas(pipe.read_lake().to_pandas()))
    assert got2.equals(want.cast(got2.schema))
    # tailing resumes as if nothing happened: re-replay is a no-op
    pipe2 = CDCPipeline(
        tmp_path / "lake",
        PipelineConfig(num_partitions=8, epoch_size=200, sink_mode="delta"),
    )
    pipe2.replay(str(log))
    got3 = sorted_canonical(pa.Table.from_pandas(pipe2.read_lake().to_pandas()))
    assert got3.equals(want.cast(got3.schema))
    # metrics surface still folds cleanly over the maintenance epoch
    m = pipe2.metrics()
    assert m["next_offset"] == after.next_offset
