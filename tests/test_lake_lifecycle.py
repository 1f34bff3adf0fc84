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
    removed = pipe.vacuum(keep_last=0)
    assert removed  # superseded epoch files gone
    # current state still fully readable and correct
    got = sorted_canonical(pa.Table.from_pandas(pipe.read_lake().to_pandas()))
    want = sorted_canonical(replay_envelopes(env))
    assert got.equals(want.cast(got.schema))
    # vacuum is idempotent
    assert pipe.vacuum(keep_last=0) == []


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
