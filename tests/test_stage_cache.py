"""Stage-cache fingerprinting: regenerated input data under the SAME
sf_dir name must never serve stale /tmp shards (ADVICE r3)."""

import time

import pyarrow as pa
import pyarrow.parquet as pq

from commons_codec_ray.pipelines.queries import _stage_dir


def test_stage_dir_changes_when_source_regenerated(tmp_path):
    src = tmp_path / "events.parquet"
    pq.write_table(pa.table({"a": [1, 2, 3]}), src)
    d1 = _stage_dir("ccr_test", str(tmp_path))
    d1b = _stage_dir("ccr_test", str(tmp_path))
    assert d1 == d1b  # stable while the source is unchanged
    time.sleep(0.01)
    pq.write_table(pa.table({"a": [1, 2, 3, 4]}), src)  # regenerate
    d2 = _stage_dir("ccr_test", str(tmp_path))
    assert d2 != d1  # fingerprint (size+mtime) busts the cache
    assert str(d2).startswith("/tmp/ccr_test/")
