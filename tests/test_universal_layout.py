"""UNIVERSAL record layout + JSON-in-string column re-parse
(reference's per-table mapping strategy, transform/aws_dms.py:86-115,
249-347, and decode_data, transform/aws_dms.py:207-224)."""

import json

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from commons_codec_ray.config import PipelineConfig
from commons_codec_ray.envelopes import EventsToEnvelopes
from commons_codec_ray.schemas import OP_SCHEMA_CHANGE
from commons_codec_ray.stages.applier import apply_ops_universal
from commons_codec_ray.stages.decode_stage import DecodeEnvelopes

SF_DIR = "/root/testdata/sf0.001"


def _ops(layout: str, **cfg_kw):
    events = pq.read_table(f"{SF_DIR}/events.parquet")
    env = EventsToEnvelopes(duplicates=False)(events)
    dec = DecodeEnvelopes(PipelineConfig(**cfg_kw), combine=False, layout=layout)
    return dec(env)


def test_universal_layout_matches_direct_semantics():
    direct = _ops("direct")
    universal = _ops("universal")
    assert universal.num_rows == direct.num_rows
    assert "data" in universal.column_names
    # typed columns are null in universal; the data JSON carries them
    du = universal.to_pylist()
    dd = direct.to_pylist()
    for u, d in zip(du[:200], dd[:200]):
        assert u["conv_id"] == d["conv_id"] and u["turn_idx"] == d["turn_idx"]
        assert u["role"] is None
        if u["data"] is not None:
            doc = json.loads(u["data"])
            assert doc.get("role") == d["role"]
            assert doc.get("text") == d["text"]


def test_universal_apply_lww():
    universal = _ops("universal")
    data = universal.filter(pc.less(universal["op"], pa.scalar(OP_SCHEMA_CHANGE, pa.int8())))
    out = apply_ops_universal(None, data)
    assert set(out.column_names) == {"conv_id", "turn_idx", "data", "aux", "_lsn"}
    # apply twice over its own output is a no-op
    again = apply_ops_universal(out, data)
    a = out.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    b = again.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert a.equals(b)
    # full-doc overwrite: winning doc equals the direct-layout winner
    direct = _ops("direct")
    from commons_codec_ray.stages.applier import apply_ops_to_base, final_state

    ddata = direct.filter(pc.less(direct["op"], pa.scalar(OP_SCHEMA_CHANGE, pa.int8())))
    dfinal = final_state(apply_ops_to_base(None, ddata)).to_pylist()
    udocs = {
        (r["conv_id"], r["turn_idx"]): json.loads(r["data"]) for r in out.to_pylist()
    }
    assert len(udocs) == len(dfinal)
    for r in dfinal[:200]:
        doc = udocs[(r["conv_id"], r["turn_idx"])]
        assert doc.get("text") == r["text"] and doc.get("role") == r["role"]


def test_object_column_reparse():
    # a column registered as OBJECT arriving as a JSON string is re-parsed
    cfg = PipelineConfig()
    cfg.registry.column_types["transcripts"]["meta"] = "OBJECT"
    payload = {
        "data": {"conv_id": "c-1", "turn_idx": 0, "role": "user", "text": "x",
                 "tool": None, "ts": "2024-01-01T00:00:00",
                 "meta": '{"nested": {"a": 1}}'},
        "before-image": {},
        "metadata": {"operation": "insert", "record-type": "data",
                     "schema-name": "public", "table-name": "transcripts"},
    }
    env = pa.table(
        {
            "lsn": pa.array([0], pa.int64()),
            "source_offset": pa.array([0], pa.int64()),
            "dialect": pa.array(["debezium"]),
            "payload": pa.array([json.dumps(payload)]),
            "conv_id": pa.array(["c-1"]),
        }
    )
    dec = DecodeEnvelopes(cfg, combine=False)
    [row] = dec(env).to_pylist()
    aux = json.loads(row["aux"])
    assert aux["meta"] == {"nested": {"a": 1}}  # parsed, not a raw string
