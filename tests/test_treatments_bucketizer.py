"""Treatment hooks + record bucketizer (pattern: reference
tests/transform/mongodb/test_mongodb_convert.py:185-282 and model tests)."""

from commons_codec_ray.decode.bucketizer import bucketize
from commons_codec_ray.decode.extended_json import decode_document
from commons_codec_ray.decode.treatments import Treatment


DOC = {
    "id": 1,
    "name": "x",
    "simple_list": [1, 2, 3],
    "complex_list": [{"a": 1, "b": [9]}, {"a": "two"}],
    "scalar": 42,
}


def test_ignore_complex_lists():
    out = Treatment(ignore_complex_lists=True)(dict(DOC))
    assert "complex_list" not in out
    assert out["simple_list"] == [1, 2, 3]


def test_normalize_complex_lists():
    out = Treatment(normalize_complex_lists=True)(dict(DOC))
    assert out["complex_list"][0] == {"a": 1, "b": "[9]"}  # non-scalar stringified
    assert out["complex_list"][1] == {"a": "two"}


def test_ignore_field_and_conversions():
    t = Treatment(
        ignore_field=["name"],
        convert_list=["scalar"],
        convert_string=["id"],
        convert_dict=["simple_list"],
    )
    out = t(dict(DOC))
    assert "name" not in out
    assert out["scalar"] == [42]
    assert out["id"] == "1"
    assert out["simple_list"] == {"value": [1, 2, 3]}  # already a list? wrapped as dict value


def test_treatment_slots_into_decode_document():
    doc = {"v": {"$numberLong": "7"}, "drop": "me"}
    out = decode_document(doc, treatment=Treatment(ignore_field=["drop"]))
    assert out == {"v": 7}


def test_treatment_all_options_reference_matrix():
    """Mirrors the reference's full convert/ignore matrix (reference
    tests/transform/mongodb/test_mongodb_convert.py:236-282): nested
    ignore, list/string wrapping, and wrapper-named dict conversion
    applied recursively, including inside lists of dicts."""
    data_in = {
        "_id": "56027fcae4b09385a85f9344",
        "ignore_toplevel": 42,
        "value": {"id": 42, "date": 1443004362000, "ignore_nested": 42},
        "to_list": 42,
        "to_string": 42,
        "to_dict_scalar": 42,
        "to_dict_list": [{"user": 42}],
    }
    t = Treatment(
        ignore_complex_lists=False,
        ignore_field=["ignore_toplevel", "ignore_nested"],
        convert_list=["to_list"],
        convert_string=["to_string"],
        convert_dict=[
            {"name": "to_dict_scalar", "wrapper_name": "id"},
            {"name": "user", "wrapper_name": "id"},
        ],
    )
    assert t(data_in) == {
        "_id": "56027fcae4b09385a85f9344",
        "value": {"id": 42, "date": 1443004362000},
        "to_list": [42],
        "to_string": "42",
        "to_dict_scalar": {"id": 42},
        "to_dict_list": [{"user": {"id": 42}}],
    }


def test_treatment_from_config_roundtrip_and_validation():
    import pytest

    cfg = {
        "ignore_field": ["secret"],
        "convert_dict": [{"name": "meta", "wrapper_name": "id"}],
        "convert_string": ["code"],
    }
    t = Treatment.from_config(cfg)
    assert t({"secret": 1, "meta": 7, "code": 404}) == {
        "meta": {"id": 7},
        "code": "404",
    }
    # config survives a JSON round-trip through to_config
    t2 = Treatment.from_config(t.to_config())
    assert t2({"secret": 1, "meta": 7, "code": 404}) == t({"secret": 1, "meta": 7, "code": 404})
    # typo'd keys fail loudly, never silently no-op
    with pytest.raises(ValueError, match="unknown treatment config keys"):
        Treatment.from_config({"ignore_feild": ["x"]})


def test_declarative_treatments_through_decode_stage():
    """Rules in the registry (plain JSON) are applied by DecodeEnvelopes
    per table — the per-table transform-config-in-manifest path."""
    import pyarrow as pa

    from commons_codec_ray.config import PipelineConfig, SchemaRegistry
    from commons_codec_ray.stages.decode_stage import DecodeEnvelopes

    reg = SchemaRegistry(
        treatments={
            "transcripts": {"ignore_field": ["secret"], "convert_string": ["tool"]}
        }
    )
    cfg = PipelineConfig(registry=reg)
    stage = DecodeEnvelopes(cfg, combine=False)
    payload = (
        '{"control": null, "data": {"conv_id": "c-1", "turn_idx": 0, "role": "user", '
        '"text": "hi", "tool": 7, "secret": "leak", "ts": "2024-01-01T00:00:00"}, '
        '"metadata": {"operation": "insert"}}'
    )
    batch = pa.table(
        {
            "payload": pa.array([payload]),
            "dialect": pa.array(["debezium"]),
            "lsn": pa.array([1], pa.int64()),
            "source_offset": pa.array([0], pa.int64()),
        }
    )
    out = stage(batch)
    assert out["tool"][0].as_py() == "7"  # convert_string applied
    aux = out["aux"][0].as_py()
    assert aux is None or "secret" not in aux  # ignore_field dropped it
    # registry JSON round-trip preserves the rules
    assert SchemaRegistry.from_json(reg.to_json()).treatments == reg.treatments


def test_bucketize_split():
    rec = {"conv_id": "c-1", "turn_idx": 3, "role": "user", "nested": {"x": 1}, "lst": [1]}
    out = bucketize(rec, ("conv_id", "turn_idx"), varied_fields={"mix": ["a", 1.0]})
    assert out["pk"] == {"conv_id": "c-1", "turn_idx": 3}
    assert out["typed"] == {"role": "user"}
    assert out["untyped"] == {"mix": ["a", 1.0], "nested": {"x": 1}, "lst": [1]}


def test_bucketize_empty_values():
    # empty string is typed (≠ null); empty list/map are untyped containers
    rec = {"k": 1, "empty_str": "", "none": None, "empty_list": [], "empty_map": {}}
    out = bucketize(rec, ("k",))
    assert out["typed"]["empty_str"] == ""
    assert out["typed"]["none"] is None
    assert out["untyped"] == {"empty_list": [], "empty_map": {}}
