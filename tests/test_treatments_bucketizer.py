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
