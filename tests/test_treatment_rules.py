"""Path-targeted treatment rules — the declarative analog of the
reference's Tikray/Moksha jq expressions (reference
tests/transform/mongodb/test_mongodb_full.py:40-47: flatten,
prune_array_of_objects, to_object({"key": "id"}), to_array, tostring
applied at nested paths)."""

import pytest

from commons_codec_ray.decode.treatments import PathRule, Treatment


def _anomalies_doc():
    # mirrors the shape of the reference's RECORD_IN_ANOMALIES "python"
    # sub-document: every anomaly the jq rule set repairs
    return {
        "oid": "56027fcae4b09385a85f9344",
        "python": {
            "list_of_nested_list": [1, [2, [3, 4]], 5],
            "list_of_objects": [{"a": 1}, {"b": 2}],
            "to_dict": 42,
            "to_list": "scalar",
            "to_string": 99,
        },
    }


class TestReferenceJqMatrix:
    def test_full_anomalies_repair(self):
        t = Treatment(
            rules=[
                {"path": "python.list_of_nested_list", "op": "flatten"},
                {"path": "python.list_of_objects", "op": "prune_array_of_objects"},
                {"path": "python.to_dict", "op": "to_object", "key": "id"},
                {"path": "python.to_list", "op": "to_array"},
                {"path": "python.to_string", "op": "tostring"},
            ]
        )
        out = t(_anomalies_doc())
        assert out["python"] == {
            "list_of_nested_list": [1, 2, 3, 4, 5],
            "to_dict": {"id": 42},
            "to_list": ["scalar"],
            "to_string": "99",
        }
        assert out["oid"] == "56027fcae4b09385a85f9344"

    def test_rules_apply_inside_lists_of_dicts(self):
        # jq's `.[] |=`: an array of objects at an intermediate segment
        t = Treatment(rules=[{"path": "items.v", "op": "to_array"}])
        out = t({"items": [{"v": 1}, {"v": [2]}, {"other": 3}]})
        assert out["items"] == [{"v": [1]}, {"v": [2]}, {"other": 3}]

    def test_missing_path_is_noop(self):
        t = Treatment(rules=[{"path": "no.such.path", "op": "tostring"}])
        doc = {"a": 1}
        assert t(doc) == doc

    def test_to_object_wraps_list_elements(self):
        t = Treatment(rules=[{"path": "xs", "op": "to_object", "key": "user"}])
        assert t({"xs": [42, {"user": 1}]}) == {"xs": [{"user": 42}, {"user": 1}]}


class TestExtendedVerbs:
    def test_drop_rename_default(self):
        t = Treatment(
            rules=[
                {"path": "secret", "op": "drop"},
                {"path": "old_name", "op": "rename", "to": "new_name"},
                {"path": "lang", "op": "default", "value": "en"},
            ]
        )
        out = t({"secret": "x", "old_name": 7, "keep": True})
        assert out == {"new_name": 7, "keep": True, "lang": "en"}
        # default never overwrites an existing value
        assert t({"lang": "fr"})["lang"] == "fr"

    def test_rules_run_before_field_treatments(self):
        # rename first, then the field-level convert_string sees the NEW name
        t = Treatment(
            convert_string=["renamed"],
            rules=[{"path": "orig", "op": "rename", "to": "renamed"}],
        )
        assert t({"orig": 5}) == {"renamed": "5"}

    def test_nested_field_treatments_do_not_reapply_root_rules(self):
        # a root-anchored rule must not fire again on an inner dict that
        # happens to share the segment name
        t = Treatment(rules=[{"path": "v", "op": "to_array"}])
        out = t({"v": 1, "nested": {"v": 2}})
        assert out == {"v": [1], "nested": {"v": 2}}


class TestConfigRoundTrip:
    def test_registry_round_trip(self):
        cfg = {
            "ignore_field": ["junk"],
            "rules": [
                {"path": "a.b", "op": "to_object", "key": "id"},
                {"path": "c", "op": "rename", "to": "d"},
                {"path": "e", "op": "default", "value": 0},
            ],
        }
        t = Treatment.from_config(cfg)
        assert Treatment.from_config(t.to_config()).to_config() == t.to_config()

    def test_unknown_op_fails_loudly(self):
        with pytest.raises(ValueError, match="unknown treatment rule op"):
            PathRule(path="a", op="jq_eval")

    def test_unknown_rule_key_fails_loudly(self):
        with pytest.raises(ValueError, match="unknown treatment rule keys"):
            PathRule.from_config({"path": "a", "op": "drop", "expr": ".x"})

    def test_bad_path_fails_loudly(self):
        with pytest.raises(ValueError, match="bad treatment rule path"):
            PathRule(path="a..b", op="drop")


def test_rules_through_decode_document():
    """The full reference composition: Extended JSON decode with a
    rule-bearing treatment in the converter's transformation slot."""
    from commons_codec_ray.decode.extended_json import decode_document

    t = Treatment(
        rules=[
            {"path": "nested.vals", "op": "flatten"},
            {"path": "n", "op": "tostring"},
        ]
    )
    doc = {
        "n": {"$numberLong": "7"},
        "nested": {"vals": [[1, 2], [3]]},
    }
    assert decode_document(doc, treatment=t) == {
        "n": "7",
        "nested": {"vals": [1, 2, 3]},
    }
