"""Descriptor type-matrix tests (pattern: reference
tests/transform/test_dynamodb_types_vanilla.py / _cratedb.py)."""

import pytest

from commons_codec_ray.decode.dynamodb_types import (
    UnknownDescriptorError,
    deserialize,
    deserialize_image,
)


@pytest.mark.parametrize(
    "desc,expected",
    [
        ({"S": "hello"}, "hello"),
        ({"S": ""}, ""),  # empty string preserved, distinct from null
        ({"N": "42"}, 42.0),  # N → float (sink flavor)
        ({"N": "3.14"}, 3.14),
        ({"BOOL": True}, True),
        ({"BOOL": False}, False),
        ({"NULL": True}, None),
        ({"SS": ["a", "b"]}, ["a", "b"]),  # sets → lists
        ({"NS": ["1", "2.5"]}, [1.0, 2.5]),
        ({"BS": ["AQ==", "Ag=="]}, ["AQ==", "Ag=="]),
        ({"M": {"x": {"S": "y"}, "n": {"N": "1"}}}, {"x": "y", "n": 1.0}),
        ({"L": []}, []),
        ({"M": {}}, {}),
        ({"L": [{"S": "a"}, {"S": "b"}]}, ["a", "b"]),
        # nested depth
        ({"M": {"inner": {"M": {"deep": {"L": [{"N": "1"}]}}}}}, {"inner": {"deep": [1.0]}}),
    ],
)
def test_scalar_matrix(desc, expected):
    value, varied = deserialize(desc)
    assert value == expected
    assert varied is False


def test_varied_list_tagged():
    # mixed inner type markers → varied (→ aux routing downstream)
    value, varied = deserialize({"L": [{"S": "a"}, {"N": "1"}]})
    assert value == ["a", 1.0]
    assert varied is True


def test_homogeneous_list_not_varied():
    value, varied = deserialize({"L": [{"N": "1"}, {"N": "2"}]})
    assert varied is False


def test_unknown_marker_raises():
    with pytest.raises(UnknownDescriptorError):
        deserialize({"XX": "nope"})
    with pytest.raises(UnknownDescriptorError):
        deserialize({"S": "a", "N": "1"})  # two markers


def test_image_varied_routing():
    typed, varied = deserialize_image(
        {
            "pk": {"S": "k1"},
            "mixed": {"L": [{"S": "a"}, {"N": "2"}]},
            "plain": {"N": "7"},
        }
    )
    assert typed == {"pk": "k1", "plain": 7.0}
    assert varied == {"mixed": ["a", 2.0]}


def test_primary_key_schema_from_table():
    from commons_codec_ray.schemas import PrimaryKeySchema

    table = {
        "KeySchema": [
            {"AttributeName": "Id", "KeyType": "HASH"},
            {"AttributeName": "Range", "KeyType": "RANGE"},
        ],
        "AttributeDefinitions": [
            {"AttributeName": "Id", "AttributeType": "N"},
            {"AttributeName": "Range", "AttributeType": "S"},
        ],
    }
    pks = PrimaryKeySchema.from_table(table)
    assert pks.keys() == ["Id", "Range"]
    assert [str(f.type) for f in pks.arrow_fields()] == ["int64", "string"]
    assert pks.to_sql_ddl_clauses() == [
        '"Id" BIGINT PRIMARY KEY',
        '"Range" STRING PRIMARY KEY',
    ]


def test_primary_key_schema_rejects_unknown_type():
    from commons_codec_ray.schemas import PrimaryKeySchema

    try:
        PrimaryKeySchema().add("x", "Z")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


class TestDecimalMode:
    """numeric_mode='decimal' — the vanilla-boto3 lossless path
    (reference vendor/boto3/dynamodb/types.py:36-41) next to the
    CrateDB-flavored N→float default."""

    def test_n_keeps_38_digit_precision(self):
        import decimal

        from commons_codec_ray.decode.dynamodb_types import deserialize

        s = "1234567890123456789012345678.9012345678"[:39]  # 38 sig digits
        v, varied = deserialize({"N": s}, numeric_mode="decimal")
        assert isinstance(v, decimal.Decimal)
        assert str(v) == s
        assert not varied
        # float mode would corrupt this value
        f, _ = deserialize({"N": s})
        assert str(f) != s

    def test_ns_and_nested_follow_mode(self):
        import decimal

        from commons_codec_ray.decode.dynamodb_types import deserialize

        v, _ = deserialize({"NS": ["1.10", "2.20"]}, numeric_mode="decimal")
        assert v == [decimal.Decimal("1.10"), decimal.Decimal("2.20")]
        m, _ = deserialize(
            {"M": {"a": {"N": "0.30000000000000000000000000001"}}},
            numeric_mode="decimal",
        )
        assert str(m["a"]) == "0.30000000000000000000000000001"

    def test_image_decimal_mode(self):
        import decimal

        from commons_codec_ray.decode.dynamodb_types import deserialize_image

        typed, varied = deserialize_image(
            {"a": {"N": "42.5"}, "b": {"S": "x"}}, numeric_mode="decimal"
        )
        assert typed == {"a": decimal.Decimal("42.5"), "b": "x"}
        assert varied == {}

    def test_default_stays_float(self):
        from commons_codec_ray.decode.dynamodb_types import deserialize_image

        typed, _ = deserialize_image({"a": {"N": "42.5"}})
        assert isinstance(typed["a"], float)

    def test_overflow_traps(self):
        import decimal

        import pytest

        from commons_codec_ray.decode.dynamodb_types import deserialize

        with pytest.raises(decimal.Overflow):
            deserialize({"N": "1E200"}, numeric_mode="decimal")
