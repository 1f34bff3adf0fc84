"""DynamoDB attribute-descriptor deserialization (fresh implementation).

Semantics match the reference's sink-flavored deserializer
(``CrateDBTypeDeserializer``, reference transform/dynamodb.py:28-68, over
the vendored boto3 deserializer vendor/boto3/dynamodb/types.py:82-144):

- ``S`` → str, ``BOOL`` → bool, ``NULL`` → None, ``B`` → bytes passthrough
- ``N`` → float by default (the reference coerces Decimal → float for the
  sink); ``numeric_mode="decimal"`` keeps the vanilla-boto3 lossless path
  instead — ``decimal.Decimal`` under a 38-digit context (the public
  DynamoDB number precision, vendor/boto3/dynamodb/types.py:36-41) for
  users who need exact numerics end-to-end.
- ``SS``/``NS``/``BS`` sets → lists (NS elements follow ``numeric_mode``)
- ``M`` → dict (recursive)
- ``L`` → list (recursive); a list whose inner descriptor TYPE MARKERS
  differ is tagged "varied" so the caller routes it to the untyped/aux
  bucket instead of a typed column (reference transform/dynamodb.py:44-68
  + model.py:171-172).

Returns ``(value, varied)`` where ``varied`` is only ever True for lists.
"""

from __future__ import annotations

import decimal
from typing import Any

_MARKERS = frozenset({"S", "N", "B", "BOOL", "NULL", "M", "L", "SS", "NS", "BS"})

# DynamoDB's documented number type: up to 38 significant digits. Clamped
# /Overflow/Underflow trap (reject silently-corrupting inputs); Rounded /
# Inexact allowed so over-precise inputs shrink to the service's 38-digit
# wire precision, matching what DynamoDB itself would have stored.
DYNAMODB_CONTEXT = decimal.Context(
    Emin=-128,
    Emax=126,
    prec=38,
    traps=[decimal.Clamped, decimal.Overflow, decimal.Underflow],
)


class UnknownDescriptorError(ValueError):
    pass


def _number(value, numeric_mode: str):
    if numeric_mode == "decimal":
        return DYNAMODB_CONTEXT.create_decimal(value)
    return float(value)


def deserialize(descriptor: dict, numeric_mode: str = "float") -> tuple[Any, bool]:
    if not isinstance(descriptor, dict) or len(descriptor) != 1:
        raise UnknownDescriptorError(f"not a type descriptor: {descriptor!r}")
    marker, value = next(iter(descriptor.items()))
    if marker == "S":
        return value, False
    if marker == "N":
        return _number(value, numeric_mode), False
    if marker == "BOOL":
        return bool(value), False
    if marker == "NULL":
        return None, False
    if marker == "B":
        return value, False  # passthrough (already bytes/base64 str)
    if marker == "SS":
        return list(value), False
    if marker == "NS":
        return [_number(v, numeric_mode) for v in value], False
    if marker == "BS":
        return list(value), False
    if marker == "M":
        return {k: deserialize(v, numeric_mode)[0] for k, v in value.items()}, False
    if marker == "L":
        inner_markers = set()
        out = []
        for item in value:
            if isinstance(item, dict) and len(item) == 1:
                inner_markers.add(next(iter(item.keys())))
            out.append(deserialize(item, numeric_mode)[0])
        # heterogeneous inner type markers → "varied" list → aux routing
        varied = len(inner_markers) > 1
        return out, varied
    raise UnknownDescriptorError(f"unknown DynamoDB type marker: {marker!r}")


def deserialize_image(
    image: dict, numeric_mode: str = "float"
) -> tuple[dict[str, Any], dict[str, Any]]:
    """Deserialize a full Keys/NewImage dict.

    Returns (typed, varied) dicts: ``varied`` holds attributes whose
    value was a mixed-type list (→ aux bucket downstream). Scalar
    markers (S/N/NULL/BOOL — the overwhelming majority in practice) are
    inlined here; nested/rare markers fall back to :func:`deserialize`.
    """
    typed: dict[str, Any] = {}
    varied: dict[str, Any] = {}
    lossless = numeric_mode == "decimal"
    for name, desc in image.items():
        if isinstance(desc, dict) and len(desc) == 1:
            marker, value = next(iter(desc.items()))
            if marker == "S":
                typed[name] = value
                continue
            if marker == "N":
                typed[name] = (
                    DYNAMODB_CONTEXT.create_decimal(value) if lossless else float(value)
                )
                continue
            if marker == "NULL":
                typed[name] = None
                continue
            if marker == "BOOL":
                typed[name] = bool(value)
                continue
        value, is_varied = deserialize(desc, numeric_mode)
        (varied if is_varied else typed)[name] = value
    return typed, varied
