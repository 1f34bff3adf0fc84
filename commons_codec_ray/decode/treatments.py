"""Value-treatment hooks — the user-extension surface of the decode stage.

Mirrors the reference's Tikray/Moksha treatment semantics exercised in
its converter tests (reference transform/mongodb.py:48,56-58,189-200;
tests/transform/mongodb/test_mongodb_convert.py:185-282):

- ``ignore_complex_lists``: drop list-of-dict fields entirely
- ``normalize_complex_lists``: for list-of-dict fields, stringify inner
  values whose types vary across the list (the varied-list idea applied
  one level down)
- ``convert_list``: wrap scalar values of named fields into lists
- ``convert_string``: stringify values of named fields
- ``convert_dict``: wrap scalar values of named fields into {"value": x}
- ``ignore_field``: drop named fields

``Treatment`` objects compose and are callables ``dict → dict``, so they
slot directly into ``decode_document(doc, treatment=...)`` and into the
decode stage config. They are plain picklable state — build once per
actor.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


def _is_complex_list(value: Any) -> bool:
    return isinstance(value, list) and any(isinstance(v, dict) for v in value)


@dataclass
class Treatment:
    ignore_complex_lists: bool = False
    normalize_complex_lists: bool = False
    ignore_field: list[str] = field(default_factory=list)
    convert_list: list[str] = field(default_factory=list)
    convert_string: list[str] = field(default_factory=list)
    convert_dict: list[str] = field(default_factory=list)

    def __call__(self, record: dict[str, Any]) -> dict[str, Any]:
        out: dict[str, Any] = {}
        for key, value in record.items():
            if key in self.ignore_field:
                continue
            if _is_complex_list(value):
                if self.ignore_complex_lists:
                    continue
                if self.normalize_complex_lists:
                    value = [self._normalize_item(v) for v in value]
            if key in self.convert_list and not isinstance(value, list):
                value = [value]
            if key in self.convert_string and not isinstance(value, str):
                value = str(value)
            if key in self.convert_dict and not isinstance(value, dict):
                value = {"value": value}
            out[key] = value
        return out

    @staticmethod
    def _normalize_item(item: Any) -> Any:
        if not isinstance(item, dict):
            return item
        # stringify inner values whose type varies across sibling keys —
        # conservative normalization: anything non-scalar → str
        return {
            k: (v if isinstance(v, (str, int, float, bool)) or v is None else str(v))
            for k, v in item.items()
        }
