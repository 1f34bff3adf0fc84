"""Value-treatment hooks — the user-extension surface of the decode stage.

Mirrors the reference's Tikray/Moksha treatment semantics exercised in
its converter tests (reference transform/mongodb.py:48,56-58,189-200;
tests/transform/mongodb/test_mongodb_convert.py:159-282):

- ``ignore_complex_lists``: drop list-of-dict fields entirely
- ``normalize_complex_lists``: for list-of-dict fields, stringify inner
  values whose types vary across the list (the varied-list idea applied
  one level down)
- ``ignore_field``: drop named fields AT ANY NESTING LEVEL (the
  reference matrix drops both ``ignore_toplevel`` and the nested
  ``value.ignore_nested``)
- ``convert_list``: wrap scalar values of named fields into lists
- ``convert_string``: stringify values of named fields
- ``convert_dict``: wrap non-dict values of named fields into
  ``{wrapper_name: value}`` — entries are either plain field names
  (wrapper ``"value"``) or ``{"name": ..., "wrapper_name": ...}`` as in
  the reference; applies at any nesting level including inside lists of
  dicts (``to_dict_list: [{"user": 42}] → [{"user": {"id": 42}}]``)

``Treatment`` objects compose and are callables ``dict → dict``, so they
slot directly into ``decode_document(doc, treatment=...)`` and into the
decode stage config. They are plain picklable state — build once per
actor.

Declarative form: per-table treatment RULES live in the schema registry
as plain JSON (``SchemaRegistry.treatments``) and are loaded with
:meth:`Treatment.from_config`, so transform config travels with the
checkpointed registry instead of code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


def _is_complex_list(value: Any) -> bool:
    return isinstance(value, list) and any(isinstance(v, dict) for v in value)


_CONFIG_KEYS = frozenset(
    (
        "ignore_complex_lists",
        "normalize_complex_lists",
        "ignore_field",
        "convert_list",
        "convert_string",
        "convert_dict",
    )
)


@dataclass
class Treatment:
    ignore_complex_lists: bool = False
    normalize_complex_lists: bool = False
    ignore_field: list[str] = field(default_factory=list)
    convert_list: list[str] = field(default_factory=list)
    convert_string: list[str] = field(default_factory=list)
    # entries: "name" (wrapper "value") or {"name": ..., "wrapper_name": ...}
    convert_dict: list[Any] = field(default_factory=list)

    def __post_init__(self) -> None:
        self._ignore = frozenset(self.ignore_field)
        self._to_list = frozenset(self.convert_list)
        self._to_string = frozenset(self.convert_string)
        wrappers: dict[str, str] = {}
        for entry in self.convert_dict:
            if isinstance(entry, dict):
                wrappers[entry["name"]] = entry.get("wrapper_name", "value")
            else:
                wrappers[str(entry)] = "value"
        self._dict_wrappers = wrappers

    @classmethod
    def from_config(cls, cfg: dict[str, Any]) -> "Treatment":
        """Build from a plain-JSON rule dict (the registry/manifest
        form). Unknown keys fail loudly — a typo'd rule silently doing
        nothing is the worst failure mode for declarative config."""
        unknown = set(cfg) - _CONFIG_KEYS
        if unknown:
            raise ValueError(
                f"unknown treatment config keys {sorted(unknown)}; "
                f"valid: {sorted(_CONFIG_KEYS)}"
            )
        return cls(**cfg)

    def to_config(self) -> dict[str, Any]:
        out: dict[str, Any] = {}
        if self.ignore_complex_lists:
            out["ignore_complex_lists"] = True
        if self.normalize_complex_lists:
            out["normalize_complex_lists"] = True
        for key in ("ignore_field", "convert_list", "convert_string", "convert_dict"):
            val = getattr(self, key)
            if val:
                out[key] = list(val)
        return out

    def __call__(self, record: dict[str, Any]) -> dict[str, Any]:
        out: dict[str, Any] = {}
        for key, value in record.items():
            if key in self._ignore:
                continue
            if _is_complex_list(value):
                if self.ignore_complex_lists:
                    continue
                if self.normalize_complex_lists:
                    value = [self._normalize_item(v) for v in value]
                else:
                    # recurse so nested ignores/conversions apply inside
                    # lists of dicts too (reference all-options matrix)
                    value = [self(v) if isinstance(v, dict) else v for v in value]
            elif isinstance(value, dict):
                value = self(value)
            if key in self._to_list and not isinstance(value, list):
                value = [value]
            if key in self._to_string and not isinstance(value, str):
                value = str(value)
            wrapper = self._dict_wrappers.get(key)
            if wrapper is not None and not isinstance(value, dict):
                value = {wrapper: value}
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


def load_treatments(configs: dict[str, dict] | None) -> dict[str, Treatment]:
    """Per-table treatments from the registry's declarative rule map."""
    return {table: Treatment.from_config(cfg) for table, cfg in (configs or {}).items()}
