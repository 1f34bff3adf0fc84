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

Path-targeted expression rules (``rules``): the reference additionally
exercises Tikray/Moksha jq expressions against nested paths
(reference tests/transform/mongodb/test_mongodb_full.py:40-47, e.g.
``.python.list_of_nested_list |= flatten``). The engine's analog is a
declarative rule list — ``{"path": "python.list_of_nested_list",
"op": "flatten"}`` — covering the exercised jq verb set (``flatten``,
``prune_array_of_objects``, ``to_object`` (+``key``), ``to_array``,
``tostring``) plus ``drop``/``rename``/``default``. No expression
evaluator, no eval(): rules are data, which keeps them picklable,
registry-serializable and safe in a distributed decode stage. Paths
descend dicts; a LIST of dicts at an intermediate segment applies the
rest of the path to each element (jq's ``.[] |=``). Rules run BEFORE
the field-level treatment (the reference's ``pre=`` slot); a path that
does not exist is a no-op (jq semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


def _is_complex_list(value: Any) -> bool:
    return isinstance(value, list) and any(isinstance(v, dict) for v in value)


def _flatten(value: Any) -> Any:
    if not isinstance(value, list):
        return value
    out: list[Any] = []
    for v in value:
        if isinstance(v, list):
            out.extend(_flatten(v))
        else:
            out.append(v)
    return out


_RULE_OPS = frozenset(
    ("flatten", "prune_array_of_objects", "to_object", "to_array", "tostring",
     "drop", "rename", "default")
)


@dataclass
class PathRule:
    """One path-targeted transform (the jq-verb analog)."""

    path: str
    op: str
    key: str = "id"  # to_object wrapper key
    to: str | None = None  # rename target
    value: Any = None  # default value

    def __post_init__(self) -> None:
        if self.op not in _RULE_OPS:
            raise ValueError(
                f"unknown treatment rule op {self.op!r}; valid: {sorted(_RULE_OPS)}"
            )
        self.segments = self.path.split(".")
        if not all(self.segments):
            raise ValueError(f"bad treatment rule path {self.path!r}")

    @classmethod
    def from_config(cls, cfg: dict[str, Any]) -> "PathRule":
        unknown = set(cfg) - {"path", "op", "key", "to", "value"}
        if unknown:
            raise ValueError(f"unknown treatment rule keys {sorted(unknown)}")
        return cls(**cfg)

    def to_config(self) -> dict[str, Any]:
        out: dict[str, Any] = {"path": self.path, "op": self.op}
        if self.op == "to_object":
            out["key"] = self.key
        if self.to is not None:
            out["to"] = self.to
        if self.value is not None:
            out["value"] = self.value
        return out

    # -- application ---------------------------------------------------------

    def __call__(self, record: dict[str, Any]) -> dict[str, Any]:
        return self._descend(record, 0)

    def _descend(self, node: Any, depth: int):
        if isinstance(node, list):  # jq `.[] |=` over arrays of objects
            return [self._descend(v, depth) for v in node]
        if not isinstance(node, dict):
            return node
        name = self.segments[depth]
        if depth < len(self.segments) - 1:
            if name in node:
                node = dict(node)
                node[name] = self._descend(node[name], depth + 1)
            return node
        if name not in node:
            if self.op == "default":
                node = dict(node)
                node[name] = self.value
            return node
        node = dict(node)
        v = node[name]
        if self.op == "flatten":
            node[name] = _flatten(v)
        elif self.op == "prune_array_of_objects":
            if _is_complex_list(v):
                del node[name]
        elif self.op == "to_object":
            if isinstance(v, list):
                node[name] = [
                    x if isinstance(x, dict) else {self.key: x} for x in v
                ]
            elif not isinstance(v, dict):
                node[name] = {self.key: v}
        elif self.op == "to_array":
            if not isinstance(v, list):
                node[name] = [v]
        elif self.op == "tostring":
            if not isinstance(v, str):
                node[name] = str(v)
        elif self.op == "drop":
            del node[name]
        elif self.op == "rename":
            del node[name]
            node[self.to or name] = v
        return node


_CONFIG_KEYS = frozenset(
    (
        "ignore_complex_lists",
        "normalize_complex_lists",
        "ignore_field",
        "convert_list",
        "convert_string",
        "convert_dict",
        "rules",
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
    # path-targeted expression rules (PathRule dicts), applied FIRST
    rules: list[Any] = field(default_factory=list)

    def __post_init__(self) -> None:
        self._rules = [
            r if isinstance(r, PathRule) else PathRule.from_config(r)
            for r in self.rules
        ]
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
        if self._rules:
            out["rules"] = [r.to_config() for r in self._rules]
        return out

    def __call__(self, record: dict[str, Any]) -> dict[str, Any]:
        for rule in self._rules:  # the reference's pre= slot: rules first
            record = rule(record)
        return self._fields(record)

    def _fields(self, record: dict[str, Any]) -> dict[str, Any]:
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
                    # lists of dicts too (reference all-options matrix);
                    # _fields, not self — path rules are root-anchored
                    value = [
                        self._fields(v) if isinstance(v, dict) else v for v in value
                    ]
            elif isinstance(value, dict):
                value = self._fields(value)
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
