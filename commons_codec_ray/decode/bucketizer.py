"""Record bucketizer — the universal pk/typed/untyped split (M3).

The analog of the reference's ``UniversalRecord.from_record``
(reference src/commons_codec/model.py:161-175): a decoded record dict is
split into

- ``pk``: fields named in the primary key,
- ``typed``: remaining fields whose value is a plain scalar,
- ``untyped``: everything irregular — nested maps, lists, and values
  tagged "varied" upstream (the aux spill-over bucket; reference
  model.py:171-172 routes TaggableList-varied values here).

In the engine proper this split is implicit in the op-record schema
(key columns / typed columns / ``aux`` JSON); this explicit form exists
for dialect authors writing new decoders and for parity testing.
"""

from __future__ import annotations

from typing import Any

_SCALARS = (str, int, float, bool, bytes)


def bucketize(
    record: dict[str, Any],
    primary_keys: list[str] | tuple[str, ...],
    varied_fields: dict[str, Any] | None = None,
) -> dict[str, dict[str, Any]]:
    pk: dict[str, Any] = {}
    typed: dict[str, Any] = {}
    untyped: dict[str, Any] = dict(varied_fields or {})
    for name, value in record.items():
        if name in primary_keys:
            pk[name] = value
        elif value is None or isinstance(value, _SCALARS):
            typed[name] = value
        else:
            untyped[name] = value
    return {"pk": pk, "typed": typed, "untyped": untyped}
