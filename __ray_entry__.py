"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in commons_codec_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: full mixed-dialect CDC replay on sf0.001 —
    envelope encode → decode (map_batches, Arrow) → hash partition →
    last-writer-wins apply → final transcript lake state."""
    from commons_codec_ray.pipelines.queries import q_cdc_replay

    return q_cdc_replay("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from commons_codec_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from commons_codec_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
