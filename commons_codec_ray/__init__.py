"""commons-codec-ray: a Ray-Data-native CDC / incremental-ingest engine.

Built from scratch on the change-event translation model of
crate/commons-codec (reference: /root/reference, see SURVEY.md):

- three CDC envelope dialects (Debezium-style, MySQL-binlog-style,
  DynamoDB-Streams-style) decoded in ``map_batches`` over Arrow batches
  into typed upsert/delete op records,
- hash partitioning on ``conv_id`` into a fixed key space (``P``),
- per-partition last-writer-wins resolution on ``(key, lsn)``,
- an idempotent two-phase Parquet sink (epoch manifests + atomic
  checkpoint swap) giving exactly-once semantics across restarts,
- schema evolution via in-band control events + Arrow schema unification,
- plus the large-scale training-data operators a transcript lake needs:
  dedup (exact / MinHash-LSH / SimHash / embedding), similarity search,
  text analysis, and multimodal stage plumbing.

Nothing here calls ``ray.init()`` — sessions are owned by the caller
(bench.py, CLI, pytest fixture, or the evaluation driver).
"""

__version__ = "0.1.0"

from commons_codec_ray.config import PipelineConfig  # noqa: F401
from commons_codec_ray.schemas import (  # noqa: F401
    OP_DELETE,
    OP_UPSERT,
    OP_SCHEMA_CHANGE,
    OP_DEAD,
    OPS_SCHEMA,
    TRANSCRIPT_SCHEMA,
)
