"""Idempotent two-phase Parquet sink: epoch manifests + atomic checkpoint."""
