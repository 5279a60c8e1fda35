"""Sinks: MERGE-semantics tables (Iceberg stand-in) and dead-letter."""

from .merge_table import BucketedMergeTable, ParquetMergeTable  # noqa: F401
