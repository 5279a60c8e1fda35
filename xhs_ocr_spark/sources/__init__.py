"""Sources: the partitioned documents table (Iceberg-layout on parquet)."""

from .docs_table import read_docs, read_recent, write_docs_table  # noqa: F401
