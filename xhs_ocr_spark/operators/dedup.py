"""Dedup operators.

- first-write-wins: the reference's INSERT OR IGNORE on a UNIQUE key
  (db/__init__.py:97, 110-116)
- last-write-wins: ON CONFLICT DO UPDATE (db/data_dms.py:293-312)

Both are row_number window plans — a single hash shuffle on the key; AQE
splits skewed keys.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _pick(df: DataFrame, keys: list[str], order_col: str, ascending: bool) -> DataFrame:
    ordering = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(*keys).orderBy(ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_first_wins(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Keep the earliest row per key (INSERT OR IGNORE semantics)."""
    return _pick(df, keys, order_col, ascending=True)


def dedup_last_wins(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Keep the latest row per key (upsert semantics)."""
    return _pick(df, keys, order_col, ascending=False)
