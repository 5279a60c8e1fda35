"""Gap-based event sessionization — the classic clickstream operator:
events of a user belong to one session until a silence longer than the
gap; the next event starts a new session.

Batch form: lag + cumulative-sum-of-breaks inside a window PARTITIONED
BY the session key — bounded by one user's events, shuffled once on the
key, exact, and oracle-checkable bit-for-bit (gap arithmetic in integer
epoch seconds). The streaming analog is `F.session_window` with a
watermark (see streaming/incremental.py for the engine's streaming
surfaces); the batch form is what backfills and reprocessing runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    gap_sec: int = 1800,
) -> DataFrame:
    """Assign a 1-based ``session_idx`` per key under (ts, order) order;
    a new session starts when the gap to the previous event exceeds
    ``gap_sec``. ``order_col`` must make the per-key order total (a
    unique event id). Returns (order_col, key_col, session_idx,
    is_start).
    """
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(order_col))
    prev = F.lag(F.col(ts_col)).over(w)
    brk = F.when(
        prev.isNull()
        | (
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)
            > F.lit(int(gap_sec))
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df.select(
        F.col(order_col), F.col(key_col), F.col(ts_col), brk.alias("_brk")
    )
    return out.select(
        order_col,
        key_col,
        F.sum("_brk").over(wc).cast("long").alias("session_idx"),
        F.col("_brk").cast("long").alias("is_start"),
    )
