"""Related / unrelated table merges (reference: db/data_dms.py).

The reference materializes whole SQLite tables into driver dicts and merges
them with O(n*m) python loops (db/data_dms.py:103-115, 166-253). Here both
merges are single declarative plans — Catalyst handles pushdown/pruning and
AQE picks shuffle vs broadcast; nothing touches the driver.

Semantics preserved exactly:
- missing values are empty string '' (not NULL)  — db/data_dms.py:205
- related merge: full-outer on the key tuple; for each shared column the
  LATER table in list order wins iff its value is non-empty
  ("update iff current == '' or incoming != ''", db/data_dms.py:217)
- unrelated merge: rows from all tables, column set = union, missing
  columns filled ''                                 — db/data_dms.py:228-253

Deliberate divergence: when a key column is missing from an input table the
reference logs a warning and silently skips that table
(db/data_dms.py:193-196); here the plan fails with AnalysisException —
silent data loss is not acceptable engine behavior at scale. Callers that
want the skip can pre-filter ``[t for t in tables if set(keys) <=
set(t.columns)]``.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _non_key_cols(df: DataFrame, keys: list[str]) -> list[str]:
    return [c for c in df.columns if c not in keys]


def related_merge(tables: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold tables left-to-right with full-outer joins on ``keys``.

    Later-table non-empty values overwrite earlier ones; '' semantics kept
    via NULLIF/COALESCE and a final fill-''.
    """
    if not tables:
        raise ValueError("related_merge needs at least one table")

    def step(acc: DataFrame, nxt: DataFrame) -> DataFrame:
        a = acc.alias("a")
        b = nxt.alias("b")
        joined = a.join(b, on=keys, how="full_outer")
        cols = [F.col(k).alias(k) for k in keys]
        a_cols = _non_key_cols(acc, keys)
        b_cols = _non_key_cols(nxt, keys)
        for c in a_cols:
            if c in b_cols:
                # later table wins when non-empty (db/data_dms.py:217)
                cols.append(
                    F.coalesce(
                        F.nullif(F.col(f"b.{c}"), F.lit("")),
                        F.nullif(F.col(f"a.{c}"), F.lit("")),
                    ).alias(c)
                )
            else:
                cols.append(F.col(f"a.{c}").alias(c))
        for c in b_cols:
            if c not in a_cols:
                cols.append(F.col(f"b.{c}").alias(c))
        return joined.select(cols)

    merged = reduce(step, tables)
    return merged.fillna("", subset=_non_key_cols(merged, keys))


def unrelated_merge(tables: list[DataFrame]) -> DataFrame:
    """Union-by-name over all tables; absent columns become ''."""
    if not tables:
        raise ValueError("unrelated_merge needs at least one table")
    out = reduce(lambda x, y: x.unionByName(y, allowMissingColumns=True), tables)
    return out.fillna("")
