"""Scalar column functions — reference §2.3 (X5-X15), all built-in exprs.

Every function here stays inside whole-stage codegen: no Python UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def normalize_ocr_col(text: Column, tag: Column, app: Column) -> Column:
    """X5-X7: CJK strip (non-traffic tags) + replace chain + tiktok 's'.

    Replace order preserved from core/run.py:468-476, 622-627."""
    stripped = F.when(
        tag.startswith("note_traffic_analysis"), text
    ).otherwise(F.regexp_replace(text, "[一-鿿]+", ""))
    chained = F.regexp_replace(stripped, "秒", "")
    chained = F.regexp_replace(chained, " ", "")
    chained = F.regexp_replace(chained, "o", "0")
    chained = F.regexp_replace(chained, "<b>", "")
    chained = F.regexp_replace(chained, "</b>", "")
    return F.when(app == F.lit("tiktok"), F.regexp_replace(chained, "s", "")).otherwise(chained)


def chinese_number_to_long(c: Column) -> Column:
    """X8: '1.5万' -> 15000, passthrough otherwise (string-typed, matching
    the reference's TEXT storage; core/run.py:679-690)."""
    converted = (
        F.regexp_extract(c, r"([\d.]+)", 1).cast("double") * 10000
    ).cast("long").cast("string")
    return F.when(c.contains("万") & (F.regexp_extract(c, r"([\d.]+)", 1) != ""), converted).otherwise(c)


def label_value_pairs(texts: Column) -> Column:
    """X9: 8 texts -> 'l1:v1|l2:v2|l3:v3|l4:v4' (core/run.py:479-483)."""
    pairs = F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda i: F.concat(
            F.element_at(texts, i * 2 + 1), F.lit(":"), F.element_at(texts, i * 2 + 2)
        ),
    )
    return F.array_join(pairs, "|")


def clean_tag(tag: Column) -> Column:
    """X11: strip digits from tag before table naming (core/run.py:504)."""
    return F.regexp_replace(tag, r"\d+", "")


def content_type_col(tag: Column, app: Column) -> Column:
    """X10: content-type derivation (core/run.py:504-509, 649)."""
    return (
        F.when(app == F.lit("tiktok"), F.lit("tiktok_video"))
        .when(tag.contains("video"), F.lit("video"))
        .otherwise(F.lit("note"))
    )


def rename_with_mapping(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """X13/X14: bulk column rename per field-mapping registry
    (db/data_sync.py:142-148; config.ini [fields])."""
    return df.select([F.col(c).alias(mapping.get(c, c)) for c in df.columns])
