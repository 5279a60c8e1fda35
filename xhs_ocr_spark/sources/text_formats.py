"""JSONL / CSV corpus ingestion with dead-letter routing — the raw edge
of a web-scale pipeline, where input is line-delimited text written by
someone else's crawler and a fraction of every batch is malformed.

Design (same philosophy as the extraction dead-letter gates F1-F10,
reference core/run.py's tolerant loaders): read PERMISSIVE with an
explicit schema + ``columnNameOfCorruptRecord`` so a bad line becomes a
ROW (never a job failure — FAILFAST kills a 100 TB job on one byte, and
DROPMALFORMED silently loses data); then split the frame into (good,
dead) on the corrupt column. Both halves stay DataFrames: good flows
into the pipeline, dead is written to a quarantine table with the raw
line preserved for replay.

Scale notes: schema is REQUIRED (inference scans the input twice and
samples nondeterministically at 10^12 rows); the corrupt-record column
must be persisted through the split (Spark computes it at scan time;
selecting it alone from a cached plan can silently yield nulls — the
split here projects both halves from ONE scan). multiLine stays False:
line-delimited inputs split per-line, so a 100 TB directory
parallelizes by byte ranges, while multiLine JSON forces one task per
file.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_jsonl_with_deadletter(
    spark: SparkSession, path: str, schema: T.StructType = DOCS_JSONL_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON; return (good, dead). ``schema`` must
    include a StringType ``_corrupt_record`` field. A row is dead iff
    the corrupt column is set (malformed JSON, reason 'jsonl_parse') OR
    every declared data column came back null (a structurally-valid
    JSON object of the wrong shape parses to all-nulls without being
    marked corrupt, reason 'jsonl_shape').

    The original input line is preserved for BOTH dead classes
    (round-5 ADVICE: the old json() scan could only recover the raw
    text of malformed lines — a wrong-shape row's raw_line degraded to
    to_json of an all-null struct, '{}'). The reader scans the file as
    TEXT (one scan, still byte-range splittable) and parses each line
    with from_json, so the raw line is a real column on every row."""
    if CORRUPT_COL not in schema.fieldNames():
        raise ValueError(f"schema must declare {CORRUPT_COL} (string)")
    lines = spark.read.text(path).select(F.col("value").alias("raw_line"))
    parsed = lines.select(
        "raw_line",
        F.from_json(
            F.col("raw_line"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_p"),
    )
    data_cols = [f for f in schema.fieldNames() if f != CORRUPT_COL]
    corrupt = F.col("_p").getField(CORRUPT_COL).isNotNull()
    all_null = None
    for c in data_cols:
        cond = F.col("_p").getField(c).isNull()
        all_null = cond if all_null is None else (all_null & cond)
    good = parsed.where(~(corrupt | all_null)).select(
        *[F.col("_p").getField(c).alias(c) for c in data_cols]
    )
    dead = parsed.where(corrupt | all_null).select(
        "raw_line",
        F.when(corrupt, F.lit("jsonl_parse"))
        .otherwise(F.lit("jsonl_shape"))
        .alias("reason"),
    )
    return good, dead


def read_csv_with_deadletter(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read CSV permissively; return (good, dead). Same contract as the
    JSONL reader: schema must declare ``_corrupt_record``; malformed
    lines (wrong arity, unparseable casts) land in dead with the raw
    line preserved."""
    if CORRUPT_COL not in schema.fieldNames():
        raise ValueError(f"schema must declare {CORRUPT_COL} (string)")
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
    data_cols = [f for f in schema.fieldNames() if f != CORRUPT_COL]
    bad = F.col(CORRUPT_COL).isNotNull()
    good = raw.where(~bad).drop(CORRUPT_COL)
    # the projection must reference data columns alongside the corrupt
    # column: Spark disallows queries that touch ONLY the internal
    # corrupt-record column of a raw CSV/JSON scan
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    dead = raw.where(bad).select(
        F.coalesce(F.col(CORRUPT_COL), F.to_json(F.struct(*data_cols))).alias(
            "raw_line"
        ),
        F.lit("csv_parse").alias("reason"),
    )
    return good, dead
