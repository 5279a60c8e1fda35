"""The flagship Spark extraction pipeline.

Plan shape (designed for 100 TB / 1000 executors, tested on local[N]):

    docs (Iceberg/parquet scan, doc_id + spans)
      ├─ posexplode(spans) ................ narrow, stays in scan stage
      ├─ kind='text'  → vectorized boilerplate classifier
      │                 (built-in column fns only: split/filter/size —
      │                  whole-stage codegen, zero Python)
      ├─ kind='media' → repartition(doc_id, offset)   [skew spread: a
      │                 media-heavy doc's spans land on MANY partitions]
      │                 → mapInPandas OCR stage (engine initialized once
      │                 per python worker, reused across Arrow batches —
      │                 reference spawns one subprocess per PROCESS and
      │                 funnels every image through one temp file,
      │                 core/run.py:407; here: no disk, no IPC, batched)
      └─ unionByName → groupBy(doc_id) + sort_array(collect_list(...))
                       restores original span order by offset (O7).

Shuffles: exactly 2 (media repartition — needed for skew — and the final
group-by-doc). The text route reaches the union without any shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from .semantics import (
    BOILERPLATE_MAX_RATIO,
    BOILERPLATE_TOKENS,
    extract_media_span,
)

OUT_SPAN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("order", T.IntegerType()),
        ]
    )
)

_FLAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)


class _Engine:
    """Per-python-worker OCR engine handle.

    Stands in for the reference's subprocess lifecycle
    (core/ppocr_api.py:16-72: spawn once, handshake, reuse). On a real
    cluster the model weights arrive via SparkFiles/broadcast and are
    loaded HERE, once per executor python worker — never per row/batch.
    """

    _instance: "_Engine | None" = None
    init_count = 0  # observable by tests via accumulator-free assertion

    def __init__(self) -> None:
        _Engine.init_count += 1
        self.ready = True

    @classmethod
    def get(cls) -> "_Engine":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def extract_batch(self, media_refs: pd.Series) -> pd.Series:
        # vectorized over the Arrow batch; a real engine would decode the
        # image bytes for each ref and run recognition here (U2/U3 bytes
        # protocol, core/ppocr_api.py:128-140)
        return media_refs.map(extract_media_span)


def _ocr_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    engine = _Engine.get()  # init BEFORE the batch loop; reused across batches
    for pdf in batches:
        out = pdf.copy()
        out["text"] = engine.extract_batch(pdf["media_ref"])
        yield out


def explode_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) -> flat (doc_id, kind, text, media_ref, offset)."""
    s = docs.select("doc_id", F.explode("spans").alias("s"))
    return s.select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def classify_text_route(flat_text: DataFrame) -> DataFrame:
    """Vectorized boilerplate classifier — mirror of
    semantics.classify_text_span using only built-in column functions."""
    # project __words ONCE, then derive hits/ratio from the column
    # reference — inlining the split into each consumer would re-tokenize
    # every span per use (same expression-duplication trap as minhash).
    # NB: .isin compiles to a static InSet; an F.array(...) literal here
    # would be re-allocated on EVERY lambda invocation (per word) in
    # interpreted HOF evaluation — measured as a GC-bound serial ceiling.
    words_expr = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    boiler = sorted(BOILERPLATE_TOKENS)
    with_words = flat_text.withColumn("__words", words_expr)
    wcol = F.col("__words")
    hits = F.size(F.filter(wcol, lambda w: w.isin(boiler)))
    return (
        with_words.where(F.size(wcol) > 0)
        .where(hits / F.size(wcol) <= F.lit(BOILERPLATE_MAX_RATIO))
        .withColumn("text", F.concat_ws(" ", wcol))
        .drop("__words")
    )


def ocr_media_route(
    flat_media: DataFrame,
    spread_partitions: int | None = None,
    keep_failures: bool = False,
) -> DataFrame:
    """Media spans through the batched OCR stage.

    repartition by (doc_id, offset): each span is independent, so a
    media-heavy document fans out across partitions instead of pinning one
    executor (skew handling per north_star; AQE coalesces the tail).

    ``keep_failures=False`` drops all-masks-failed spans (the reference
    logs and skips, core/run.py:499-501); ``True`` keeps them with NULL
    text so callers can route them to a dead-letter table."""
    parts = spread_partitions or flat_media.sparkSession.sparkContext.defaultParallelism * 2
    spread = flat_media.repartition(parts, "doc_id", "offset")
    done = spread.mapInPandas(_ocr_media, schema=_FLAT_SCHEMA)
    if keep_failures:
        return done
    return done.where(F.col("text").isNotNull())  # F10 dead-letter drop


def reassemble(extracted_flat: DataFrame) -> DataFrame:
    """O7: restore original span order per document (one shuffle)."""
    span = F.struct(
        F.col("offset").alias("order"),
        F.col("kind").alias("kind"),
        F.col("text").alias("text"),
        F.col("media_ref").alias("media_ref"),
    )
    return (
        extracted_flat.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(span)).alias("tmp"))
        .select(
            "doc_id",
            F.transform(
                "tmp",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["order"].alias("order"),
                ),
            ).alias("spans_out"),
        )
    )


def extract_spans(docs: DataFrame, spread_partitions: int | None = None) -> DataFrame:
    """Full pipeline: (doc_id, spans) -> (doc_id, spans_out)."""
    flat = explode_spans(docs)
    text_done = classify_text_route(flat.where(F.col("kind") == "text"))
    media_done = ocr_media_route(flat.where(F.col("kind") == "media"), spread_partitions)
    return reassemble(text_done.unionByName(media_done))


def extract_spans_flat(docs: DataFrame, spread_partitions: int | None = None) -> DataFrame:
    """Flat variant: one row per surviving span (doc_id, kind, text,
    media_ref, order) — handy for SQL-shaped comparisons and sinks."""
    flat = explode_spans(docs)
    text_done = classify_text_route(flat.where(F.col("kind") == "text"))
    media_done = ocr_media_route(flat.where(F.col("kind") == "media"), spread_partitions)
    return text_done.unionByName(media_done).select(
        "doc_id", "kind", "text", "media_ref", F.col("offset").alias("order")
    )


def extract_spans_with_deadletter(
    docs: DataFrame, spread_partitions: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """(ok_flat, dead_letter): F10 routing as data instead of log lines.

    dead_letter = media spans whose every mask failed the status/arity
    gates (doc_id, media_ref, order, reason) — at 10^12 docs these feed a
    triage table, not a log file."""
    flat = explode_spans(docs)
    text_done = classify_text_route(flat.where(F.col("kind") == "text"))
    media_all = ocr_media_route(
        flat.where(F.col("kind") == "media"), spread_partitions, keep_failures=True
    )
    ok = text_done.unionByName(media_all.where(F.col("text").isNotNull())).select(
        "doc_id", "kind", "text", "media_ref", F.col("offset").alias("order")
    )
    dead = media_all.where(F.col("text").isNull()).select(
        "doc_id",
        "media_ref",
        F.col("offset").alias("order"),
        F.lit("all_masks_failed").alias("reason"),
    )
    return ok, dead
