"""Structured Streaming: incremental extraction (availableNow) matches the
batch pipeline; second run with new files processes only the delta."""

import os

import pyspark.sql.functions as F

from xhs_ocr_spark.extraction import datagen, oracle
from xhs_ocr_spark.streaming import incremental_extraction_stream, windowed_event_counts


def _write_docs(spark, tmp, lo, hi, name):
    df = spark.createDataFrame(
        [datagen.corpus_rows(i) for i in range(lo, hi)], schema=datagen.DOCS_SCHEMA
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/in/{name}")


def _expected(lo, hi):
    exp = oracle.extract_corpus([datagen.corpus_rows(i) for i in range(lo, hi)])
    return {(d, k, t, m, o) for d, seq in exp.items() for (k, t, m, o) in seq}


def test_incremental_extraction_available_now(spark, tmp_path):
    tmp = str(tmp_path)
    os.makedirs(f"{tmp}/in", exist_ok=True)
    _write_docs(spark, tmp, 0, 40, "batch0")

    def run_once():
        q = (
            incremental_extraction_stream(spark, f"{tmp}/in/*", f"{tmp}/out", f"{tmp}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    got1 = {
        (r["doc_id"], r["kind"], r["text"], r["media_ref"], r["order"])
        for r in spark.read.parquet(f"{tmp}/out").collect()
    }
    assert got1 == _expected(0, 40)

    # new files arrive; re-trigger processes ONLY the delta (exactly-once)
    _write_docs(spark, tmp, 40, 60, "batch1")
    run_once()
    got2 = {
        (r["doc_id"], r["kind"], r["text"], r["media_ref"], r["order"])
        for r in spark.read.parquet(f"{tmp}/out").collect()
    }
    assert got2 == _expected(0, 60)  # no duplicates from batch0


def test_windowed_counts_batch_parity(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(ev, window="1 hour", watermark="2 hours")
    rows = out.collect()
    assert sum(r["n"] for r in rows) == ev.count()
    # spot-check one window against a direct groupBy
    direct = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .count()
        .select(F.col("w.start").alias("window_start"), "event_type", F.col("count"))
    )
    d = {(r["window_start"], r["event_type"]): r["count"] for r in direct.collect()}
    for r in rows:
        assert d[(r["window_start"], r["event_type"])] == r["n"]
