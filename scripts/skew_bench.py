#!/usr/bin/env python
"""Skew evidence: media-heavy documents vs the per-span spread.

Builds a corpus where a handful of documents carry hundreds of media spans
(the reference's multi-screenshot accounts, amplified), then times the
media OCR stage (a) naive: partitioned by doc_id — heavy docs pin single
tasks, (b) production path: repartition(doc_id, offset) — spans spread.

Appends results to BENCH/BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from xhs_ocr_spark.extraction.pipeline import _ocr_media, ocr_media_route  # noqa: E402
from xhs_ocr_spark.session import get_spark  # noqa: E402

N_DOCS = 1500
HEAVY_EVERY = 101     # ~20 heavy docs
HEAVY_SPANS = 3000
LIGHT_SPANS = 3


def main() -> None:
    spark = get_spark("skew-bench", cores=16)
    parts = 16  # = cores: each core owns one partition, so the max partition IS the critical path

    docs = spark.range(N_DOCS).select(
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("doc_id"),
        F.when(F.col("id") % HEAVY_EVERY == 0, F.lit(HEAVY_SPANS))
        .otherwise(F.lit(LIGHT_SPANS))
        .alias("n"),
    )
    flat = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("offset"),
    ).select(
        "doc_id",
        F.lit("media").alias("kind"),
        F.lit("").alias("text"),
        F.concat(F.lit("mem://"), F.col("doc_id"), F.lit("/"), F.col("offset").cast("string")).alias(
            "media_ref"
        ),
        F.col("offset").cast("int").alias("offset"),
    )
    n_spans = flat.count()

    def timed(df):
        df.count()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            df.count()
            best = min(best, time.time() - t0)
        return best

    out_schema = "doc_id string, kind string, text string, media_ref string, offset int"
    naive = flat.repartition(parts, "doc_id").mapInPandas(_ocr_media, schema=out_schema)
    t_naive = timed(naive.where(F.col("text").isNotNull()))
    spread = ocr_media_route(flat, spread_partitions=parts)
    t_spread = timed(spread)

    # partition balance evidence
    def histo(df):
        rows = df.groupBy(F.spark_partition_id().alias("p")).count().collect()
        counts = sorted((r["count"] for r in rows), reverse=True)
        return counts[0], counts[len(counts) // 2]

    max_naive, med_naive = histo(flat.repartition(parts, "doc_id"))
    max_spread, med_spread = histo(flat.repartition(parts, "doc_id", "offset"))

    out = (
        f"\n## Skew evidence (scripts/skew_bench.py, {n_spans} media spans, "
        f"{N_DOCS} docs, {N_DOCS // HEAVY_EVERY + 1} heavy @ {HEAVY_SPANS} spans, local[16])\n\n"
        f"| strategy | max/median partition rows | OCR stage best-of-3 |\n|---|---|---|\n"
        f"| partition by doc_id (naive) | {max_naive}/{med_naive} | {t_naive:.2f}s |\n"
        f"| repartition (doc_id, offset) — production path | {max_spread}/{med_spread} | {t_spread:.2f}s |\n\n"
        f"Speedup {t_naive / t_spread:.2f}x; the per-span spread keeps the heavy "
        f"documents from pinning single executors (north_star skew requirement).\n"
    )
    print(out)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "BASELINE.md"), "a") as f:
        f.write(out)
    spark.stop()


if __name__ == "__main__":
    main()
