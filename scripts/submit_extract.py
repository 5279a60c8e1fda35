#!/usr/bin/env python
"""spark-submit entrypoint: resumable interleaved-document extraction.

    spark-submit --py-files dist/xhs_ocr_spark.zip \
        scripts/submit_extract.py <input_docs_parquet> <output_dir> \
        [n_buckets] [waves]

On a cluster the SparkSession comes from spark-submit's conf (master,
executors); locally it falls back to the session factory. The job is
resumable: re-submitting after a failure skips completed buckets via the
lineage table (see extraction/checkpointed.py).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    input_path, output_dir = sys.argv[1], sys.argv[2]
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    waves = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    spark = SparkSession.builder.appName("xhs-ocr-spark-extract").getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    from xhs_ocr_spark.extraction.checkpointed import CheckpointedExtraction

    docs = spark.read.parquet(input_path)
    runner = CheckpointedExtraction(spark, output_dir, n_buckets=n_buckets, waves=waves)
    out = runner.run(docs)
    buckets_ok = runner.lineage().where("status = 'ok'").count()
    print(f"rows_out={out.count()} buckets_ok={buckets_ok}")
    spark.stop()


if __name__ == "__main__":
    main()
