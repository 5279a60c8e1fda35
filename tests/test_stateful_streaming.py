"""applyInPandasWithState: cumulative per-user totals across microbatches."""

import pyspark.sql.functions as F
import pyspark.sql.types as T

from xhs_ocr_spark.streaming.stateful import stateful_user_totals

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def test_stateful_totals_across_batches(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # two input files -> two microbatches (maxFilesPerTrigger=1)
    ev.where("event_id % 2 = 0").coalesce(1).write.parquet(f"{tmp_path}/in/a")
    ev.where("event_id % 2 = 1").coalesce(1).write.parquet(f"{tmp_path}/in/b")

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp_path}/in/*")
    )
    q = (
        stateful_user_totals(stream)
        .writeStream.format("memory")
        .queryName("stateful_totals")
        .option("checkpointLocation", f"{tmp_path}/ck")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    out = spark.table("stateful_totals")
    assert out.count() > out.select("user_id").distinct().count()  # >1 batch emitted
    # last (cumulative max) emission per user == plain batch aggregate
    final = {
        r["user_id"]: (r["n"], r["v"])
        for r in out.groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("value_sum_x100").alias("v"))
        .collect()
    }
    expect = {
        r["user_id"]: (r["n"], r["v"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("v"),
        )
        .collect()
    }
    # value cents: stateful sums batch totals (round once per batch);
    # compare counts exactly, sums within 1 cent per batch
    assert {u: v[0] for u, v in final.items()} == {u: v[0] for u, v in expect.items()}
    for u in expect:
        assert abs(final[u][1] - expect[u][1]) <= 2


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicates within the watermark window are dropped with BOUNDED
    state; each unique key survives exactly once."""
    import os

    import pyspark.sql.functions as F

    from xhs_ocr_spark.streaming import streaming_dedup_within_watermark

    tmp = str(tmp_path)
    rows = [
        (k, v, f"2024-01-01 10:{m:02d}:00")
        for k, v, m in [
            ("a", 1, 0), ("a", 2, 5), ("b", 3, 1), ("b", 4, 2), ("c", 5, 9),
        ]
    ]
    df = spark.createDataFrame(rows, "k string, v long, ts_s string").select(
        "k", "v", F.col("ts_s").cast("timestamp").alias("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/in")
    stream = spark.readStream.schema(df.schema).parquet(f"{tmp}/in")
    q = (
        streaming_dedup_within_watermark(stream, ["k"], watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", f"{tmp}/out")
        .option("checkpointLocation", f"{tmp}/ck")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(f"{tmp}/out").collect()
    assert sorted(r["k"] for r in got) == ["a", "b", "c"]
    # batch path: plain dedup
    assert streaming_dedup_within_watermark(df, ["k"]).count() == 3
    assert os.path.exists(f"{tmp}/ck")
