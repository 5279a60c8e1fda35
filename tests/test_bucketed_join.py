"""Bucketing: co-located joins without a shuffle.

The 100 TB design point stores fact tables bucketed by join key (Iceberg
bucket transform / Hive bucketing) so repeated joins skip the exchange.
This test proves the engine exploits it: two tables bucketed on the key
join with NO Exchange in the physical plan; the unbucketed control plan
has them.
"""

import pyspark.sql.functions as F


def test_bucketed_join_skips_shuffle(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        a = ev.select(F.col("user_id").alias("k"), "event_id", "value")
        b = ev.groupBy(F.col("user_id").alias("k")).agg(F.count("*").alias("n"))

        for name, df in (("t_a", a), ("t_b", b)):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            df.write.bucketBy(8, "k").sortBy("k").format("parquet").saveAsTable(name)

        joined = spark.table("t_a").join(spark.table("t_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        assert joined.count() == a.count()

        # control: same join on raw (unbucketed) frames shuffles both sides
        control = a.join(b, "k")
        cplan = control._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in cplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        for name in ("t_a", "t_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
