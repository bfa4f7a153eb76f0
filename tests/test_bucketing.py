"""Bucketed co-located join evidence: pre-bucketing both sides of a
recurring join key removes the per-query shuffle entirely — the scale
technique README/SURVEY claim for repeated large-x-large joins (e.g.
facts x mapping rewrites run nightly). This pins the plan: joining two
tables bucketed on the same key shows ZERO Exchange operators."""

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    right = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
    )
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")
    (left.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
     .saveAsTable("bt_left"))
    (right.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
     .saveAsTable("bt_right"))
    try:
        # disable broadcast so the test proves bucket co-location, not
        # a broadcast join
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bt_left").join(spark.table("bt_right"), "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan[:1500]
            assert joined.count() == 10000
            s = joined.agg(F.sum(F.col("v1") + F.col("v2"))).collect()[0][0]
            assert s == sum(2 * i + 3 * i for i in range(10000))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_left")
        spark.sql("DROP TABLE IF EXISTS bt_right")
