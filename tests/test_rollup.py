"""Cascading rollup: re-aggregating a finer tier must equal direct
aggregation at the coarser tier (the continuous-aggregate law)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.operators.rollup import cascade, hourly_aggregate, present

SF = "/root/testdata/sf0.001"


def test_cascade_equals_direct(spark):
    e = table(spark, SF, "events")
    hourly = hourly_aggregate(e)
    via_cascade = present(cascade(cascade(hourly, "day"), "month"))
    direct = present(
        e.groupBy(F.date_trunc("month", "ts").alias("bucket_start"), "event_type").agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    assert sorted(map(str, via_cascade.collect())) == sorted(map(str, direct.collect()))


def test_hourly_tier_is_compact(spark):
    e = table(spark, SF, "events")
    hourly = hourly_aggregate(e)
    # the finest tier is bounded by |hours| x |keys|, far below raw rows
    assert hourly.count() < e.count()
