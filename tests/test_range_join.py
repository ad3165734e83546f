"""Banded range join: equivalence to the naive inequality join, bucket
boundary inclusivity."""

from __future__ import annotations

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.operators.range_join import range_join


def test_range_join_matches_naive(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a"), (1, "2024-01-01 20:00:00", "b"),
         (2, "2024-01-01 10:00:00", "c")],
        "k long, ts string, tag string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1.0),   # equal ts: inclusive lower bound
         (1, "2024-01-01 11:00:00", 2.0),
         (1, "2024-01-01 21:00:00", 3.0),
         (1, "2024-01-02 10:00:00", 4.0),   # exactly +24h from row a: inclusive upper
         (1, "2024-01-02 10:00:00.000001", 5.0),  # 1 us past: excluded for a
         (2, "2024-01-03 10:00:00", 6.0)],  # outside window for c
        "k long, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))

    got = {(r.l_tag, r.r_v) for r in
           range_join(left, right, by="k", lower_s=0, upper_s=86400).collect()}
    naive = left.alias("l").join(
        right.alias("r"),
        (F.col("l.k") == F.col("r.k"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 24 HOURS")),
    )
    expect = {(r["tag"], r["v"]) for r in naive.collect()}
    assert got == expect
    assert ("a", 1.0) in got and ("a", 4.0) in got and ("a", 5.0) not in got
    assert ("c", 6.0) not in got


def test_range_join_symmetric_window(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00", "x")], "k long, ts string, tag string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 11:30:00", 1.0),   # 30m before: inside ±1h
         (1, "2024-01-01 12:30:00", 2.0),   # 30m after: inside
         (1, "2024-01-01 10:59:59", 3.0),   # just outside lower
         (1, "2024-01-01 13:00:01", 4.0)],  # just outside upper
        "k long, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.r_v for r in
           range_join(left, right, by="k", lower_s=-3600, upper_s=3600).collect()}
    assert got == {1.0, 2.0}
