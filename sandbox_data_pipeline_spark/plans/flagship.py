"""Flagship query: TPC-H Q3-shaped shipping-priority report.

Exercises the full relational core in a single Catalyst plan:
pushdown-filtered scans of customer/orders/lineitem, two equi-joins
(customer side broadcast-eligible after its segment filter — AQE
demotes the SMJ at runtime when the build side is small), a hash
aggregation with map-side combine, and TakeOrderedAndProject for the
global top-K.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table


def flagship_query(spark: SparkSession, sf_dir: str, segment: str = "BUILDING", limit: int = 10) -> DataFrame:
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == segment)
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(limit)
    )
