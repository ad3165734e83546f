"""Data-quality report query (D1): one-pass table metrics over
lineitem + orders, oracle-checked. The same dq_metrics operator backs
the pipeline's check gate (plans/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table


def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    li_m = li.agg(
        F.lit("lineitem").alias("table_name"),
        F.count(F.lit(1)).alias("row_cnt"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).alias("null_keys"),
        F.countDistinct("l_orderkey").alias("distinct_keys"),
        F.round(F.min("l_extendedprice"), 4).alias("min_val"),
        F.round(F.max("l_extendedprice"), 4).alias("max_val"),
    )
    o_m = o.agg(
        F.lit("orders").alias("table_name"),
        F.count(F.lit(1)).alias("row_cnt"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_keys"),
        F.countDistinct("o_orderkey").alias("distinct_keys"),
        F.round(F.min("o_totalprice"), 4).alias("min_val"),
        F.round(F.max("o_totalprice"), 4).alias("max_val"),
    )
    return li_m.unionAll(o_m)


QUERIES = {"q_dq_report": q_dq_report}

ORACLE = {
    "q_dq_report": """
    SELECT 'lineitem' AS table_name,
           count(*) AS row_cnt,
           CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_keys,
           count(DISTINCT l_orderkey) AS distinct_keys,
           round(min(l_extendedprice), 4) AS min_val,
           round(max(l_extendedprice), 4) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'orders', count(*),
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderkey),
           round(min(o_totalprice), 4), round(max(o_totalprice), 4)
    FROM orders
    """,
}
