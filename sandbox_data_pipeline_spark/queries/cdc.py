"""CDC queries: merge/upsert snapshots and SCD2 history, DuckDB-oracled.

``orders`` stands in for a changelog: ``o_custkey`` is the entity key,
``(o_orderdate, o_orderkey)`` the unique change ordering, and
``o_orderpriority`` / ``o_totalprice`` the tracked payload. Both
queries are pure window SQL on each engine, so the oracle is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.operators.cdc import merge_upsert, scd2_history

QUERIES: dict = {}
ORACLE: dict = {}

# Snapshot cut: orders strictly before this date form the "target"
# snapshot; later orders arrive as the "update" batch.
CUTOFF = "1997-01-01"


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest order per customer after merging a late batch into a
    snapshot — the surviving row per key must be identical to running
    latest-per-key over the full table."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    target_rows = o.where(F.col("o_orderdate") < CUTOFF)
    updates = o.where(F.col("o_orderdate") >= CUTOFF)

    w = "o_custkey"
    snapshot = merge_upsert(
        target_rows, target_rows.limit(0), [w], ["o_orderdate", "o_orderkey"]
    )
    merged = merge_upsert(snapshot, updates, [w], ["o_orderdate", "o_orderkey"])
    return merged.select(
        "o_custkey",
        F.col("o_orderdate").alias("last_orderdate"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
        F.col("o_orderstatus").alias("last_status"),
    )


_ORACLE_MERGE = f"""
SELECT o_custkey,
       o_orderdate AS last_orderdate,
       o_orderkey AS last_orderkey,
       o_totalprice AS last_totalprice,
       o_orderstatus AS last_status
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY o_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
WHERE rn = 1
"""

QUERIES["q_merge_upsert"] = q_merge_upsert
ORACLE["q_merge_upsert"] = _ORACLE_MERGE


def q_merge_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge with tombstones: the late batch deletes customers whose
    newest order is cancelled (status 'F' plays the tombstone flag)."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    flagged = o.withColumn("is_del", F.col("o_orderstatus") == "F")
    target_rows = flagged.where(F.col("o_orderdate") < CUTOFF)
    updates = flagged.where(F.col("o_orderdate") >= CUTOFF)
    merged = merge_upsert(
        target_rows,
        updates,
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
        delete_col="is_del",
    )
    return merged.select(
        "o_custkey",
        F.col("o_orderdate").alias("last_orderdate"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
        F.col("o_orderstatus").alias("last_status"),
    )


_ORACLE_MERGE_DELETE = """
SELECT o_custkey,
       o_orderdate AS last_orderdate,
       o_orderkey AS last_orderkey,
       o_totalprice AS last_totalprice,
       o_orderstatus AS last_status
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY o_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
WHERE rn = 1 AND o_orderstatus <> 'F'
"""

QUERIES["q_merge_delete"] = q_merge_delete
ORACLE["q_merge_delete"] = _ORACLE_MERGE_DELETE


def q_scd2_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of each customer's order priority: consecutive
    orders with the same priority collapse into one validity interval."""
    o = table(spark, sf_dir, "orders")
    hist = scd2_history(
        o,
        key_cols=["o_custkey"],
        order_cols=["o_orderdate", "o_orderkey"],
        track_cols=["o_orderpriority"],
    )
    return hist.select(
        "o_custkey",
        "o_orderpriority",
        F.col("valid_from_o_orderdate").alias("valid_from_date"),
        F.col("valid_from_o_orderkey").alias("valid_from_key"),
        F.col("valid_to_o_orderdate").alias("valid_to_date"),
        "is_current",
    )


_ORACLE_SCD2 = """
WITH ordered AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         lag(o_orderpriority) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS prev_priority,
         row_number() OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
),
versions AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
  FROM ordered
  WHERE rn = 1 OR prev_priority IS DISTINCT FROM o_orderpriority
)
SELECT o_custkey,
       o_orderpriority,
       o_orderdate AS valid_from_date,
       o_orderkey AS valid_from_key,
       lead(o_orderdate) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS valid_to_date,
       lead(o_orderdate) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
FROM versions
"""

QUERIES["q_scd2_priority"] = q_scd2_priority
ORACLE["q_scd2_priority"] = _ORACLE_SCD2
