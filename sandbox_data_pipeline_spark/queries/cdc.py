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


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/cdc.py: table_diff): the 'old' snapshot
    is derived deterministically from orders — every 7th key missing
    (appears as added), every 5th key's total perturbed (appears as
    changed) — so both engines reconstruct identical snapshots and the
    diff is exact. One full-outer join on the key; output rows ∝ drift."""
    from sandbox_data_pipeline_spark.operators.cdc import table_diff

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = o.where(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    diff = table_diff(old, o, ["o_orderkey"], ["o_totalprice", "o_orderstatus"])
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


ORACLE["q_table_diff"] = """
WITH old_snap AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 7 <> 0
),
diff AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         CASE WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
               AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                THEN NULL
              ELSE 'changed' END AS change_type
  FROM old_snap o
  FULL OUTER JOIN (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders) n
    ON o.o_orderkey = n.o_orderkey
)
SELECT change_type, COUNT(*) AS n_keys,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM diff WHERE change_type IS NOT NULL
GROUP BY change_type
"""
QUERIES["q_table_diff"] = q_table_diff


def q_rollup_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators/cdc.py: merge_rollup):
    the first 80% of events by id form the maintained rollup, the rest
    arrive as a delta; folding the delta's partial aggregate in must
    equal the full recompute the oracle runs. Measures are exact
    decimals so partial-sum merge order cannot drift."""
    from sandbox_data_pipeline_spark.operators.cdc import merge_rollup

    e = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    cut = e.agg((F.max("event_id") * 0.8).cast("long").alias("c"))

    def rollup(df):
        return df.groupBy("event_type").agg(
            F.sum("v").cast("decimal(18,6)").alias("sum_value"),
            F.count(F.lit(1)).alias("n"),
        )

    base = rollup(e.crossJoin(F.broadcast(cut)).where(F.col("event_id") <= F.col("c")))
    delta = rollup(e.crossJoin(F.broadcast(cut)).where(F.col("event_id") > F.col("c")))
    merged = merge_rollup(base, delta, ["event_type"], ["sum_value"], "n")
    return merged.select(
        "event_type",
        F.col("sum_value").cast("decimal(18,6)").alias("sum_value"),
        "n",
    )


ORACLE["q_rollup_ivm"] = """
SELECT event_type,
       (SUM(value::DECIMAL(18,6)))::DECIMAL(18,6) AS sum_value,
       COUNT(*) AS n
FROM events
GROUP BY event_type
"""
QUERIES["q_rollup_ivm"] = q_rollup_ivm
