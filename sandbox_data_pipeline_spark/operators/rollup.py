"""Hypertable-style cascading time rollups (continuous aggregates).

The pattern: aggregate raw events once at the finest resolution
(hourly), then derive every coarser resolution (daily, monthly) FROM
the finer aggregate by re-aggregation — sums of sums, sums of counts,
ratios recomputed at the end. At 100 TB the hourly aggregate is
~|hours|·|keys| rows (~1e-6 of the raw table); the daily rollup reads
that, not the raw events, so each coarser tier costs proportionally
nothing. This is the batch form of the hypertable/continuous-aggregate
idea; the streaming form is streaming/hourly.py's windowed rollup over
the same shape.

Only algebraic aggregates cascade (sum, count, min, max — and avg as
sum/count at presentation time). Holistic ones (median, exact
distinct) do not; use sketches (approx_count_distinct) whose partial
states merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_aggregate(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Finest-tier aggregate. Sums are carried as DECIMAL: decimal
    addition is exact and associative, so a cascaded sum-of-sums is
    bit-identical to a direct sum regardless of grouping order or
    partition layout — double sums drift at the ulp level with
    summation order, which flips round() at tier boundaries."""
    return events.groupBy(
        F.date_trunc("hour", F.col(ts_col)).alias("bucket_start"), F.col(key_col)
    ).agg(
        F.count(F.lit(1)).alias("event_cnt"),
        F.sum(F.col(value_col).cast("decimal(28,8)")).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def cascade(aggregated: DataFrame, to: str, key_col: str = "event_type") -> DataFrame:
    """Re-aggregate a finer tier into a coarser one (``to`` ∈
    date_trunc units: 'day', 'week', 'month', ...)."""
    return aggregated.groupBy(
        F.date_trunc(to, F.col("bucket_start")).alias("bucket_start"), F.col(key_col)
    ).agg(
        F.sum("event_cnt").alias("event_cnt"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def present(aggregated: DataFrame) -> DataFrame:
    """Presentation projection: rounded sums, derived average."""
    return aggregated.select(
        "bucket_start",
        "event_type",
        F.col("event_cnt").cast("long").alias("event_cnt"),
        F.round("sum_value", 4).cast("double").alias("sum_value"),
        # avg = rounded-sum / count as plain IEEE double division with NO
        # final round: engines disagree on decimal half-way rounding
        # (Spark HALF_UP vs DuckDB down), but the same division on the
        # same inputs is bit-identical everywhere
        (F.round("sum_value", 4).cast("double") / F.col("event_cnt")).alias("avg_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
    )
