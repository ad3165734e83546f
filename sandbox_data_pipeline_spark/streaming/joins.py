"""Stream-stream joins: watermarked interval attribution.

The reference's streams never meet each other (its two branches join
only at the warehouse — SURVEY §2.8 marks stateful stream ops as
Spark-native surplus), but any events pipeline that publishes both
impressions and conversions needs the join between them. This module
implements view→click attribution as a watermarked stream-stream
interval join:

- equi-key on ``user_id`` (state is hash-partitioned by it), plus a
  time-range predicate ``view_ts <= click_ts <= view_ts + horizon``;
- BOTH sides carry watermarks, so Spark derives state-eviction bounds
  from the interval condition: a buffered view can be dropped once the
  click watermark passes ``view_ts + horizon``, a buffered click once
  the view watermark passes ``click_ts``. State is bounded by
  watermark horizon × arrival rate, never stream lifetime.

The builder is mode-agnostic: the same plan compiles as a streaming
join (with state) or a batch range join, which is exactly how the
tests pin stream==batch equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_clicks(
    views: DataFrame,
    clicks: DataFrame,
    horizon_minutes: int = 30,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join each click to every view by the same user within the
    preceding ``horizon_minutes``.

    ``views``/``clicks`` are event frames (``EVENT_SCHEMA`` shape),
    streaming or batch. ``how='left_outer'`` additionally emits
    never-clicked views once their join window expires (streaming
    outer joins require exactly this watermark + interval shape).
    """
    v = views.select(
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    ).withWatermark("view_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    ).withWatermark("click_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {int(horizon_minutes)} MINUTES"))
    )
    return v.join(c, cond, how).select(
        "user_id", "view_id", "view_ts", "click_id", "click_ts", "click_value"
    )


def split_views_clicks(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split one event stream into its view/click substreams. Two
    filters over the same source are two independent streaming scans —
    each maintains its own file-source offsets, which is the supported
    shape for self-joining a stream."""
    return (
        events.where(F.col("event_type") == "view"),
        events.where(F.col("event_type") == "click"),
    )
