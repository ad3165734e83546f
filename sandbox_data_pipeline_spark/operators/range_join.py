"""Banded range join — the second custom join Spark lacks natively.

Match (l, r) pairs in the same key group with
``r.ts ∈ [l.ts + lower, l.ts + upper]`` (inclusive). The naive plan is
an inequality join: Spark can only execute it as a per-key cross
product filtered afterwards — O(|L|·|R|) per key, hopeless at scale.

Banding fixes the complexity: with bucket width w = upper - lower,
every right row lands in exactly one bucket floor(ts/w), and a left
row's admissible window [ts+lower, ts+upper] spans AT MOST TWO buckets.
Left emits one row per covered bucket (≤2), the join becomes an
equi-join on (key, bucket) — hash-joinable, AQE-eligible — and the
exact interval predicate filters the survivors. A right row is in one
bucket, so no pair is produced twice. Cost: ≤2× the left rows shuffled,
candidates bounded by bucket co-occupancy, not group size.

Timestamps are compared at microsecond precision (unix_micros), the
native resolution of Spark's TimestampType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "_rj_bucket"


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    lower_s: float,
    upper_s: float,
    ts_col: str = "ts",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner banded range join on ``by``. Output columns are every
    non-key column of each side, prefixed, plus ``by``."""
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    lo_us = int(lower_s * 1_000_000)
    hi_us = int(upper_s * 1_000_000)
    w_us = hi_us - lo_us

    lcols = [c for c in left.columns if c != by]
    rcols = [c for c in right.columns if c != by]

    l2 = left.select(
        F.col(by),
        F.unix_micros(F.col(ts_col)).alias("_l_us"),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in lcols],
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.expr(f"(_l_us + {lo_us}) div {w_us}"),
                F.expr(f"(_l_us + {hi_us}) div {w_us}"),
            )
        ).alias(BUCKET_COL),
    )
    r2 = right.select(
        F.col(by),
        F.unix_micros(F.col(ts_col)).alias("_r_us"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rcols],
    ).withColumn(BUCKET_COL, F.expr(f"_r_us div {w_us}"))

    return (
        l2.join(r2, [by, BUCKET_COL])
        .where(
            (F.col("_r_us") >= F.col("_l_us") + lo_us)
            & (F.col("_r_us") <= F.col("_l_us") + hi_us)
        )
        .drop(BUCKET_COL, "_l_us", "_r_us")
    )
