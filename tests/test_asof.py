"""As-of join semantics: backward match, equal-ts inclusion, no-match
nulls — against hand-built frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "a"),
            (1, "2024-01-01 12:00:00", "b"),
            (2, "2024-01-01 09:00:00", "c"),  # before any right row
            (3, "2024-01-01 10:30:00", "d"),  # key absent on right
        ],
        "k long, ts string, tag string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:30:00", 10.0),
            (1, "2024-01-01 12:00:00", 20.0),  # equal-ts: must match row b
            (2, "2024-01-01 11:00:00", 30.0),
        ],
        "k long, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    return left, right


def test_asof_backward_equal_ts_and_no_match(spark):
    left, right = _frames(spark)
    out = {r.tag: r for r in asof_join(left, right, by="k").collect()}
    assert out["a"].v_asof == 10.0
    assert out["b"].v_asof == 20.0  # right row at identical ts matches
    assert str(out["b"].ts_asof) == "2024-01-01 12:00:00"
    assert out["c"].v_asof is None and out["c"].ts_asof is None
    assert out["d"].v_asof is None
    assert len(out) == 4  # left outer: every left row survives
