"""merge_upsert / scd2_history semantics (operators/cdc.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.operators.cdc import merge_upsert, scd2_history


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_merge_upsert_newest_wins_and_idempotent(spark):
    target = _df(spark, [(1, 1, "a"), (2, 1, "b")], ["k", "v", "payload"])
    updates = _df(spark, [(1, 2, "a2"), (3, 1, "c")], ["k", "v", "payload"])
    merged = merge_upsert(target, updates, ["k"], ["v"])
    got = {r["k"]: (r["v"], r["payload"]) for r in merged.collect()}
    assert got == {1: (2, "a2"), 2: (1, "b"), 3: (1, "c")}

    # Re-applying the same batch changes nothing (idempotent merge).
    again = merge_upsert(merged, updates, ["k"], ["v"])
    assert {r["k"]: (r["v"], r["payload"]) for r in again.collect()} == got


def test_merge_upsert_tie_prefers_update(spark):
    target = _df(spark, [(1, 1, "old")], ["k", "v", "payload"])
    updates = _df(spark, [(1, 1, "new")], ["k", "v", "payload"])
    merged = merge_upsert(target, updates, ["k"], ["v"])
    assert merged.collect()[0]["payload"] == "new"


def test_merge_upsert_tombstone_deletes_key(spark):
    target = _df(spark, [(1, 1, False), (2, 1, False)], ["k", "v", "gone"])
    updates = _df(spark, [(1, 2, True)], ["k", "v", "gone"])
    merged = merge_upsert(target, updates, ["k"], ["v"], delete_col="gone")
    assert [r["k"] for r in merged.collect()] == [2]
    assert "gone" not in merged.columns


def test_scd2_collapses_runs_and_builds_intervals(spark):
    changes = _df(
        spark,
        [
            (1, 1, "x"),
            (1, 2, "x"),  # unchanged → collapses into version 1
            (1, 3, "y"),
            (2, 1, "z"),
        ],
        ["k", "seq", "attr"],
    )
    hist = scd2_history(changes, ["k"], ["seq"], ["attr"]).orderBy("k", "valid_from_seq")
    rows = [
        (r["k"], r["attr"], r["valid_from_seq"], r["valid_to_seq"], r["is_current"])
        for r in hist.collect()
    ]
    assert rows == [
        (1, "x", 1, 3, False),
        (1, "y", 3, None, True),
        (2, "z", 1, None, True),
    ]


def test_scd2_null_safe_change_detection(spark):
    changes = _df(
        spark,
        [(1, 1, None), (1, 2, None), (1, 3, "a"), (1, 4, None)],
        ["k", "seq", "attr"],
    )
    hist = scd2_history(changes, ["k"], ["seq"], ["attr"])
    # null → null is NOT a change; null → 'a' and 'a' → null are.
    assert hist.count() == 3


def test_scd2_single_shuffle_plan(spark):
    """The whole history build must be one exchange on the key —
    change-detection and interval windows share the same partitioning."""
    changes = _df(spark, [(1, 1, "x"), (1, 2, "y")], ["k", "seq", "attr"])
    plan = scd2_history(changes, ["k"], ["seq"], ["attr"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_table_diff_all_three_classes(spark):
    from pyspark.sql import functions as F

    from sandbox_data_pipeline_spark.operators.cdc import table_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, None), (5, "e")], ["k", "v"]
    )
    got = {(r.k, r.change_type) for r in table_diff(old, new, ["k"]).collect()}
    assert got == {(1, "removed"), (3, "changed"), (5, "added")}
    # null-safe: key 4 (NULL == NULL) is unchanged, key 2 identical


def test_table_diff_null_transitions(spark):
    from sandbox_data_pipeline_spark.operators.cdc import table_diff

    old = spark.createDataFrame([(1, None), (2, "x")], ["k", "v"])
    new = spark.createDataFrame([(1, "now"), (2, None)], ["k", "v"])
    got = {(r.k, r.change_type) for r in table_diff(old, new, ["k"]).collect()}
    assert got == {(1, "changed"), (2, "changed")}


def test_merge_rollup_equals_full_recompute(spark, sf_dir):
    from decimal import Decimal

    from pyspark.sql import functions as F

    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.operators.cdc import merge_rollup

    e = table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("decimal(18,6)").alias("v")
    )

    def rollup(df):
        return df.groupBy("event_type").agg(
            F.sum("v").alias("sum_value"), F.count(F.lit(1)).alias("n")
        )

    base = rollup(e.where(F.col("event_id") % 3 != 0))
    delta = rollup(e.where(F.col("event_id") % 3 == 0))
    merged = {
        r.event_type: (r.sum_value, r.n)
        for r in merge_rollup(base, delta, ["event_type"], ["sum_value"], "n").collect()
    }
    full = {r.event_type: (r.sum_value, r.n) for r in rollup(e).collect()}
    assert merged == full
