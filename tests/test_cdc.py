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
