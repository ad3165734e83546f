"""Operator-level checks for the relational query surface.

Deep equivalence vs DuckDB is covered by tools/check_oracle.py (the
driver's gate); these tests pin semantics and plan shape properties
that the oracle can't see (broadcast usage, pushdown, limit plans).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.queries import registry
from sandbox_data_pipeline_spark.queries.relational import (
    q_agg_basic,
    q_filter_basic,
    q_join_anti,
    q_join_broadcast,
    q_latest_per_key,
    q_sort_limit,
    q_top5,
    q_window_rank,
)


def test_registry_contract():
    queries, oracle = registry()
    assert len(queries) >= 26
    assert set(oracle) <= set(queries)
    for name in queries:
        assert name.startswith("q_")


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = q_filter_basic(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "l_returnflag" in plan.split("PushedFilters")[1][:200]


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = q_join_broadcast(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_sort_limit_uses_take_ordered(spark, sf_dir):
    plan = q_sort_limit(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_agg_basic_values(spark, sf_dir):
    rows = {(r.l_returnflag, r.l_linestatus): r for r in q_agg_basic(spark, sf_dir).collect()}
    li = table(spark, sf_dir, "lineitem")
    total = li.count()
    assert sum(r.count_order for r in rows.values()) == total
    for r in rows.values():
        assert abs(r.avg_qty * r.count_order - r.sum_qty) / max(r.sum_qty, 1) < 1e-3


def test_top5_is_sorted_desc(spark, sf_dir):
    vals = [r.c_acctbal for r in q_top5(spark, sf_dir).collect()]
    assert len(vals) == 5
    assert vals == sorted(vals, reverse=True)


def test_window_rank_bounds(spark, sf_dir):
    rows = q_window_rank(spark, sf_dir).collect()
    per_seg: dict[str, list[int]] = {}
    for r in rows:
        per_seg.setdefault(r.c_mktsegment, []).append(r.rank_in_seg)
    for ranks in per_seg.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_latest_per_key_unique(spark, sf_dir):
    df = q_latest_per_key(spark, sf_dir)
    assert df.count() == df.select("user_id").distinct().count()


def test_join_anti_complements_semi(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    n_semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    n_anti = q_join_anti(spark, sf_dir).count()
    assert n_semi + n_anti == c.count()


def test_events_ts_is_microsecond_timestamp(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    assert dict(e.dtypes)["ts"] == "timestamp"
    assert e.where(F.col("ts") < F.lit("2000-01-01")).count() == 0


def test_outliers_zscore_threshold(spark):
    from sandbox_data_pipeline_spark.queries.relational import q_outliers

    rows = q_outliers(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert abs(r.z_score) > 3


def test_gap_fill_dense_and_consistent(spark):
    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.queries.relational import q_gap_fill

    out = q_gap_fill(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    hours = {r.hour_start for r in rows}
    types = {r.event_type for r in rows}
    # dense grid: every (hour, type) cell present exactly once
    assert len(rows) == len(hours) * len(types)
    # zero-filled cells exist and totals reconcile with the raw table
    assert any(r.n_events == 0 for r in rows)
    total = sum(r.n_events for r in rows)
    assert total == table(spark, "/root/testdata/sf0.001", "events").count()


def test_winsorize_bounds_and_tails(spark):
    from sandbox_data_pipeline_spark.queries.relational import q_winsorize

    rows = q_winsorize(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.p01 <= r.p99
        # each tail clamps at most ~1% of rows (interpolated bound)
        assert r.n_clamped_low <= r.n_total * 0.011 + 1
        assert r.n_clamped_high <= r.n_total * 0.011 + 1
