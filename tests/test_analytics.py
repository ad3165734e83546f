"""Invariant checks for the behavioral-analytics queries."""

from __future__ import annotations

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.queries.analytics import (
    q_dq_referential,
    q_grouping_sets,
    q_retention_cohorts,
    q_rfm_segments,
)


def test_retention_week0_counts_every_user(spark, sf_dir):
    rows = q_retention_cohorts(spark, sf_dir).collect()
    week0 = sum(r.active_users for r in rows if r.week_since == 0)
    users = table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert week0 == users  # every user is active in their own cohort week
    assert all(r.week_since >= 0 for r in rows)


def test_rfm_partitions_customers(spark, sf_dir):
    rows = q_rfm_segments(spark, sf_dir).collect()
    custs = table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    assert sum(r.customers for r in rows) == custs


def test_grouping_sets_grains(spark, sf_dir):
    rows = q_grouping_sets(spark, sf_dir).collect()
    li_cnt = table(spark, sf_dir, "lineitem").count()
    # grand-total row (both columns grouped out) counts everything once
    totals = [r for r in rows if r.l_returnflag is None and r.l_linestatus is None]
    assert len(totals) == 1 and totals[0].line_cnt == li_cnt
    # each single-column grain also partitions the table
    for grain_col in ("l_returnflag", "l_linestatus"):
        grain_rows = [r for r in rows if r[grain_col] is not None]
        assert sum(r.line_cnt for r in grain_rows) == li_cnt


def test_referential_integrity_clean_corpus(spark, sf_dir):
    rows = {r.relation: r.orphan_rows for r in q_dq_referential(spark, sf_dir).collect()}
    assert len(rows) == 5
    # the synthetic star schema is referentially intact
    assert all(v == 0 for v in rows.values())
