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


def test_unpivot_inverts_wide(spark, sf_dir):
    from sandbox_data_pipeline_spark.queries.analytics import q_unpivot

    rows = q_unpivot(spark, sf_dir).collect()
    segs = {r.c_mktsegment for r in rows}
    assert all(
        len([r for r in rows if r.c_mktsegment == s]) == 3 for s in segs
    )  # 3 measures per segment
    by = {(r.c_mktsegment, r.measure): r.value for r in rows}
    for s in segs:
        assert by[(s, "min_bal")] <= by[(s, "max_bal")]


def test_safe_casts_quarantines_instead_of_throwing(spark, sf_dir):
    from sandbox_data_pipeline_spark.queries.analytics import q_safe_casts

    rows = q_safe_casts(spark, sf_dir).collect()
    assert sum(r.n_bogus_parsed for r in rows) == 0  # blob never parses
    total = sum(r.n_rows for r in rows)
    assert sum(r.n_k_parsed for r in rows) == total  # k always parses
    assert sum(r.n_ratio_ok for r in rows) < total  # some /0 quarantined


def test_group_quantiles_ordered(spark, sf_dir):
    from sandbox_data_pipeline_spark.queries.analytics import q_group_quantiles

    for r in q_group_quantiles(spark, sf_dir).collect():
        assert r.p25 <= r.p50 <= r.p75


def test_hll_rollup_merge_matches_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.queries.analytics import q_hll_rollup

    est = {r.event_type: r.est_users for r in q_hll_rollup(spark, sf_dir).collect()}
    exact = {
        r.event_type: r.n
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        # HLL default lgConfigK=12 → ~1.6% relative error; sketch union
        # is lossless w.r.t. the individual sketches
        assert abs(est[t] - n) / n < 0.05, (t, est[t], n)
