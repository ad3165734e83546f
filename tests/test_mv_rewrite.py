"""Materialized-view auto-rewrite: fingerprint hits substitute the
materialized scan, misses pass through, refresh picks up base-table
changes, and the substituted plan actually reads the MV parquet."""

from __future__ import annotations

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.plans.mv import (
    MaterializedViewCatalog,
    plan_fingerprint,
)

SF = "/root/testdata/sf0.001"


def _agg(spark):
    return (
        table(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("total"))
    )


def test_fingerprint_stable_across_builds(spark):
    assert plan_fingerprint(_agg(spark)) == plan_fingerprint(_agg(spark))


def test_fingerprint_distinguishes_different_queries(spark):
    other = (
        table(spark, SF, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("total"))
    )
    assert plan_fingerprint(_agg(spark)) != plan_fingerprint(other)


def test_rewrite_hit_returns_same_rows_from_mv_scan(spark, tmp_path):
    cat = MaterializedViewCatalog(spark, str(tmp_path / "mv"))
    cat.create("prio_rollup", _agg(spark))
    rewritten, hit = cat.rewrite(_agg(spark))
    assert hit == "prio_rollup"
    # the substituted plan must be a parquet scan of the MV store,
    # not the original aggregation
    plan = rewritten._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan and "parquet" in plan
    assert all("/mv/" in f for f in rewritten.inputFiles())
    want = {tuple(r) for r in _agg(spark).collect()}
    got = {tuple(r) for r in rewritten.collect()}
    assert got == want


def test_rewrite_miss_passes_through(spark, tmp_path):
    cat = MaterializedViewCatalog(spark, str(tmp_path / "mv"))
    cat.create("prio_rollup", _agg(spark))
    q = _agg(spark).where(F.col("n") > 0)
    rewritten, hit = cat.rewrite(q)
    assert hit is None and rewritten is q


def test_refresh_and_drop(spark, tmp_path):
    cat = MaterializedViewCatalog(spark, str(tmp_path / "mv"))
    cat.create("v", _agg(spark))
    cat.refresh("v", _agg(spark))
    _, hit = cat.rewrite(_agg(spark))
    assert hit == "v"
    cat.drop("v")
    _, hit = cat.rewrite(_agg(spark))
    assert hit is None


def _agg2(spark, *groups):
    return (
        table(spark, SF, "orders")
        .groupBy(*groups)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("total"),
            F.min("o_orderdate").alias("first_d"),
        )
    )


def test_rollup_subsumption_derives_subset_grouping(spark, tmp_path):
    from sandbox_data_pipeline_spark.plans.mv import RollupRewriteCatalog

    cat = RollupRewriteCatalog(spark, str(tmp_path / "mv"))
    cat.create("by_prio_status", _agg2(spark, "o_orderpriority", "o_orderstatus"))
    q = _agg2(spark, "o_orderpriority")
    rewritten, hit = cat.rewrite(q)
    assert hit == "by_prio_status"
    # derived plan aggregates the MV parquet, not the base table
    assert all("/mv/" in f for f in rewritten.inputFiles())
    want = {tuple(r) for r in q.collect()}
    got = {tuple(r) for r in rewritten.collect()}
    assert got == want


def test_rollup_subsumption_rejects_nonderivable(spark, tmp_path):
    from sandbox_data_pipeline_spark.plans.mv import RollupRewriteCatalog

    cat = RollupRewriteCatalog(spark, str(tmp_path / "mv"))
    cat.create("by_prio_status", _agg2(spark, "o_orderpriority", "o_orderstatus"))
    # avg is not decomposable from this view's recorded aggregates
    q = (
        table(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .agg(F.avg("o_totalprice").alias("avg_total"))
    )
    _, hit = cat.rewrite(q)
    assert hit is None
    # grouping by a column OUTSIDE the view's keys must also miss
    q2 = _agg2(spark, "o_custkey")
    _, hit2 = cat.rewrite(q2)
    assert hit2 is None


def test_rollup_subsumption_exact_match_still_wins(spark, tmp_path):
    from sandbox_data_pipeline_spark.plans.mv import RollupRewriteCatalog

    cat = RollupRewriteCatalog(spark, str(tmp_path / "mv"))
    cat.create("by_prio_status", _agg2(spark, "o_orderpriority", "o_orderstatus"))
    same = _agg2(spark, "o_orderpriority", "o_orderstatus")
    rewritten, hit = cat.rewrite(same)
    assert hit == "by_prio_status"
    plan = rewritten._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan  # exact hit: plain scan, no re-agg
