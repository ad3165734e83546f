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


# ---- filter subsumption (round 8) ----


def _orders(spark):
    return table(spark, SF, "orders")


def test_filter_subsumption_hit(spark, tmp_path):
    from sandbox_data_pipeline_spark.plans.mv import RollupRewriteCatalog

    cat = RollupRewriteCatalog(spark, str(tmp_path / "mv"))
    cat.create("recent", _orders(spark).where(F.col("o_custkey") >= 100))
    q = _orders(spark).where(F.col("o_custkey") >= 500)
    rewritten, hit = cat.rewrite(q)
    assert hit == "recent"
    assert all("/mv/" in f for f in rewritten.inputFiles())
    assert {tuple(r) for r in rewritten.collect()} == {
        tuple(r) for r in q.collect()
    }
    # boundary: the SAME predicate also implies itself (exact-fp hit
    # or filter hit — either way the rows come from the MV)
    q2 = _orders(spark).where(F.col("o_custkey") >= 100)
    r2, hit2 = cat.rewrite(q2)
    assert hit2 == "recent"
    assert {tuple(r) for r in r2.collect()} == {tuple(r) for r in q2.collect()}


def test_filter_subsumption_miss_non_implied(spark, tmp_path):
    from sandbox_data_pipeline_spark.plans.mv import RollupRewriteCatalog

    cat = RollupRewriteCatalog(spark, str(tmp_path / "mv"))
    cat.create("recent", _orders(spark).where(F.col("o_custkey") >= 100))
    # wider range does NOT imply the view's — must pass through
    _, hit = cat.rewrite(_orders(spark).where(F.col("o_custkey") >= 50))
    assert hit is None
    # open vs closed at the same bound: > 99 includes nothing extra,
    # but >= 99 includes 99 which the view may lack
    _, hit2 = cat.rewrite(_orders(spark).where(F.col("o_custkey") >= 99))
    assert hit2 is None


def test_filter_subsumption_miss_column_mismatch(spark, tmp_path):
    from sandbox_data_pipeline_spark.plans.mv import RollupRewriteCatalog

    cat = RollupRewriteCatalog(spark, str(tmp_path / "mv"))
    cat.create("recent", _orders(spark).where(F.col("o_custkey") >= 100))
    _, hit = cat.rewrite(_orders(spark).where(F.col("o_orderkey") >= 100))
    assert hit is None


def test_filter_subsumption_string_equality(spark, tmp_path):
    from sandbox_data_pipeline_spark.plans.mv import RollupRewriteCatalog

    cat = RollupRewriteCatalog(spark, str(tmp_path / "mv"))
    cat.create(
        "urgent", _orders(spark).where(F.col("o_orderpriority") == "1-URGENT")
    )
    q = _orders(spark).where(F.col("o_orderpriority") == "1-URGENT")
    rewritten, hit = cat.rewrite(q)
    assert hit == "urgent"
    assert rewritten.count() == q.count()
    # a different value must miss; string RANGES are declared out of scope
    _, miss = cat.rewrite(
        _orders(spark).where(F.col("o_orderpriority") == "2-HIGH")
    )
    assert miss is None


def test_filter_parts_rejects_compound_predicates(spark):
    from sandbox_data_pipeline_spark.plans.mv import filter_parts

    d = _orders(spark)
    assert filter_parts(
        d.where((F.col("o_custkey") >= 1) & (F.col("o_custkey") < 9))
    ) is None
    assert filter_parts(d.where(F.col("o_custkey") + 1 > 5)) is None
    assert filter_parts(d) is None  # no Filter head at all


def test_predicate_implies_table():
    from sandbox_data_pipeline_spark.plans.mv import predicate_implies

    c = "x"
    yes = [
        ((c, ">=", 7), (c, ">=", 5)),
        ((c, ">", 5), (c, ">=", 5)),
        ((c, "=", 5), (c, ">=", 5)),
        ((c, "=", 5), (c, "<=", 5)),
        ((c, "<", 3), (c, "<=", 3)),
        ((c, ">=", 5), (c, ">", 4)),
        ((c, "=", "a"), (c, "=", "a")),
    ]
    no = [
        ((c, ">=", 5), (c, ">", 5)),   # q includes 5, v excludes it
        ((c, ">=", 4), (c, ">=", 5)),
        ((c, "<=", 5), (c, ">=", 5)),
        ((c, ">=", 5), ("y", ">=", 5)),
        ((c, ">=", "a"), (c, ">=", "a")),  # string ranges out of scope
        ((c, "=", "a"), (c, "=", "b")),
    ]
    for q, v in yes:
        assert predicate_implies(q, v), (q, v)
    for q, v in no:
        assert not predicate_implies(q, v), (q, v)


# ---- plan-printer drift canaries (round 8) ----


def test_printer_drift_canary_aggregate(spark):
    """CANARY: aggregate_parts must parse today's analyzed-plan
    printer. If a Spark upgrade changes the Aggregate head format this
    fails LOUDLY here, while production rewrite degrades to no-hit
    (next test) instead of substituting wrongly."""
    from sandbox_data_pipeline_spark.plans.mv import aggregate_parts

    parts = aggregate_parts(_agg2(spark, "o_orderpriority", "o_orderstatus"))
    assert parts is not None
    groups, aggs, child_fp = parts
    assert groups == ["o_orderpriority", "o_orderstatus"]
    assert [a[0] for a in aggs] == ["count", "sum", "min"]
    assert child_fp


def test_printer_drift_canary_filter(spark):
    from sandbox_data_pipeline_spark.plans.mv import filter_parts

    parts = filter_parts(_orders(spark).where(F.col("o_custkey") >= 100))
    assert parts is not None
    col, op, lit, child_fp = parts
    assert (col, op, lit) == ("o_custkey", ">=", 100) and child_fp


def test_printer_drift_degrades_to_no_rewrite(spark, tmp_path, monkeypatch):
    """If the head regexes stop matching (printer drift), rewrite must
    return no-hit — NEVER a wrong substitution."""
    import re as _re

    from sandbox_data_pipeline_spark.plans import mv as mv_mod

    cat = mv_mod.RollupRewriteCatalog(spark, str(tmp_path / "mv"))
    cat.create("by_both", _agg2(spark, "o_orderpriority", "o_orderstatus"))
    cat.create("recent", _orders(spark).where(F.col("o_custkey") >= 100))
    never = _re.compile(r"(?!x)x")
    monkeypatch.setattr(mv_mod, "_AGG_HEAD", never)
    monkeypatch.setattr(mv_mod, "_FILTER_HEAD", never)
    q_roll = _agg2(spark, "o_orderpriority")
    out, hit = cat.rewrite(q_roll)
    assert hit is None and out is q_roll
    q_filt = _orders(spark).where(F.col("o_custkey") >= 500)
    out2, hit2 = cat.rewrite(q_filt)
    assert hit2 is None and out2 is q_filt
