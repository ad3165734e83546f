"""Plan-shape and invariant checks for the TPC-H-adapted suite.

Value equivalence vs DuckDB is covered by tools/check_oracle.py; these
tests pin the physical-plan properties the oracle can't see — pushdown,
broadcast of fixed-size dims, top-K execution strategy — plus a few
cheap semantic invariants at sf0.001.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.queries.tpch import (
    QUERIES,
    q_tpch_q01,
    q_tpch_q03,
    q_tpch_q05,
    q_tpch_q13,
    q_tpch_q15,
    q_tpch_q18,
    q_tpch_q22,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_all_queries_have_oracles():
    from sandbox_data_pipeline_spark.queries.tpch import ORACLE

    assert set(ORACLE) == set(QUERIES)
    assert len(QUERIES) == 20


def test_q01_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(q_tpch_q01(spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:300]


def test_q01_totals_are_exact_decimal(spark, sf_dir):
    rows = q_tpch_q01(spark, sf_dir).collect()
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("2001-09-01"))
    )
    assert sum(r.count_order for r in rows) == li.count()
    for r in rows:
        assert isinstance(r.sum_disc_price, Decimal)
        # disc price never exceeds base price, charge never below it
        assert r.sum_disc_price <= r.sum_base_price
        assert r.sum_charge >= r.sum_disc_price


def test_q03_uses_take_ordered(spark, sf_dir):
    assert "TakeOrderedAndProject" in _plan(q_tpch_q03(spark, sf_dir))


def test_q05_broadcasts_fixed_dims(spark, sf_dir):
    assert "BroadcastHashJoin" in _plan(q_tpch_q05(spark, sf_dir))


def test_q13_counts_every_customer(spark, sf_dir):
    dist = q_tpch_q13(spark, sf_dir).collect()
    total = sum(r.custdist for r in dist)
    assert total == table(spark, sf_dir, "customer").count()


def test_q15_returns_the_max(spark, sf_dir):
    rows = q_tpch_q15(spark, sf_dir).collect()
    assert len(rows) >= 1
    revs = {r.total_rev for r in rows}
    assert len(revs) == 1  # all tied at the max


def test_q18_threshold_respected(spark, sf_dir):
    for r in q_tpch_q18(spark, sf_dir).collect():
        assert r.sum_qty > 300


def test_q22_excludes_recent_orderers(spark, sf_dir):
    plan = _plan(q_tpch_q22(spark, sf_dir))
    assert "LeftAnti" in plan


def test_no_cartesian_products(spark, sf_dir):
    # the only cross joins are broadcast scalar aggregates (1-row sides)
    for name, fn in QUERIES.items():
        plan = _plan(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
