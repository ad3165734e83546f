"""Bucketed co-located joins: two tables bucketed on the join key join
with NO shuffle on either side (the SCALE.md fact-fact join pattern)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.sinks.writers import save_bucketed

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    o = table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    l = table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    # sf0.001 tables broadcast by default, which hides the property under
    # test; at real fact-fact scale neither side broadcasts.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        save_bucketed(o, "b_orders", "o_orderkey", buckets=8, path=str(tmp_path / "o"))
        save_bucketed(
            l.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem", "o_orderkey", buckets=8, path=str(tmp_path / "l"),
        )
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bo.join(bl, "o_orderkey")
        plan = _plan(joined)
        assert "Exchange" not in plan  # no shuffle, no broadcast — co-located
        # and it still computes the right thing
        expect = l.join(o, l.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expect
        # the unbucketed source join DOES shuffle (control)
        control = _plan(l.join(o, l.l_orderkey == o.o_orderkey))
        assert "Exchange" in control and "hashpartitioning" in control
    finally:
        # conf.get(key, None) returns None when the conf was never
        # explicitly set — restoring must UNSET in that case, or the
        # "-1" leaks into every later test on the shared session
        # (caught by test_plan_shapes.test_diff_in_diff_broadcasts).
        if prev is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        else:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_ann_index_probe_join_has_no_exchange(spark, tmp_path):
    """Substantiates SCALE.md: build_ann_index output saved bucketed on
    list_id joins a same-bucketed probe table with NO Exchange on
    either side — the pay-the-shuffle-once-at-write-time pattern
    applied to the ANN serving index."""
    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.operators.similarity import build_ann_index
    from sandbox_data_pipeline_spark.sinks.writers import save_bucketed

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = build_ann_index(emb, dim=64, planes=8, n_centroids=8)
    save_bucketed(idx, "ann_idx_t", "list_id", buckets=8, path=str(tmp_path / "idx"))
    save_bucketed(
        idx.select("list_id", "vec_id"),
        "ann_probe_t",
        "list_id",
        buckets=8,
        path=str(tmp_path / "probe"),
    )
    try:
        a = spark.table("ann_idx_t")
        b = spark.table("ann_probe_t").withColumnRenamed("vec_id", "probe_id")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                a.join(b, "list_id")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS ann_idx_t")
        spark.sql("DROP TABLE IF EXISTS ann_probe_t")
