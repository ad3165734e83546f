"""Skew operators: salted join equivalence to the plain join, salt
determinism, and the skew diagnostic."""

from __future__ import annotations

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.operators.skew import (
    key_skew_report,
    salted_join,
    with_salt,
)


def _skewed(spark):
    # key 1 holds 90% of the fact side
    rows = [(1 if i < 900 else i % 50 + 2, float(i)) for i in range(1000)]
    big = spark.createDataFrame(rows, "k long, v double")
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(1, 60)], "k long, name string")
    return big, dim


def test_salted_join_equals_plain_join(spark):
    big, dim = _skewed(spark)
    plain = big.join(dim, "k", "inner").select("k", "v", "name")
    salted = salted_join(big, dim, on="k", salt_factor=4).select("k", "v", "name")
    assert sorted(map(str, plain.collect())) == sorted(map(str, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big, dim = _skewed(spark)
    only_big = big.withColumn("k", F.col("k") + 1000)  # no dim match
    out = salted_join(only_big, dim, on="k", how="left", salt_factor=4)
    assert out.count() == 1000
    assert out.where(F.col("name").isNotNull()).count() == 0


def test_salt_is_deterministic(spark):
    big, _ = _skewed(spark)
    a = with_salt(big, 8).collect()
    b = with_salt(big, 8).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    assert all(0 <= r["_salt"] < 8 for r in a)


def test_key_skew_report_flags_hot_key(spark):
    big, _ = _skewed(spark)
    top = key_skew_report(big, "k", top=3).collect()
    assert top[0].k == 1 and top[0].key_cnt == 900
    assert abs(top[0].share - 0.9) < 1e-9
