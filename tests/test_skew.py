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


def test_aqe_skew_split_fires_on_skewed_smj(spark):
    """Proof the AQE skew-join machinery actually engages (SCALE.md's
    claim is measured, not assumed): a 30%-hot-key sort-merge join
    with broadcast disabled must show skew=true splits in the final
    adaptive plan. Rig notes baked into the fixture — the skewed
    reduce partition is only splittable along MAP-block boundaries
    (multi-split input required) and the detector compares COMPRESSED
    bytes (payload must not compress away the row skew)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(0, 400000, 1, 16).select(
            F.when(F.col("id") % 10 < 3, F.lit(0))
            .otherwise(F.col("id") % 20000)
            .alias("k"),
            F.xxhash64("id").alias("v"),  # incompressible payload
        )
        dim = spark.range(0, 20001).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("g")
        )
        out = big.join(dim, "k")
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE skew-join split did not fire"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
