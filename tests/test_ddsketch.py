"""DD-style quantile sketch tests (operators/sketch.py: dd_sketch).

The sketch guarantees: any quantile estimate is the lower bound of a
bucket containing the true rank-statistic, and bucket width is at most
lb/SUB — so estimate <= true value and true value < estimate*(1+1/SUB)
+ SUB (the +SUB covers the integer floor of the sub-bucket bound).
"""

from __future__ import annotations

import pytest

import random

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.operators.sketch import (
    DD_SUB,
    dd_quantiles,
    dd_sketch,
)


def _bucket_py(v: int) -> tuple[int, int]:
    e = v.bit_length()
    p = 1 << (e - 1)
    return e, ((v - p) * DD_SUB) // p


def _lb_py(e: int, s: int) -> int:
    p = 1 << (e - 1)
    return p + (s * p) // DD_SUB


def test_bucket_bounds_property():
    rng = random.Random(99)
    for _ in range(2000):
        v = rng.randrange(1, 1 << 40)
        e, s = _bucket_py(v)
        assert 0 <= s < DD_SUB
        lb = _lb_py(e, s)
        ub = _lb_py(e + 1, 0) if s == DD_SUB - 1 else _lb_py(e, s + 1)
        assert lb <= v < ub
        # relative width bound: (ub - lb) / lb <= 1/SUB (+1 for floor)
        assert (ub - lb) * DD_SUB <= lb + DD_SUB


def test_quantile_accuracy_vs_exact(spark):
    rng = random.Random(7)
    vals = [rng.randrange(1, 10_000_000) for _ in range(5000)]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp: string, cents: long"
    )
    out = dd_quantiles(
        dd_sketch(df, "grp", "cents"), [(1, 2), (19, 20), (99, 100)]
    ).collect()[0]
    assert out["n_rows"] == len(vals)
    assert out["n_buckets"] <= DD_SUB * 63
    svals = sorted(vals)
    for col, qn, qd in (("q_1_2", 1, 2), ("q_19_20", 19, 20), ("q_99_100", 99, 100)):
        rank = (len(vals) * qn + qd - 1) // qd
        exact = svals[rank - 1]
        est = out[col]
        assert est <= exact
        assert exact < est * (DD_SUB + 1) / DD_SUB + DD_SUB


def test_sketch_is_mergeable(spark):
    rng = random.Random(21)
    a = [rng.randrange(1, 1_000_000) for _ in range(800)]
    b = [rng.randrange(1, 1_000_000) for _ in range(1200)]
    mk = lambda vs: dd_sketch(
        spark.createDataFrame([("g", v) for v in vs], "grp: string, cents: long"),
        "grp",
        "cents",
    )
    merged = (
        mk(a)
        .unionAll(mk(b))
        .groupBy("grp", "e", "s")
        .agg(F.sum("cnt").alias("cnt"), F.first("lb").alias("lb"))
    )
    whole = mk(a + b)
    got = {(r["e"], r["s"]): (r["cnt"], r["lb"]) for r in merged.collect()}
    want = {(r["e"], r["s"]): (r["cnt"], r["lb"]) for r in whole.collect()}
    assert got == want


def test_graded_query_bounded_state(spark, sf_dir):
    from sandbox_data_pipeline_spark.queries.analytics import q_dd_quantiles

    rows = q_dd_quantiles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_buckets"] <= DD_SUB * 63
        assert 1 <= r["p50_cents"] <= r["p95_cents"] <= r["p99_cents"]


@pytest.mark.slow
def test_log_driven_incremental_sketch_matches_full(spark, tmp_path):
    """refresh_dd_sketch over 3 commits must equal one whole-table
    sketch, bucket for bucket (counter addition is associative)."""
    import random

    from pyspark.sql import functions as F

    from sandbox_data_pipeline_spark.operators.sketch import dd_sketch
    from sandbox_data_pipeline_spark.sinks.txlog import (
        TxTable,
        refresh_dd_sketch,
    )

    rng = random.Random(5)
    rows = [
        ("a" if i % 3 else "b", rng.randrange(1, 1_000_000))
        for i in range(900)
    ]
    df = spark.createDataFrame(rows, "grp: string, cents: long")
    t = TxTable.create(spark, str(tmp_path / "t"), df.where("cents % 3 = 0"))
    sk, ver = refresh_dd_sketch(t, None, -1, "grp", "cents")
    sk = sk.localCheckpoint()
    t.append(df.where("cents % 3 = 1"))
    sk, ver = refresh_dd_sketch(t, sk, ver, "grp", "cents")
    sk = sk.localCheckpoint()
    t.append(df.where("cents % 3 = 2"))
    sk, ver = refresh_dd_sketch(t, sk, ver, "grp", "cents")
    got = {(r["grp"], r["e"], r["s"]): (r["cnt"], r["lb"]) for r in sk.collect()}
    want = {
        (r["grp"], r["e"], r["s"]): (r["cnt"], r["lb"])
        for r in dd_sketch(t.read(), "grp", "cents").collect()
    }
    assert got == want
    # removes break monotonicity → loud refusal
    t.delete_where("cents", 0, 100_000)
    import pytest

    with pytest.raises(ValueError, match="full recompute"):
        refresh_dd_sketch(t, sk, ver, "grp", "cents")
