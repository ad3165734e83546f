from __future__ import annotations

import pytest

import sys

sys.path.insert(0, "/root/repo")


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert {"o_orderkey", "revenue"} <= set(df.columns)


@pytest.mark.slow
def test_queries_all_build_plans(spark, sf_dir):
    """DAG-integrity analogue (SURVEY §5.2.4): every declared query must
    at least produce an optimizable plan without executing."""
    import __spark_entry__ as mod

    for name, fn in mod.queries().items():
        df = fn(spark, sf_dir)
        df.explain(mode="cost")  # forces analysis + optimization


@pytest.mark.slow
def test_no_wide_decimal_outputs(spark, sf_dir):
    """Hash-stability guard: no query may emit decimal precision > 18.
    Wide decimals are int128/BigDecimal-backed and take a different
    DuckDB/Arrow conversion path than Spark's long-backed decimals —
    the round-2 driver flagged exactly the five queries that emitted
    them while every value was bit-identical. Precision <= 18 keeps
    both engines on the single correctly-rounded int64 path."""
    from pyspark.sql.types import DecimalType

    import __spark_entry__ as mod

    offenders = []
    for name, fn in mod.queries().items():
        for f in fn(spark, sf_dir).schema.fields:
            if isinstance(f.dataType, DecimalType) and f.dataType.precision > 18:
                offenders.append(f"{name}.{f.name}: {f.dataType}")
    assert offenders == [], f"wide-decimal outputs (hash-fragile): {offenders}"
