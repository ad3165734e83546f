from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert {"o_orderkey", "revenue"} <= set(df.columns)


def test_queries_all_build_plans(spark, sf_dir):
    """DAG-integrity analogue (SURVEY §5.2.4): every declared query must
    at least produce an optimizable plan without executing."""
    import __spark_entry__ as mod

    for name, fn in mod.queries().items():
        df = fn(spark, sf_dir)
        df.explain(mode="cost")  # forces analysis + optimization
