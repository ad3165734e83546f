"""Tests for the session-environment-proofing layer (_envproof.py) and
the generated oracle metadata (_outmeta.py)."""

from __future__ import annotations

import math
from decimal import Decimal
from fractions import Fraction

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sandbox_data_pipeline_spark.queries import _envproof


@pytest.mark.slow
def test_outmeta_is_fresh(spark, sf_dir):
    """_outmeta.py must match the CURRENT Spark output schemas — a
    stale map silently desynchronizes the oracle-side stabilization
    from the Spark side (observed twice during development: the oracle
    got a %.6e wrap for a column that had become decimal). Regenerate
    with tools/gen_outmeta.py after reshaping any query."""
    import sys

    sys.path.insert(0, ".")
    from tools.gen_outmeta import query_meta

    from sandbox_data_pipeline_spark.queries import raw_registry
    from sandbox_data_pipeline_spark.queries._outmeta import META

    qs, _ = raw_registry()
    fresh = {}
    for name, fn in qs.items():
        m = query_meta(fn(spark, sf_dir).schema)
        if m:
            fresh[name] = m
    assert fresh == META, (
        "stale _outmeta.py — run: python tools/gen_outmeta.py\n"
        f"only-in-fresh: {sorted(set(fresh) - set(META))}\n"
        f"only-in-meta:  {sorted(set(META) - set(fresh))}\n"
        f"changed: {sorted(n for n in set(fresh) & set(META) if fresh[n] != META[n])}"
    )


@pytest.mark.parametrize("num_scale,out_scale", [(0, 4), (2, 4), (4, 2), (6, 6)])
def test_dec_ratio_matches_fraction_truth(spark, num_scale, out_scale):
    import random

    con = duckdb.connect()
    random.seed(num_scale * 10 + out_scale)
    rows = []
    for i in range(40):
        num = Decimal(random.randint(-10**10, 10**10)).scaleb(-num_scale)
        den = random.randint(1, 10**5) * random.choice([1, -1])
        rows.append((i, str(num), den))
    df = spark.createDataFrame(rows, "id long, num string, den long")
    out = {
        r["id"]: r["r"]
        for r in df.select(
            "id",
            _envproof.dec_ratio(
                F.col("num").cast(f"decimal(20,{num_scale})"),
                F.col("den"),
                num_scale,
                out_scale,
            ).alias("r"),
        ).collect()
    }
    for i, nums, den in rows:
        fr = Fraction(Decimal(nums)) / den
        scaled = fr * 10**out_scale
        q = math.floor(abs(scaled) + Fraction(1, 2)) * (1 if scaled >= 0 else -1)
        truth = Decimal(q).scaleb(-out_scale).quantize(
            Decimal(1).scaleb(-out_scale)
        )
        duck = con.execute(
            "SELECT "
            + _envproof.dec_ratio_sql(
                f"CAST('{nums}' AS DECIMAL(20,{num_scale}))",
                str(den),
                num_scale,
                out_scale,
            )
        ).fetchone()[0]
        assert str(out[i]) == str(truth) == str(duck), (i, nums, den)


def test_stabilize_df_fixes_fragile_dtypes(spark):
    df = spark.range(1).select(
        F.lit("2024-01-01 12:00:00").cast("timestamp").alias("ts_ltz"),
        (F.lit(1.0) / F.lit(3.0)).alias("dbl"),
        F.lit(Decimal("1.23")).cast("decimal(28,2)").alias("wide"),
        F.lit(5).alias("keep_int"),
        F.lit("2024-02-29").cast("date").alias("dte"),
        F.array(F.lit(1), F.lit(2)).alias("arr_i"),
        F.array(F.lit(0.5), F.lit(0.25)).alias("arr_d"),
    )
    out = _envproof.stabilize_df(df)
    types = {f.name: f.dataType for f in out.schema.fields}
    assert isinstance(types["ts_ltz"], T.TimestampNTZType)
    assert isinstance(types["dbl"], T.DoubleType)
    # decimals exit as double — the pandas path turns DuckDB decimals
    # into float64, so Decimal objects can never hash-match
    assert isinstance(types["wide"], T.DoubleType)
    assert isinstance(types["keep_int"], T.IntegerType)
    assert isinstance(types["dte"], T.TimestampNTZType)
    assert isinstance(types["arr_i"], T.StringType)
    assert isinstance(types["arr_d"], T.StringType)
    row = out.first()
    # 7 significant digits, parsed back from %.6e on the exact value
    assert row["dbl"] == 0.3333333
    assert row["wide"] == 1.23
    assert row["arr_i"] == "1,2"
    assert row["arr_d"] == "5.000000e-01,2.500000e-01"


def test_stabilize_preserves_nan_null_inf(spark):
    df = spark.range(1).select(
        F.lit(float("nan")).alias("a"),
        F.lit(None).cast("double").alias("b"),
        F.lit(float("inf")).alias("c"),
        F.lit(-0.0).alias("d"),
    )
    row = _envproof.stabilize_df(df).first()
    assert math.isnan(row["a"]) and row["b"] is None
    assert row["c"] == float("inf")
    assert row["d"] == 0.0 and math.copysign(1.0, row["d"]) < 0


def test_pin_session_applies_runtime_confs(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        _envproof.pin_session(spark)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_oracle_prelude_merges_with_cte_and_recursive():
    from sandbox_data_pipeline_spark.catalog import oracle_prelude

    plain = oracle_prelude("SELECT 1 AS x")
    assert plain.count("WITH") == 1
    with_cte = oracle_prelude("WITH t AS (SELECT 1 AS x) SELECT * FROM t")
    assert with_cte.lstrip().startswith("WITH lineitem AS")
    rec = oracle_prelude(
        "WITH RECURSIVE r AS (SELECT 1 AS n UNION ALL SELECT n + 1 FROM r WHERE n < 3) "
        "SELECT max(n) AS m FROM r"
    )
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT 1 AS dummy")
    # prelude CTEs reference MONEY_COLS columns that the dummy views
    # lack — DuckDB must prune them when unreferenced by the main query
    assert con.execute(plain).fetchall() == [(1,)]
    assert con.execute(rec).fetchall() == [(3,)]
