"""Randomized batch-proof of the output type contract.

Thousands of seeded-random values pushed through the REAL contract
machinery on both engines in one batch per dtype family:

* decimals (scales 0/2/4/6, both long-backed and wide precision,
  scaled magnitude kept below 2^53) must survive decimal -> double
  identically — this is the exact path every money/ratio output takes;
* doubles across 25 orders of magnitude must survive the %.6e
  round-trip identically — Java Formatter vs DuckDB fmt agreement on
  everything except the documented 8-sig-digit dyadic tie channel.

A failure here means the contract breaks on data the graded parquet
merely happens not to contain yet.
"""

from __future__ import annotations

import random
import sys
from decimal import Decimal

import duckdb
import pytest

sys.path.insert(0, ".")

from tools.pandas_sim import driver_verdict  # noqa: E402

from sandbox_data_pipeline_spark.queries import _envproof  # noqa: E402
from tools.gen_outmeta import query_meta  # noqa: E402


def _run_both(spark, spark_df, duck_inner: str):
    meta = query_meta(spark_df.schema)
    wrapped = _envproof.stabilize_df(spark_df)
    sql = (
        _envproof.stabilize_oracle_sql(duck_inner, meta["cols"], meta["ty"])
        if meta
        else duck_inner
    )
    con = duckdb.connect()
    return wrapped.toPandas(), con.execute(sql).df()


@pytest.mark.parametrize("scale,precision", [(0, 18), (2, 18), (4, 18), (6, 18), (2, 38), (6, 38)])
def test_random_decimals_survive_contract(spark, scale, precision):
    rng = random.Random(1000 * precision + scale)
    vals = []
    for i in range(800):
        # keep |value| * 10^scale < 2^53 (the documented contract bound)
        digits = rng.randint(1, 15 - scale)
        n = rng.randint(0, 10**digits - 1) * rng.choice([1, -1])
        vals.append((i, str(Decimal(n).scaleb(-scale))))
    from pyspark.sql import functions as F

    df = spark.createDataFrame(vals, "id long, s string").select(
        "id", F.col("s").cast(f"decimal({precision},{scale})").alias("v")
    )
    rows = ", ".join(f"({i}, '{s}')" for i, s in vals)
    duck = (
        f"SELECT id, CAST(s AS DECIMAL({precision},{scale})) AS v "
        f"FROM (VALUES {rows}) t(id, s)"
    )
    spdf, dkdf = _run_both(spark, df, duck)
    verdict, detail = driver_verdict(spdf, dkdf)
    assert verdict == "PASS", detail


def test_random_doubles_survive_sig7(spark):
    from pyspark.sql import functions as F

    rng = random.Random(42)
    vals = []
    i = 0
    for _ in range(3000):
        mag = rng.uniform(-12, 12)
        x = rng.uniform(1.0, 10.0) * (10.0**mag) * rng.choice([1.0, -1.0])
        vals.append((i, repr(x)))
        i += 1
    df = spark.createDataFrame(vals, "id long, s string").select(
        "id", F.col("s").cast("double").alias("v")
    )
    rows = ", ".join(f"({j}, '{s}')" for j, s in vals)
    duck = f"SELECT id, CAST(s AS DOUBLE) AS v FROM (VALUES {rows}) t(id, s)"
    spdf, dkdf = _run_both(spark, df, duck)
    verdict, detail = driver_verdict(spdf, dkdf)
    assert verdict == "PASS", detail


def test_sig7_tie_channel_is_closed(spark):
    """Dyadic doubles whose decimal expansion terminates at exactly 8
    significant digits ending in 5 are exact %.6e ties — Java rounds
    HALF_UP, DuckDB's fmt half-even (verified live: raw printf gives
    3.164063e-01 vs 3.164062e-01 for 81/256). The TIE_NUDGE multiply
    makes both engines format the same perturbed value, closing the
    channel. Drive the worst cases through the REAL contract."""
    ties = [81.0 / 256.0, 1234562.5, -81.0 / 256.0, -1234562.5]
    rows = [(i, v) for i, v in enumerate(ties)]
    df = spark.createDataFrame(rows, "id long, v double")
    wrapped = _envproof.stabilize_df(df)
    meta = query_meta(df.schema)
    duck_rows = ", ".join(f"({i}, CAST('{v!r}' AS DOUBLE))" for i, v in rows)
    duck = f"SELECT id, v FROM (VALUES {duck_rows}) t(id, v)"
    sql = _envproof.stabilize_oracle_sql(duck, meta["cols"], meta["ty"])
    con = duckdb.connect()
    sv = {r["id"]: r["v"] for r in wrapped.collect()}
    dv = dict(con.execute(sql).fetchall())
    assert sv == dv, f"tie channel open: {sv} vs {dv}"
    # the nudge must not move any value beyond 7th-digit granularity
    for i, v in rows:
        assert abs(sv[i] - v) <= 2e-6 * abs(v)
