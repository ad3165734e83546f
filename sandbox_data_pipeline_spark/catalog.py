"""Table catalog over the parquet test corpus.

The reference's "catalog" is a set of warehouse tables plus a
path-partitioned S3 layout (``api_data/weather/{run_hr}/*.json`` —
/root/reference/dags/sandbox_data_pipeline.py:113-117). Here the
relational corpus lives as one parquet file per table; reads go through
this module so every query benefits from the same scan discipline
(column pruning + filter pushdown happen automatically because callers
express plans declaratively on the returned DataFrames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor — at
# 100 TB, region/nation stay tiny (TPC-H fixes them at 5/25 rows) and
# part/supplier/customer grow with SF; only the fixed-size ones are
# unconditionally broadcastable.
ALWAYS_BROADCAST: frozenset[str] = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Parquet → vectorized reader, pushdown-capable.

    ``events.ts`` has shipped as both TIMESTAMP(MICROS) and
    TIMESTAMP(NANOS) across corpus generations. Spark's parquet reader
    rejects NANOS; with the legacy conf it surfaces as raw int64 nanos,
    which we convert to a microsecond timestamp — the same truncation
    DuckDB applies when casting TIMESTAMP_NS → TIMESTAMP. MICROS needs
    no conversion, so branch on the read dtype, not the file vintage.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer div: double division loses precision at 1.7e18 ns
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # MICROS files carry isAdjustedToUTC=false → TIMESTAMP_NTZ.
            # Downstream plans use unix_micros()/window() which want the
            # LTZ type; the session timezone is pinned to UTC, so this
            # cast is a type change, not a wall-clock shift.
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
