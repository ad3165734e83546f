"""Skew handling for joins whose key distribution is pathological.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
on in session.py): post-shuffle, oversized partitions of a sort-merge
join are split automatically. Salting is for the cases AQE can't fix —
a broadcast-ineligible dimension joined on a key where one value is a
large fraction of the fact table, or a skewed key feeding a downstream
aggregation that must keep its partitioning.

``salted_join`` trades a ``salt_factor``× replication of the SMALL side
for an even spread of the big side's hot keys: big rows get a
deterministic salt in [0, factor), small rows are exploded once per
salt value, and the join key becomes (key, salt). Result is
row-identical to the plain join (declared as q_join_salted against the
plain-join oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, salt_factor: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt in [0, salt_factor): xxhash64 of ``cols``
    (default: all columns) — stable across retries, which matters for
    exactly-once sinks; `rand()` would re-deal rows on task re-execution."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(*basis), F.lit(salt_factor)).cast("int"))


def explode_salts(df: DataFrame, salt_factor: int) -> DataFrame:
    """Replicate each row once per salt value (the small-side half)."""
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_factor: int = 8,
) -> DataFrame:
    """Equi-join with the hot keys of ``big`` spread over
    ``salt_factor`` shuffle partitions. The small side grows
    ``salt_factor``× — keep it for dimensions too big to broadcast but
    far smaller than the fact table (the only regime where salting
    beats both broadcast and AQE)."""
    b = with_salt(big, salt_factor)
    s = explode_salts(small, salt_factor)
    joined = b.join(s, [on, SALT_COL], how)
    return joined.drop(SALT_COL)


def key_skew_report(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts for the heaviest keys plus their
    share of the table — the number that decides broadcast vs AQE vs
    salting. One aggregation + tiny sort."""
    total = df.groupBy().agg(F.count(F.lit(1)).alias("_t"))
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("key_cnt"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col(key),
            "key_cnt",
            F.round(F.col("key_cnt") / F.col("_t"), 6).alias("share"),
        )
        .orderBy(F.col("key_cnt").desc(), F.col(key))
        .limit(top)
    )
