"""Batch twins of the streaming operators, with DuckDB oracles.

The streaming surface (streaming/hourly.py first_seen_stream,
streaming/trending.py token_counts_stream) is pytest-covered by
stream==batch equivalence tests, but streams themselves cannot run
under the driver's oracle gate (arrival time is nondeterministic).
These queries express the same per-key / windowed semantics as pure
batch plans over the deterministic testdata columns, so the SEMANTICS
earn oracle-verified rows:

- q_first_seen_batch == first_seen_stream's emission contract: exactly
  one row per key, the first by event time (tie-broken by event_id so
  the choice is total and engine-independent).
- q_trending_batch == start_trending_pipeline's published shape:
  tokenize → per-partition token counts → dense ranked top-k. The
  stream partitions by arrival-hour window; the batch twin partitions
  by the deterministic ``source`` column (documents carry no event
  time — exactly why the stream itself is un-oracle-able).

Scale notes: both are one-shuffle plans. first-seen shuffles once on
the dedup key (row_number window, no join); trending's explode is
map-side and the count + rank share the (source/token → source)
shuffle chain with map-side partial counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table

QUERIES: dict = {}
ORACLE: dict = {}


def first_seen_plan(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    order: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """One row per key, the first by ``order`` — the batch form of
    first_seen_stream's emission contract. Shared by q_first_seen_batch
    and the stream==batch equivalence test so the oracle-verified plan
    IS the plan the stream is checked against."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def q_first_seen_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/hourly.py:first_seen_stream (keyed
    applyInPandasWithState dedup): first event per (user_id,
    event_type) by (ts, event_id)."""
    e = table(spark, sf_dir, "events")
    return first_seen_plan(e).select(
        "user_id", "event_type", "event_id", "ts", "value"
    )


ORACLE["q_first_seen_batch"] = """
SELECT user_id, event_type, event_id, ts, value
FROM (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""
QUERIES["q_first_seen_batch"] = q_first_seen_batch


def q_trending_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/trending.py: tokenize → counts → ranked
    top-10 per partition (source stands in for the arrival window)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).where(F.col("token") != "")
    counts = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), "token")
    return counts.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= 10
    )


ORACLE["q_trending_batch"] = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
), counts AS (
  SELECT source, token, count(*) AS n
  FROM toks WHERE token <> '' GROUP BY source, token
)
SELECT source, token, n, rank
FROM (
  SELECT source, token, n,
         row_number() OVER (PARTITION BY source
                            ORDER BY n DESC, token) AS rank
  FROM counts
) WHERE rank <= 10
"""
QUERIES["q_trending_batch"] = q_trending_batch
