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
  the choice is total and engine-independent). The stream matches this
  row-for-row within any one micro-batch (it sorts by the same total
  order before emitting); across batches the first-ARRIVING batch wins
  and cannot retract, so full equivalence additionally assumes
  arrivals respect event-time order across batches — the condition the
  stream==batch tests construct and late data violates.
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


def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/hourly.py:sessionize — Spark's NATIVE
    session_window evaluated in batch mode (same expression the stream
    plans), 30-minute gap per user. The oracle rebuilds gap-based
    sessions from first principles (lag + strict-< gap flag + running
    session id), so a hash match proves Spark's session semantics:
    half-open windows, end = last event + gap, a gap-boundary event
    starts a NEW session. Sums ride exact decimal so per-session
    reduction order cannot drift."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


ORACLE["q_sessionize_batch"] = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   < INTERVAL 30 MINUTE
              THEN 0 ELSE 1 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       (SUM(value::DECIMAL(18,6)))::DECIMAL(18,6) AS sum_value
FROM sess GROUP BY user_id, sid
"""
QUERIES["q_sessionize_batch"] = q_sessionize_batch


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
