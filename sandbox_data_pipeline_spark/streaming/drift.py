"""Streaming distribution-drift monitor: per-micro-batch KL alarm
against a frozen baseline snapshot.

    document files arrive → per-batch, per-source token KL vs the
    admitted-baseline marginals (operators/text.py: drift_kl)
    → append (batch_id, source, kl_bits, alarm) to the drift report

The production admission companion to streaming/ingest.py's near-dup
gate: dedup answers "have we seen THIS document", drift answers "does
this SNAPSHOT still look like the corpus we trained the filters on".
A poisoned or mis-crawled source trips the alarm before its documents
reach the curation funnel.

Scale: the baseline's top-k vocab + marginal counts are a tiny
write-once artifact (recomputed per batch here only because the test
corpus is small — at 100 TB, compute once and broadcast); per-batch
cost is one token count over the batch itself, with the (source ×
vocab)-keyed shuffle independent of batch size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.streaming.ingest import DOC_STREAM_SCHEMA


def batch_drift_report(
    batch_df: DataFrame,
    baseline: DataFrame,
    batch_id: int,
    threshold_bits: float,
    vocab_size: int = 40,
) -> DataFrame:
    """One batch's report rows — factored out so tests can assert the
    stream==batch equivalence directly on the builder."""
    from sandbox_data_pipeline_spark.operators.text import drift_kl

    kl = drift_kl(batch_df, baseline, vocab_size=vocab_size)
    return kl.select(
        F.lit(batch_id).cast("long").alias("batch_id"),
        "source",
        "n_vocab_tokens",
        "kl_bits",
        (F.col("kl_bits") > threshold_bits).alias("alarm"),
    )


def start_drift_monitor(
    spark: SparkSession,
    source_dir: str,
    baseline_dir: str,
    report_dir: str,
    checkpoint_dir: str,
    threshold_bits: float = 0.5,
    vocab_size: int = 40,
):
    """Continuous drift monitoring over arriving document files.

    Replay safety: the report keys on batch_id, and a replayed batch
    recomputes the identical deterministic rows (integer counts, one
    rounded log) — downstream readers dedup on (batch_id, source) the
    same way the trending sink's merge-publish does. The baseline is
    read per batch so a refreshed snapshot takes effect on the next
    trigger without restarting the query.
    """

    def _report(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        baseline = s.read.parquet(baseline_dir).select("text", "source")
        report = batch_drift_report(
            batch_df, baseline, batch_id, threshold_bits, vocab_size=vocab_size
        )
        report.write.mode("append").parquet(report_dir)

    stream = spark.readStream.schema(DOC_STREAM_SCHEMA).json(source_dir)
    return (
        stream.writeStream.foreachBatch(_report)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
