"""Streaming training-data ingest: the north-star operators composed
into one continuous pipeline.

    document files arrive  →  quality gate (JVM expression)
                           →  content-hash fingerprint
                           →  stateful first-seen dedup (TTL state)
                           →  append parquet

Everything before the stateful dedup is stateless column work inside
whole-stage codegen; the only state is one boolean per content hash
within the TTL horizon. At 100 TB/day this is the shape that holds:
filter early (cheapest rows first), key dedup state on the md5 of the
content (uniform, bounded), write append-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from sandbox_data_pipeline_spark.operators.text import quality_score
from sandbox_data_pipeline_spark.streaming.hourly import first_seen_stream

DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

INGESTED_SCHEMA = StructType(
    DOC_STREAM_SCHEMA.fields
    + [
        StructField("quality_score", DoubleType()),
        StructField("fp", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def document_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    min_quality: float = 0.2,
    state_ttl_hours: int = 24,
) -> DataFrame:
    """source → quality gate → fingerprint → stateful dedup. The
    arrival timestamp doubles as the event time for the dedup state's
    TTL (documents carry no event time of their own)."""
    stream = spark.readStream.schema(DOC_STREAM_SCHEMA).json(source_dir)
    staged = (
        stream.withColumn("quality_score", quality_score())
        .where(F.col("quality_score") >= min_quality)
        .withColumn("fp", F.md5("text"))
        .withColumn("ts", F.current_timestamp())
    )
    return first_seen_stream(
        staged, "fp", INGESTED_SCHEMA, state_ttl_hours=state_ttl_hours
    )


def start_document_ingest(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.2,
    available_now: bool = False,
):
    deduped = document_ingest_stream(spark, source_dir, min_quality=min_quality)
    writer = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
