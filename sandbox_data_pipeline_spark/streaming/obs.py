"""Streaming observability: StreamingQuery progress as a DataFrame.

Structured Streaming exposes per-trigger metrics (input rates, batch
durations, watermark, state-store sizes) only as JSON blobs on the
query handle; operations wants them as a TABLE it can threshold, join
to alert rules, and append to a metrics sink. ``progress_frame``
normalizes the last progress of every active query into a fixed
schema — the monitoring twin of the data-plane DQ suite
(operators/dq.py), closing the loop the reference runs through
Anomalo on warehouse tables for its own pipeline health
(reference include/utils/anomalo_datahub.py: check-status polling).

All driver-side metadata (one dict per active query) — no executor
work, usable inside a foreachBatch or a monitoring loop at any scale.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROGRESS_SCHEMA = StructType(
    [
        StructField("query_id", StringType()),
        StructField("run_id", StringType()),
        StructField("name", StringType()),
        StructField("batch_id", LongType()),
        StructField("timestamp", StringType()),
        StructField("num_input_rows", LongType()),
        StructField("input_rows_per_second", DoubleType()),
        StructField("processed_rows_per_second", DoubleType()),
        StructField("trigger_execution_ms", LongType()),
        StructField("watermark", StringType()),
        StructField("state_rows_total", LongType()),
        StructField("state_rows_updated", LongType()),
        StructField("state_memory_bytes", LongType()),
        StructField("n_sources", LongType()),
        StructField("sink", StringType()),
    ]
)


def _row_from_progress(p: dict[str, Any]) -> dict[str, Any]:
    state = p.get("stateOperators") or []
    dur = p.get("durationMs") or {}
    return {
        "query_id": str(p.get("id", "")),
        "run_id": str(p.get("runId", "")),
        "name": p.get("name"),
        "batch_id": int(p.get("batchId", -1)),
        "timestamp": p.get("timestamp"),
        "num_input_rows": int(p.get("numInputRows", 0)),
        "input_rows_per_second": float(p.get("inputRowsPerSecond") or 0.0),
        "processed_rows_per_second": float(p.get("processedRowsPerSecond") or 0.0),
        "trigger_execution_ms": int(dur.get("triggerExecution", 0)),
        "watermark": (p.get("eventTime") or {}).get("watermark"),
        "state_rows_total": sum(int(s.get("numRowsTotal", 0)) for s in state),
        "state_rows_updated": sum(int(s.get("numRowsUpdated", 0)) for s in state),
        "state_memory_bytes": sum(int(s.get("memoryUsedBytes", 0)) for s in state),
        "n_sources": len(p.get("sources") or []),
        "sink": (p.get("sink") or {}).get("description"),
    }


def progress_frame(spark: SparkSession, queries=None) -> DataFrame:
    """One row per query's LAST progress. ``queries`` defaults to every
    active query on the session; finished availableNow queries can be
    passed explicitly (their handle retains lastProgress)."""
    if queries is None:
        queries = list(spark.streams.active)
    # read lastProgress ONCE per query: each access is a JVM round
    # trip + JSON parse, and two reads can observe different triggers
    progresses = (q.lastProgress for q in queries)
    rows = [_row_from_progress(p) for p in progresses if p is not None]
    return spark.createDataFrame(rows, PROGRESS_SCHEMA) if rows else (
        spark.createDataFrame([], PROGRESS_SCHEMA)
    )


def recent_progress_frame(spark: SparkSession, query) -> DataFrame:
    """Every retained trigger of one query — the per-batch history the
    rate/lag charts read."""
    rows = [_row_from_progress(p) for p in (query.recentProgress or [])]
    return spark.createDataFrame(rows, PROGRESS_SCHEMA) if rows else (
        spark.createDataFrame([], PROGRESS_SCHEMA)
    )
