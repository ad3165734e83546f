"""Bind the oracle-verified batch twins (queries/streaming_twins.py)
to the streaming operators they mirror: the SAME plan object that the
driver's DuckDB gate verifies is compared against the stream's output
on real testdata, so the oracle rows genuinely certify the streaming
semantics (first-seen keyed dedup, trending token counts).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.queries.streaming_twins import first_seen_plan

SF = "/root/testdata/sf0.001"


def _rows_set(df, cols):
    return sorted(str(sorted(r.asDict().items())) for r in df.select(*cols).collect())


def test_first_seen_stream_matches_batch_twin(spark, tmp_path):
    """Wave 1 = each (user_id, event_type)'s first event (by ts,
    event_id); wave 2 = every remaining event, delivered after a
    restart. first_seen_stream must emit exactly wave 1 — which IS the
    batch twin's output over the full data — and suppress all of wave
    2 via checkpointed state."""
    from sandbox_data_pipeline_spark.streaming.hourly import (
        EVENT_SCHEMA,
        first_seen_stream,
    )

    events = table(spark, SF, "events").where(F.col("event_id") < 400)
    firsts = first_seen_plan(
        events.withColumn("value", F.col("value").cast("double"))
    ).persist()
    rest = events.join(
        firsts.select("event_id"), "event_id", "left_anti"
    )
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src)

    def _land(df, name):
        out = df.select(
            "event_id",
            # full microsecond precision — date_format's .SSS would
            # truncate and break exact row equality with the twin
            F.col("ts").cast("string").alias("ts"),
            "user_id", "event_type", "value", "props",
        ).toJSON().collect()
        with open(os.path.join(src, name), "w") as f:
            f.write("\n".join(out))

    schema_k = StructType(EVENT_SCHEMA.fields + [StructField("k", StringType())])

    def _run():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .json(src)
            .withColumn("k", F.concat_ws("|", "user_id", "event_type"))
        )
        # TTL must exceed the event-time span of the testdata (days):
        # with the default 24h, early keys' state times out before the
        # late wave arrives and they are legitimately re-emitted.
        deduped = first_seen_stream(stream, "k", schema_k, state_ttl_hours=24 * 365)
        q = (
            deduped.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _land(firsts, "wave1.json")
    _run()
    _land(rest, "wave2.json")
    _run()  # restart from checkpoint: state must survive

    got = spark.read.parquet(sink)
    assert got.count() == firsts.count()
    assert _rows_set(got, cols) == _rows_set(firsts, cols)
    firsts.unpersist()


def test_trending_stream_matches_batch_token_counts(spark, tmp_path):
    """The trending pipeline's published counts, summed across its
    arrival-time windows, must equal the deterministic batch token
    counts of the same documents (the twin's tokenize→count core)."""
    from sandbox_data_pipeline_spark.streaming.trending import (
        start_trending_pipeline,
    )

    docs = table(spark, SF, "documents").where(F.col("doc_id") < 200)
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src)
    payload = [
        json.dumps({"doc_id": r.doc_id, "text": r.text, "lang": r.lang,
                    "source": r.source, "n_chars": r.n_chars})
        for r in docs.collect()
    ]
    with open(os.path.join(src, "docs.json"), "w") as f:
        f.write("\n".join(payload))

    q = start_trending_pipeline(spark, src, sink, ckpt, available_now=True)
    q.awaitTermination(120)

    streamed = (
        spark.read.parquet(sink)
        .groupBy("token")
        .agg(F.sum("n").alias("n"))
    )
    batch = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _rows_set(streamed, ["token", "n"]) == _rows_set(batch, ["token", "n"])


def test_first_seen_intra_batch_order_independence(spark, tmp_path):
    """One micro-batch delivering a key's events in REVERSE event-time
    order must still emit the event-time minimum — the emission is a
    sort within the batch, not 'first row the runtime happened to
    hand us' (review-found divergence from the batch twin)."""
    from sandbox_data_pipeline_spark.streaming.hourly import (
        EVENT_SCHEMA,
        first_seen_stream,
    )

    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src)
    rows = [
        {"event_id": 3, "ts": "2024-01-01 03:00:00", "user_id": 1,
         "event_type": "view", "value": 3.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01 02:00:00", "user_id": 1,
         "event_type": "view", "value": 2.0, "props": "{}"},
        {"event_id": 1, "ts": "2024-01-01 01:00:00", "user_id": 1,
         "event_type": "view", "value": 1.0, "props": "{}"},
    ]
    with open(os.path.join(src, "batch.json"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))

    schema_k = StructType(EVENT_SCHEMA.fields + [StructField("k", StringType())])
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(src)
        .withColumn("k", F.concat_ws("|", "user_id", "event_type"))
    )
    q = (
        first_seen_stream(stream, "k", schema_k, state_ttl_hours=24 * 365)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink).collect()
    assert len(got) == 1
    assert got[0]["event_id"] == 1  # event-time minimum, not arrival-first
