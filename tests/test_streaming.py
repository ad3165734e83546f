"""Streaming-mode tests: file-arrival source, hourly rollup vs batch
equivalence, idempotent re-processing, session windows.
Uses availableNow triggers so each test drains deterministically.
"""

from __future__ import annotations

import pytest

import json
import os

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.streaming.hourly import (
    hourly_rollup,
    sessionize,
    start_hourly_pipeline,
)

SF = "/root/testdata/sf0.001"


def _land_events(spark, src_dir: str, n: int = 400) -> None:
    """Write the first n events as JSON files (two files → two arrivals)."""
    e = table(spark, SF, "events").where(F.col("event_id") < n)
    e.select(
        "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).coalesce(2).write.mode("overwrite").json(src_dir)


def test_stream_rollup_matches_batch(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    _land_events(spark, src)
    q = start_hourly_pipeline(spark, src, sink, ckpt, available_now=True)
    q.awaitTermination(120)

    got = spark.read.parquet(sink)
    batch = (
        table(spark, SF, "events")
        .where(F.col("event_id") < 400)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            # the stream ingests doubles (JSON contract); the catalog
            # reads decimal — compare in double
            F.round(F.sum("value"), 4).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "event_cnt", "sum_value")
    )
    g = {(r.hour_start, r.event_type): (r.event_cnt, r.sum_value) for r in got.collect()}
    b = {(r.hour_start, r.event_type): (r.event_cnt, r.sum_value) for r in batch.collect()}
    assert g == b


def test_stream_restart_is_idempotent(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    _land_events(spark, src)
    q = start_hourly_pipeline(spark, src, sink, ckpt, available_now=True)
    q.awaitTermination(120)
    n1 = spark.read.parquet(sink).count()
    # restart with same checkpoint, no new files -> no duplication
    q2 = start_hourly_pipeline(spark, src, sink, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == n1


@pytest.mark.slow
def test_stream_picks_up_new_files(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    _land_events(spark, src, n=200)
    q = start_hourly_pipeline(spark, src, sink, ckpt, available_now=True)
    q.awaitTermination(120)
    total1 = spark.read.parquet(sink).agg(F.sum("event_cnt")).first()[0]
    assert total1 == 200

    # a new file arrives (the T2 sensor case) — only it is processed;
    # its event time must be inside the watermark horizon or the engine
    # correctly discards it as too-late
    extra = [
        json.dumps({"event_id": 10_000 + i, "ts": "2024-02-01 10:15:00.000",
                    "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"})
        for i in range(7)
    ]
    with open(os.path.join(src, "late.json"), "w") as f:
        f.write("\n".join(extra))
    q2 = start_hourly_pipeline(spark, src, sink, ckpt, available_now=True)
    q2.awaitTermination(120)
    got = spark.read.parquet(sink)
    hour = got.where("event_type = 'click' AND hour_start = '2024-02-01 10:00:00'").first()
    assert hour is not None and hour.event_cnt == 7


def test_update_publish_preserves_other_groups_in_hour(spark, tmp_path):
    """Regression (round-2 ADVICE high): update mode emits only the
    groups changed in the micro-batch; the publish must MERGE into the
    run_hr partition, not blind-overwrite it — a second file with only
    'click' events for an hour must not erase that hour's 'view' row."""
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src)

    def _row(eid, etype, minute):
        return json.dumps({"event_id": eid, "ts": f"2024-02-01 10:{minute:02d}:00.000",
                           "user_id": 1, "event_type": etype, "value": 1.0, "props": "{}"})

    with open(os.path.join(src, "a.json"), "w") as f:
        f.write("\n".join([_row(1, "view", 5), _row(2, "click", 10)]))
    q = start_hourly_pipeline(spark, src, sink, ckpt, available_now=True)
    q.awaitTermination(120)
    first = {r.event_type: r.event_cnt for r in spark.read.parquet(sink).collect()}
    assert first == {"view": 1, "click": 1}

    # second arrival: clicks only, same hour — 'view' must survive and
    # the click group must show the updated cumulative count
    with open(os.path.join(src, "b.json"), "w") as f:
        f.write("\n".join([_row(3, "click", 20), _row(4, "click", 25), _row(5, "click", 30)]))
    q2 = start_hourly_pipeline(spark, src, sink, ckpt, available_now=True)
    q2.awaitTermination(120)
    got = {r.event_type: r.event_cnt for r in spark.read.parquet(sink).collect()}
    assert got == {"view": 1, "click": 4}


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 100, "click", 1.0, "{}"),
        (2, "2024-01-01 10:10:00", 100, "click", 2.0, "{}"),
        (3, "2024-01-01 11:30:00", 100, "click", 3.0, "{}"),  # gap > 30m -> new session
        (4, "2024-01-01 10:05:00", 200, "view", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = sessionize(df, gap_minutes=30).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[100]) == 2
    first = min(by_user[100], key=lambda r: r.session_start)
    assert first.n_events == 2 and first.sum_value == 3.0
    assert len(by_user[200]) == 1


def test_stateful_dedup_across_batches_and_restarts(spark, tmp_path):
    from sandbox_data_pipeline_spark.streaming.hourly import start_dedup_pipeline

    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src)

    def _rows(ids):
        return "\n".join(
            json.dumps({"event_id": i, "ts": "2024-02-01 10:00:00.000",
                        "user_id": i % 7, "event_type": "click",
                        "value": 1.0, "props": "{}"})
            for i in ids
        )

    # batch 1: ids 0..99, each written TWICE (in-batch duplicates)
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write(_rows(list(range(100)) + list(range(100))))
    q = start_dedup_pipeline(spark, src, sink, ckpt, available_now=True)
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    assert got.count() == 100
    assert got.select("event_id").distinct().count() == 100

    # batch 2 after restart: ids 50..149 — the 50 already-seen ids are
    # suppressed by checkpointed state, only 100..149 are new
    with open(os.path.join(src, "b.json"), "w") as f:
        f.write(_rows(range(50, 150)))
    q2 = start_dedup_pipeline(spark, src, sink, ckpt, available_now=True)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(sink)
    assert got2.count() == 150
    assert got2.select("event_id").distinct().count() == 150
