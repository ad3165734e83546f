"""Stream-stream interval join: stream result == batch result, and the
join state is eviction-bounded (the plan carries watermarks on both
sides)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.streaming.hourly import read_event_stream
from sandbox_data_pipeline_spark.streaming.joins import attribute_clicks, split_views_clicks

SF = "/root/testdata/sf0.001"
N = 600


def _land(spark, src_dir: str) -> None:
    e = table(spark, SF, "events").where(F.col("event_id") < N)
    e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(2).write.mode("overwrite").json(src_dir)


def _batch_expected(spark):
    events = table(spark, SF, "events").where(F.col("event_id") < N)
    views, clicks = split_views_clicks(events)
    return attribute_clicks(views, clicks, horizon_minutes=30)


def test_stream_join_matches_batch(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    _land(spark, src)
    views, clicks = split_views_clicks(read_event_stream(spark, src))
    joined = attribute_clicks(views, clicks, horizon_minutes=30)
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.view_id, r.click_id) for r in spark.read.parquet(sink).collect()
    }
    expected = {(r.view_id, r.click_id) for r in _batch_expected(spark).collect()}
    assert got == expected
    assert len(expected) > 0


def test_attribution_window_is_respected(spark):
    rows = _batch_expected(spark).collect()
    for r in rows:
        delta = (r.click_ts - r.view_ts).total_seconds()
        assert 0 <= delta <= 30 * 60


def test_left_outer_emits_unclicked_views(spark):
    events = table(spark, SF, "events").where(F.col("event_id") < N)
    views, clicks = split_views_clicks(events)
    outer = attribute_clicks(views, clicks, horizon_minutes=30, how="left_outer")
    inner_views = {
        r.view_id for r in attribute_clicks(views, clicks, 30).select("view_id").collect()
    }
    outer_rows = outer.collect()
    assert {r.view_id for r in outer_rows} == {r.view_id for r in views.select(F.col("event_id").alias("view_id")).collect()}
    for r in outer_rows:
        if r.view_id not in inner_views:
            assert r.click_id is None
