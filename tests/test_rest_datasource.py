"""Python Data Source API: the REST source as a parallel executor-side
scan (file transport — the offline twin of the HTTP path)."""

from __future__ import annotations

import pytest

import json

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.sources.rest_datasource import RestDocsDataSource


def _register(spark):
    # idempotent across tests sharing the session
    try:
        spark.dataSource.register(RestDocsDataSource)
    except Exception:
        pass


def test_rest_docs_one_partition_per_endpoint(spark, tmp_path):
    _register(spark)
    paths = []
    for city in ("lisbon", "osaka", "quito"):
        p = tmp_path / f"{city}.json"
        p.write_text(json.dumps({"city": city, "temp_c": len(city)}))
        paths.append(str(p))

    df = (
        spark.read.format("rest_docs")
        .option("endpoints", json.dumps(paths))
        .option("transport", "file")
        .load()
    )
    assert df.columns == ["endpoint", "body"]
    # the reference's per-city dynamic task mapping → one scan partition each
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 3
    parsed = df.select(
        F.get_json_object("body", "$.city").alias("city"),
        F.get_json_object("body", "$.temp_c").cast("int").alias("temp_c"),
    ).collect()
    assert {(r.city, r.temp_c) for r in parsed} == {
        ("lisbon", 6),
        ("osaka", 5),
        ("quito", 5),
    }


def test_rest_docs_composes_with_ingest(spark, tmp_path):
    """Source → parse → project is one declarative plan: the scan is a
    real Spark source, not a driver-side collect."""
    _register(spark)
    p = tmp_path / "doc.json"
    p.write_text(json.dumps({"location": {"name": "Lisbon"}, "current": {"temp_c": 21}}))
    df = (
        spark.read.format("rest_docs")
        .option("endpoints", json.dumps([str(p)]))
        .option("transport", "file")
        .load()
        .select(
            F.get_json_object("body", "$.location.name").alias("city"),
            F.get_json_object("body", "$.current.temp_c").cast("long").alias("temp_c"),
        )
    )
    assert [(r.city, r.temp_c) for r in df.collect()] == [("Lisbon", 21)]


def test_rest_docs_bad_transport_errors(spark, tmp_path):
    _register(spark)
    df = (
        spark.read.format("rest_docs")
        .option("endpoints", json.dumps([str(tmp_path / "x.json")]))
        .option("transport", "carrier_pigeon")
        .load()
    )
    import pytest

    with pytest.raises(Exception, match="carrier_pigeon|PYTHON_DATA_SOURCE"):
        df.collect()


@pytest.mark.slow
def test_rest_poll_stream_rounds_and_restart(spark, tmp_path):
    import json
    import time

    from sandbox_data_pipeline_spark.sources.rest_datasource import (
        RestPollStreamDataSource,
    )

    spark.dataSource.register(RestPollStreamDataSource)
    eps = []
    for i in range(3):
        p = tmp_path / f"doc{i}.json"
        p.write_text(json.dumps({"i": i, "v": "first"}))
        eps.append(str(p))
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def run_until(n_rows, timeout=60):
        q = (
            spark.readStream.format("rest_poll")
            .option("transport", "file")
            .option("endpoints", json.dumps(eps))
            .load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        try:
            deadline = time.time() + timeout
            while time.time() < deadline:
                try:
                    if spark.read.parquet(str(out)).count() >= n_rows:
                        break
                except Exception:
                    pass
                time.sleep(0.5)
        finally:
            q.stop()

    run_until(3)
    got = spark.read.parquet(str(out))
    assert got.count() >= 3
    first = got.where("poll = 1").collect()
    # one row per endpoint per poll round, bodies delivered verbatim
    assert {r.endpoint for r in first} == set(eps)
    assert all("first" in r.body for r in first)

    # new content lands; a RESTARTED query (same checkpoint) must poll
    # fresh bodies and keep offsets moving instead of replaying history
    for i in range(3):
        (tmp_path / f"doc{i}.json").write_text(json.dumps({"i": i, "v": "second"}))
    before = got.count()
    run_until(before + 3)
    after = spark.read.parquet(str(out))
    polls = {r.poll for r in after.select("poll").distinct().collect()}
    assert len(polls) >= 2
    newest = after.where(after.poll == max(polls)).collect()
    assert all("second" in r.body for r in newest)
    # exactly-once across the restart: no (poll, endpoint) pair may be
    # re-emitted — the restarted reader must fast-forward past the
    # checkpointed rounds, never replay 2..N (high-water-mark contract)
    dupes = (
        after.groupBy("poll", "endpoint")
        .count()
        .where("count > 1")
        .collect()
    )
    assert dupes == [], f"duplicate (poll, endpoint) rows after restart: {dupes}"


@pytest.mark.slow
def test_rest_poll_durable_hwm_survives_double_restart(spark, tmp_path):
    """The review-found window: restart once (the fast-forward batch
    commits a REGRESSED offset), then restart again before any
    catch-up commits. With option state_path the high-water mark is
    durable, so even the double restart never re-emits an old
    (poll, endpoint) pair."""
    import json
    import time

    from sandbox_data_pipeline_spark.sources.rest_datasource import (
        RestPollStreamDataSource,
    )

    spark.dataSource.register(RestPollStreamDataSource)
    ep = tmp_path / "doc.json"
    ep.write_text(json.dumps({"v": 1}))
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    state = tmp_path / "hwm.json"

    def run_until(n_rows, timeout=60):
        q = (
            spark.readStream.format("rest_poll")
            .option("transport", "file")
            .option("endpoints", json.dumps([str(ep)]))
            .option("state_path", str(state))
            .load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        try:
            deadline = time.time() + timeout
            while time.time() < deadline:
                try:
                    if spark.read.parquet(str(out)).count() >= n_rows:
                        break
                except Exception:
                    pass
                time.sleep(0.5)
        finally:
            q.stop()

    run_until(3)  # several rounds committed
    n1 = spark.read.parquet(str(out)).count()
    assert n1 >= 3
    # two back-to-back restarts: each new query instantiates a FRESH
    # reader; only the sidecar mark links them
    run_until(n1 + 1)
    run_until(spark.read.parquet(str(out)).count() + 1)
    after = spark.read.parquet(str(out))
    dupes = (
        after.groupBy("poll", "endpoint").count().where("count > 1").collect()
    )
    assert dupes == [], f"replayed rounds after double restart: {dupes}"
    assert int(json.loads(state.read_text())["hwm"]) >= 3
