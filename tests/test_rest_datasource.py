"""Python Data Source API: the REST source as a parallel executor-side
scan (file transport — the offline twin of the HTTP path)."""

from __future__ import annotations

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
