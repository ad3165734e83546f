"""Streaming drift monitor: per-batch KL alarm vs a frozen baseline,
and stream==batch equivalence of the report builder."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.streaming.drift import (
    batch_drift_report,
    start_drift_monitor,
)

BALANCED = "alpha beta gamma delta"
SKEWED = "alpha alpha alpha alpha"


def _doc(i, text, source):
    return json.dumps(
        {"doc_id": i, "text": text, "lang": "en", "source": source, "n_chars": len(text)}
    )


def _write_baseline(spark, path):
    rows = [(i, BALANCED, "en", "base", len(BALANCED)) for i in range(20)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(path)


def test_drift_monitor_flags_skewed_source(spark, tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    baseline = str(tmp_path / "baseline")
    report = str(tmp_path / "report")
    ckpt = str(tmp_path / "ckpt")
    _write_baseline(spark, baseline)

    # batch 1: one conforming source, one skewed source
    (src / "b1.json").write_text(
        "\n".join(
            [_doc(i, BALANCED, "good") for i in range(5)]
            + [_doc(100 + i, SKEWED, "poisoned") for i in range(5)]
        )
    )
    q = start_drift_monitor(spark, str(src), baseline, report, ckpt, threshold_bits=0.3)
    q.awaitTermination(120)

    got = {r.source: r for r in spark.read.parquet(report).collect()}
    assert got["good"].kl_bits == 0.0 and not got["good"].alarm
    assert got["poisoned"].kl_bits > 0.3 and got["poisoned"].alarm

    # second trigger: a new file lands; its rows append under the next batch_id
    (src / "b2.json").write_text("\n".join(_doc(200 + i, BALANCED, "good") for i in range(3)))
    q2 = start_drift_monitor(spark, str(src), baseline, report, ckpt, threshold_bits=0.3)
    q2.awaitTermination(120)
    rep = spark.read.parquet(report)
    assert rep.count() == 3
    assert rep.select("batch_id").distinct().count() == 2


def test_stream_report_equals_batch_twin(spark, tmp_path):
    baseline = str(tmp_path / "baseline")
    _write_baseline(spark, baseline)
    batch = spark.createDataFrame(
        [(i, SKEWED if i % 2 else BALANCED, "en", f"s{i % 2}", 1) for i in range(10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    base_df = spark.read.parquet(baseline).select("text", "source")
    a = batch_drift_report(batch, base_df, 7, 0.3).collect()
    b = batch_drift_report(batch, base_df, 7, 0.3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic replay
    got = {r.source: r for r in a}
    assert got["s0"].kl_bits == 0.0
    assert got["s1"].alarm and got["s1"].batch_id == 7


def test_progress_frame_captures_batch_metrics(spark, tmp_path):
    import json as _json
    import os

    from sandbox_data_pipeline_spark.streaming.ingest import start_document_ingest
    from sandbox_data_pipeline_spark.streaming.obs import (
        progress_frame,
        recent_progress_frame,
    )

    src = str(tmp_path / "src"); os.makedirs(src)
    good = "the quick brown fox and the lazy dog were of a kind in that story"
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write("\n".join(
            _json.dumps({"doc_id": i, "text": good + f" v{i}", "lang": "en",
                         "source": "t", "n_chars": 1}) for i in range(5)
        ))
    q = start_document_ingest(
        spark, src, str(tmp_path / "sink"), str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    got = progress_frame(spark, [q]).collect()
    assert len(got) == 1
    r = got[0]
    assert r.batch_id >= 0 and r.n_sources == 1
    assert r.sink and "FileSink" in r.sink
    # the stateful first-seen dedup keeps one row per content hash
    hist = recent_progress_frame(spark, q).collect()
    assert any(h.num_input_rows > 0 for h in hist)
    assert any(h.state_rows_total >= 5 for h in hist)
    assert all(h.trigger_execution_ms >= 0 for h in hist)
