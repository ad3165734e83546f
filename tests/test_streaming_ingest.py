"""End-to-end streaming training-data ingest: quality gate + stateful
content dedup across batches and restarts."""

from __future__ import annotations

import json
import os

from sandbox_data_pipeline_spark.streaming.ingest import start_document_ingest

GOOD = "the quick brown fox and the lazy dog were of a kind in that old story"
JUNK = "1234567890 9876543210 1111111111"


def _doc(i, text):
    return json.dumps(
        {"doc_id": i, "text": text, "lang": "en", "source": "t", "n_chars": len(text)}
    )


def test_document_ingest_quality_gate_and_dedup(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src)

    # batch 1: 3 distinct good docs, one exact duplicate, one junk doc
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write("\n".join([
            _doc(1, GOOD), _doc(2, GOOD + " indeed"), _doc(3, GOOD + " again"),
            _doc(4, GOOD),          # duplicate content of doc 1
            _doc(5, JUNK),          # fails the quality gate
        ]))
    q = start_document_ingest(spark, src, sink, ckpt, available_now=True)
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    assert got.count() == 3
    assert sorted(r.fp for r in got.select("fp").collect()) == \
           sorted(set(r.fp for r in got.select("fp").collect()))

    # batch 2 after restart: re-sends doc 1's content + one new doc
    with open(os.path.join(src, "b.json"), "w") as f:
        f.write("\n".join([_doc(6, GOOD), _doc(7, GOOD + " anew")]))
    q2 = start_document_ingest(spark, src, sink, ckpt, available_now=True)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(sink)
    assert got2.count() == 4  # only doc 7 is new
    assert got2.where("doc_id = 6").count() == 0
