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


def test_dedup_admission_across_batches(spark, tmp_path):
    import json

    from sandbox_data_pipeline_spark.streaming.ingest import start_dedup_admission

    src = tmp_path / "src"
    src.mkdir()
    admitted = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows1 = [
        {"doc_id": 1, "text": base, "lang": "en", "source": "s", "n_chars": len(base)},
        {"doc_id": 2, "text": base + " tail", "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 3, "text": "completely different words about spark shuffles here",
         "lang": "en", "source": "s", "n_chars": 1},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows1))
    q = start_dedup_admission(spark, str(src), admitted, ckpt)
    q.awaitTermination(120)
    got1 = {r.doc_id for r in spark.read.parquet(admitted).collect()}
    # doc 2 is a near-dup of doc 1 (keep-lowest-id); doc 3 is novel
    assert 1 in got1 and 3 in got1 and 2 not in got1

    rows2 = [
        {"doc_id": 10, "text": base, "lang": "en", "source": "s", "n_chars": 1},  # exact dup of corpus
        {"doc_id": 11, "text": base + " coda", "lang": "en", "source": "s", "n_chars": 1},  # near-dup of corpus
        {"doc_id": 12, "text": "fresh unrelated content with novel vocabulary entirely",
         "lang": "en", "source": "s", "n_chars": 1},
    ]
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows2))
    q2 = start_dedup_admission(spark, str(src), admitted, ckpt)
    q2.awaitTermination(120)
    got2 = {r.doc_id for r in spark.read.parquet(admitted).collect()}
    assert got2 >= got1
    assert 12 in got2  # novel doc admitted
    assert 10 not in got2  # exact dup of corpus rejected
    assert 11 not in got2  # near-dup of corpus rejected


def test_dedup_admission_quarantines_rejects_with_verdicts(spark, tmp_path):
    import json

    from sandbox_data_pipeline_spark.streaming.ingest import start_dedup_admission

    src = tmp_path / "src"
    src.mkdir()
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        {"doc_id": 1, "text": base, "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 2, "text": base, "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 3, "text": base + " mu", "lang": "en", "source": "s", "n_chars": 1},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    q = start_dedup_admission(
        spark, str(src), str(tmp_path / "adm"), str(tmp_path / "ck"),
        rejected_dir=str(tmp_path / "rej"),
    )
    q.awaitTermination(120)
    rej = {r.doc_id: r.verdict for r in spark.read.parquet(str(tmp_path / "rej")).collect()}
    assert rej[2] == "exact_batch"  # exact dup of lower-id batch doc
    assert rej[3] == "near_batch"  # near-dup of the batch survivor
    assert 1 not in rej


def test_trending_pipeline_ranks_and_merges(spark, tmp_path):
    import json

    from sandbox_data_pipeline_spark.streaming.trending import start_trending_pipeline

    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ck")

    def doc(i, text):
        return json.dumps(
            {"doc_id": i, "text": text, "lang": "en", "source": "s", "n_chars": 1}
        )

    (src / "b1.json").write_text(
        "\n".join([doc(1, "spark spark spark shuffle"), doc(2, "spark shuffle join")])
    )
    q = start_trending_pipeline(spark, str(src), sink, ckpt)
    q.awaitTermination(120)
    got = {r.token: r for r in spark.read.parquet(sink).collect()}
    assert got["spark"].n == 4 and got["spark"].rank == 1
    assert got["shuffle"].n == 2 and got["shuffle"].rank == 2
    assert got["join"].n == 1

    # a second batch flips the leader; counts MERGE (state truth), ranks recompute
    (src / "b2.json").write_text(
        "\n".join([doc(3, "join join join join join"), doc(4, "join")])
    )
    q2 = start_trending_pipeline(spark, str(src), sink, ckpt)
    q2.awaitTermination(120)
    got2 = {r.token: r for r in spark.read.parquet(sink).collect()}
    assert got2["join"].n == 7 and got2["join"].rank == 1
    assert got2["spark"].n == 4 and got2["spark"].rank == 2
