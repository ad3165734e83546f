"""End-to-end streaming training-data ingest: quality gate + stateful
content dedup across batches and restarts."""

from __future__ import annotations

import pytest

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


def test_passage_admission_stream_equals_batch_twin(spark, tmp_path):
    """Span-level admission: the stream's per-batch verdicts must equal
    the BATCH passage_dup_ratio rule computed over store ∪ batch, and
    the store accumulates spans across batches."""
    import json

    from sandbox_data_pipeline_spark.operators.dedup import passage_dup_ratio
    from sandbox_data_pipeline_spark.streaming.ingest import (
        start_passage_admission,
    )

    src = tmp_path / "src"
    src.mkdir()
    adm = str(tmp_path / "adm")
    ckpt = str(tmp_path / "ck")
    W = 4  # 4-token passages

    A = "a1 a2 a3 a4 a5 a6 a7 a8"          # passages: (a1..a4), (a5..a8)
    B = "b1 b2 b3 b4 b5 b6 b7 b8"
    MIX = "a1 a2 a3 a4 n1 n2 n3 n4"         # half recycled from A

    def doc(i, text):
        return json.dumps(
            {"doc_id": i, "text": text, "lang": "en", "source": "s",
             "n_chars": len(text)}
        )

    (src / "b1.json").write_text("\n".join([doc(1, A), doc(2, B), doc(3, MIX)]))
    q = start_passage_admission(
        spark, str(src), adm, ckpt, window=W, max_dup_ratio=0.6,
        rejected_dir=str(tmp_path / "rej"),
    )
    q.awaitTermination(120)
    got1 = {r.doc_id for r in spark.read.parquet(adm).collect()}
    # batch twin (empty store): verdict == q_passage_dup_ratio's rule
    fixture1 = spark.createDataFrame(
        [(1, A), (2, B), (3, MIX)], "doc_id long, text string"
    )
    want1 = {
        r["doc_id"]
        for r in passage_dup_ratio(fixture1, window=W).collect()
        if r["dup_ratio"] <= 0.6
    }
    assert got1 == want1
    assert got1 == {1, 2, 3}  # A/MIX share one passage: ratio 0.5 each

    # batch 2: exact recycle of A (ratio 1), quarter-recycle, novel
    QTR = "a1 a2 a3 a4 c1 c2 c3 c4 c5 c6 c7 c8"  # 1 of 3 passages recycled
    NEW = "d1 d2 d3 d4 d5 d6 d7 d8"
    (src / "b2.json").write_text(
        "\n".join([doc(10, A), doc(11, QTR), doc(12, NEW)])
    )
    q2 = start_passage_admission(
        spark, str(src), adm, ckpt, window=W, max_dup_ratio=0.6,
        rejected_dir=str(tmp_path / "rej"),
    )
    q2.awaitTermination(120)
    got2 = {r.doc_id for r in spark.read.parquet(adm).collect()}
    # batch twin for batch 2: ratio over (admitted store ∪ batch),
    # restricted to batch docs
    store_docs = [(r.doc_id, r.text) for r in spark.read.parquet(adm)
                  .where("doc_id < 10").select("doc_id", "text").collect()]
    fixture2 = spark.createDataFrame(
        store_docs + [(10, A), (11, QTR), (12, NEW)],
        "doc_id long, text string",
    )
    want2_batch = {
        r["doc_id"]
        for r in passage_dup_ratio(fixture2, window=W).collect()
        if r["dup_ratio"] <= 0.6 and r["doc_id"] >= 10
    }
    assert got2 - got1 == want2_batch
    assert 10 not in got2          # full span recycle rejected
    assert 11 in got2 and 12 in got2
    rej = {r.doc_id: r.dup_ratio for r in
           spark.read.parquet(str(tmp_path / "rej")).collect()}
    assert rej[10] == 1.0


def test_passage_admission_replay_is_idempotent(spark, tmp_path):
    import json

    from sandbox_data_pipeline_spark.streaming.ingest import (
        start_passage_admission,
    )

    src = tmp_path / "src"
    src.mkdir()
    adm = str(tmp_path / "adm")
    text = "w1 w2 w3 w4 w5 w6 w7 w8"
    (src / "b1.json").write_text(json.dumps(
        {"doc_id": 1, "text": text, "lang": "en", "source": "s", "n_chars": 1}
    ))
    q = start_passage_admission(
        spark, str(src), adm, str(tmp_path / "ck1"), window=4
    )
    q.awaitTermination(120)
    assert spark.read.parquet(adm).count() == 1
    # replay the SAME batch with a fresh checkpoint (worst case):
    # the doc's own spans are in the store, ratio 1, append empty
    q2 = start_passage_admission(
        spark, str(src), adm, str(tmp_path / "ck2"), window=4
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(adm).count() == 1


@pytest.mark.slow
def test_media_admission_incremental_manifest(spark, tmp_path):
    """Streaming media near-dup gate through the incremental
    fingerprint manifest (round-11 verdict item 5): (1) the admitted
    store equals the gate rule replayed in BATCH form over the same
    micro-batches, and (2) the incrementally-maintained manifest
    equals a FULL fingerprint rebuild of the admitted store — the
    q_media_manifest_ivm equivalence, now on the streaming surface."""
    import json

    from pyspark.sql import functions as F

    from sandbox_data_pipeline_spark.operators.multimodal import (
        fingerprint_frame,
    )
    from sandbox_data_pipeline_spark.streaming.ingest import (
        start_media_admission,
    )

    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    manifest = str(tmp_path / "manifest")

    # ids picked for a collision-free baseline (the synthetic JPEG/AVI
    # fingerprints are coarse functions of doc_id, so arbitrary small
    # ids collide): 100/101/102/107 are mutually clean on every
    # fingerprint half; 142 (≡1 mod 3, the WAV lane) re-sends doc
    # 100's text, so its audio trend fingerprint is identical and the
    # gate must reject it.
    def _text(i: int) -> str:
        return f"document number {i} body with its own words " + "x " * (
            i % 7
        )

    texts = {i: _text(i) for i in (100, 101, 102, 107)}
    batches = [
        [(100, texts[100]), (101, texts[101]), (102, texts[102])],
        [(142, texts[100]), (107, texts[107])],
    ]

    def _write_batch(i, rows):
        with open(src / f"b{i}.json", "w") as f:
            f.write(
                "\n".join(
                    json.dumps(
                        {
                            "doc_id": d,
                            "text": t,
                            "lang": "en",
                            "source": "t",
                            "n_chars": len(t),
                        }
                    )
                    for d, t in rows
                )
            )

    def _halves(fps):
        h1 = fps.select(
            "kind", "media_id", F.lit(1).alias("half"), F.col("h1").alias("h")
        )
        h2 = fps.where(F.col("kind") != "audio").select(
            "kind", "media_id", F.lit(2).alias("half"), F.col("h2").alias("h")
        )
        return h1.unionByName(h2)

    # batch replay of the gate rule: corpus-half collision OR
    # smaller-media-id same-batch collision
    admitted_expect: list[int] = []
    corpus_fps = None
    for rows in batches:
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        fps = fingerprint_frame(docs).localCheckpoint()
        bh = _halves(fps)
        rej = set()
        if corpus_fps is not None:
            rej |= {
                r["media_id"]
                for r in bh.join(
                    _halves(corpus_fps).select("kind", "half", "h"),
                    ["kind", "half", "h"],
                    "left_semi",
                )
                .select("media_id")
                .collect()
            }
        pairs = (
            bh.alias("a")
            .join(
                bh.alias("b"),
                (F.col("a.kind") == F.col("b.kind"))
                & (F.col("a.half") == F.col("b.half"))
                & (F.col("a.h") == F.col("b.h"))
                & (F.col("a.media_id") > F.col("b.media_id")),
            )
            .select(F.col("a.media_id").alias("m"))
            .collect()
        )
        rej |= {r["m"] for r in pairs}
        adm = [d for d, _ in rows if d not in rej]
        admitted_expect.extend(adm)
        adm_fps = fps.where(F.col("media_id").isin(adm))
        corpus_fps = (
            adm_fps
            if corpus_fps is None
            else corpus_fps.unionByName(adm_fps)
        ).localCheckpoint()

    # sanity on the fixture: batch 1 fully admitted, doc 142 rejected
    assert admitted_expect == [100, 101, 102, 107]

    # drive the stream batch by batch (availableNow drains all files
    # present, so write-then-run per batch)
    for i, rows in enumerate(batches):
        _write_batch(i, rows)
        q = start_media_admission(
            spark, str(src), store, ckpt, manifest_dir=manifest
        )
        q.awaitTermination(180)

    from sandbox_data_pipeline_spark.sinks.txlog import TxTable

    store_df = TxTable(spark, store).read()
    got_ids = sorted(
        r["doc_id"] for r in store_df.select("doc_id").collect()
    )
    assert got_ids == sorted(admitted_expect)

    # IVM equivalence: incremental manifest == full rebuild of store
    full = fingerprint_frame(store_df.select("doc_id", "text"))
    inc = spark.read.parquet(manifest)
    cols = ["kind", "media_id", "frame_idx", "h1", "h2"]
    assert sorted(map(tuple, inc.select(*cols).collect())) == sorted(
        map(tuple, full.select(*cols).collect())
    )
