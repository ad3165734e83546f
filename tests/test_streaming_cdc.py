"""Streaming SCD2 maintenance: incremental result equals the batch
rebuild over the same changelog prefix, restarts are idempotent, and
micro-batches only rewrite the key-buckets they touch."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from sandbox_data_pipeline_spark.operators.cdc import scd2_history
from sandbox_data_pipeline_spark.streaming.cdc import start_scd2_pipeline

SCHEMA = StructType(
    [
        StructField("cust_id", IntegerType()),
        StructField("seq", IntegerType()),
        StructField("segment", StringType()),
        StructField("city", StringType()),
    ]
)

KEYS, ORDER, TRACK = ["cust_id"], ["seq"], ["segment", "city"]

WAVE1 = [
    {"cust_id": 1, "seq": 1, "segment": "bronze", "city": "rome"},
    {"cust_id": 1, "seq": 2, "segment": "bronze", "city": "rome"},  # no change
    {"cust_id": 1, "seq": 3, "segment": "silver", "city": "rome"},
    {"cust_id": 2, "seq": 1, "segment": "gold", "city": "oslo"},
]
WAVE2 = [
    {"cust_id": 1, "seq": 4, "segment": "silver", "city": "lima"},
    {"cust_id": 2, "seq": 2, "segment": "gold", "city": "oslo"},  # no change
    {"cust_id": 3, "seq": 1, "segment": "bronze", "city": "kiev"},
]


def _land(src_dir: str, rows: list[dict], name: str) -> None:
    os.makedirs(src_dir, exist_ok=True)
    path = os.path.join(src_dir, name)
    with open(path + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(path + ".tmp", path)


def _run(spark, src, tgt, ckpt):
    q = start_scd2_pipeline(
        spark, src, tgt, ckpt, KEYS, ORDER, TRACK, SCHEMA,
        n_buckets=4, available_now=True,
    )
    q.awaitTermination(120)


def _versions(spark, tgt):
    return {
        (r.cust_id, r.valid_from_seq, r.valid_to_seq, r.is_current, r.segment, r.city)
        for r in spark.read.parquet(tgt).collect()
    }


def _batch_versions(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r.cust_id, r.valid_from_seq, r.valid_to_seq, r.is_current, r.segment, r.city)
        for r in scd2_history(df, KEYS, ORDER, TRACK).collect()
    }


def test_stream_scd2_matches_batch_after_each_wave(spark, tmp_path):
    src, tgt, ckpt = (str(tmp_path / d) for d in ("src", "tgt", "ckpt"))
    _land(src, WAVE1, "w1.json")
    _run(spark, src, tgt, ckpt)
    assert _versions(spark, tgt) == _batch_versions(spark, WAVE1)

    _land(src, WAVE2, "w2.json")
    _run(spark, src, tgt, ckpt)
    assert _versions(spark, tgt) == _batch_versions(spark, WAVE1 + WAVE2)


def test_stream_scd2_restart_idempotent(spark, tmp_path):
    src, tgt, ckpt = (str(tmp_path / d) for d in ("src", "tgt", "ckpt"))
    _land(src, WAVE1, "w1.json")
    _run(spark, src, tgt, ckpt)
    before = _versions(spark, tgt)
    _run(spark, src, tgt, ckpt)  # no new files
    assert _versions(spark, tgt) == before


def test_stream_scd2_replayed_rows_are_noops(spark, tmp_path):
    src, tgt, ckpt = (str(tmp_path / d) for d in ("src", "tgt", "ckpt"))
    _land(src, WAVE1, "w1.json")
    _run(spark, src, tgt, ckpt)
    # at-least-once delivery: the same rows arrive again as a new file
    _land(src, WAVE1, "w1_replay.json")
    _run(spark, src, tgt, ckpt)
    assert _versions(spark, tgt) == _batch_versions(spark, WAVE1)


def test_stream_scd2_only_touched_buckets_rewritten(spark, tmp_path):
    src, tgt, ckpt = (str(tmp_path / d) for d in ("src", "tgt", "ckpt"))
    _land(src, WAVE1, "w1.json")
    _run(spark, src, tgt, ckpt)
    # record per-bucket file mtimes, then land a wave touching only cust 3
    def mtimes():
        out = {}
        for b in os.listdir(tgt):
            if b.startswith("_kb="):
                d = os.path.join(tgt, b)
                out[b] = max(
                    os.path.getmtime(os.path.join(d, f))
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                )
        return out

    before = mtimes()
    time.sleep(1.1)
    wave = [{"cust_id": 3, "seq": 1, "segment": "bronze", "city": "kiev"}]
    _land(src, wave, "w3.json")
    _run(spark, src, tgt, ckpt)
    after = mtimes()
    b3 = (
        spark.createDataFrame(wave, SCHEMA)
        .select(F.pmod(F.xxhash64("cust_id"), F.lit(4)).cast("int").alias("b"))
        .first()
        .b
    )
    for b, t in before.items():
        if b != f"_kb={b3}":
            assert after[b] == t, f"untouched bucket {b} was rewritten"
    assert after[f"_kb={b3}"] > before.get(f"_kb={b3}", 0)
