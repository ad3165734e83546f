"""Round-7 regression tests for the ADVICE.md findings:

1. merge() conditional path must classify rows by side PRESENCE, not
   key nullness — a NULL-key target row is target-only, never
   source-only (it was being dropped / NULL-corrupted).
2. set_partition_spec followed by add_columns must keep the table
   readable: hive-partitioned files written before the evolution lack
   the new column and must NULL-backfill like plain files.
3. CHECK constraints enforce on merge() and replace_where(), not just
   append/overwrite (Delta's all-write-paths semantics).
4. Partition values are typed from the declared schema: a STRING
   partition column with numeric-looking values ('01') round-trips as
   the string '01', never int 1, and its min/max stats stay strings.
5. audio_onsets emits no window for an empty audio body (the oracle
   enumerates existing characters only), and the grading corpus stays
   inside the oracle's 65536-char enumeration bound.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.sinks.txlog import (
    TxTable,
    replace_where,
)


@pytest.mark.slow
def test_merge_conditional_preserves_null_key_target_rows(spark, tmp_path):
    # target has a NULL-key row; source never matches it
    base = spark.createDataFrame(
        [(1, 10), (2, 20), (None, 77)], "k long, v long"
    )
    t = TxTable.create(spark, str(tmp_path / "tbl"), base)
    src = spark.createDataFrame([(2, 200), (3, 300)], "k long, v long")

    # conditional path, inserts suppressed: NULL-key target row must
    # survive untouched (the bug dropped it as "source-only")
    t.merge(src, "k", matched_condition="s.v > t.v", insert_unmatched=False)
    rows = {(r["k"], r["v"]) for r in t.read().collect()}
    assert rows == {(1, 10), (2, 200), (None, 77)}

    # conditional path with inserts: NULL-key target row must keep its
    # own values (the bug rewrote every column from the all-NULL
    # source side)
    t2 = TxTable.create(spark, str(tmp_path / "tbl2"), base)
    t2.merge(src, "k", matched_condition="s.v > t.v", insert_unmatched=True)
    rows = {(r["k"], r["v"]) for r in t2.read().collect()}
    assert rows == {(1, 10), (2, 200), (3, 300), (None, 77)}

    # fast upsert path agrees (it already preserved NULL keys)
    t3 = TxTable.create(spark, str(tmp_path / "tbl3"), base)
    t3.merge(src, "k")
    rows = {(r["k"], r["v"]) for r in t3.read().collect()}
    assert rows == {(1, 10), (2, 200), (3, 300), (None, 77)}


def test_partition_spec_then_add_columns_backfills(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 6), (3, "a", 7)], "k long, g string, v long"
    )
    t = TxTable.create(spark, str(tmp_path / "tbl"), df)
    t.set_partition_spec(["g"])
    # this append lands hive-partitioned WITHOUT the soon-added column
    t.append(
        spark.createDataFrame([(4, "b", 8)], "k long, g string, v long")
    )
    t.add_columns([("extra", "string")])
    # widened writes go through overwrite_all-free append with the new
    # schema; here just READ: pre-evolution partitioned files must
    # NULL-backfill `extra` instead of raising unresolved-column
    got = t.read()
    assert set(got.columns) == {"k", "g", "v", "extra"}
    assert got.count() == 4
    assert got.where(F.col("extra").isNull()).count() == 4


@pytest.mark.slow
def test_check_constraint_enforced_on_merge_and_replace_where(spark, tmp_path):
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    t = TxTable.create(spark, str(tmp_path / "tbl"), df)
    t.add_constraint("v_pos", "v >= 0")

    with pytest.raises(ValueError, match="v_pos"):
        t.merge(
            spark.createDataFrame([(2, -5)], "k long, v long"),
            "k",
            matched_condition="s.v IS NOT NULL",
        )
    with pytest.raises(ValueError, match="v_pos"):
        t.merge(spark.createDataFrame([(3, -1)], "k long, v long"), "k")
    with pytest.raises(ValueError, match="v_pos"):
        replace_where(
            t,
            spark.createDataFrame([(1, -10)], "k long, v long"),
            "k",
            1,
            1,
        )
    # table unchanged by the three rejected writes
    assert {(r["k"], r["v"]) for r in t.read().collect()} == {(1, 10), (2, 20)}
    # and a clean merge still passes
    t.merge(spark.createDataFrame([(3, 30)], "k long, v long"), "k")
    assert t.read().count() == 3


def test_string_partition_values_stay_strings(spark, tmp_path):
    df = spark.createDataFrame(
        [("01", 1), ("2", 2), ("10", 3)], "g string, v long"
    )
    t = TxTable.create(spark, str(tmp_path / "tbl"), df)
    t.set_partition_spec(["g"])
    t.append(spark.createDataFrame([("01", 4), ("10", 5)], "g string, v long"))
    # AddFile partition dicts + stats carry the STRING values
    for f in t.snapshot().values():
        if f.partition:
            assert isinstance(f.partition["g"], str)
            assert isinstance(f.stats["g"]["min"], str)
    got = t.read()
    assert dict(got.dtypes)["g"] == "string"
    vals = {(r["g"], r["v"]) for r in got.collect()}
    assert vals == {("01", 1), ("2", 2), ("10", 3), ("01", 4), ("10", 5)}
    # predicate on the string partition column must not raise
    # str-vs-int comparisons in pruning and must return exact rows
    assert got.where(F.col("g") == "01").count() == 2


def test_int_partition_values_typed_from_schema(spark, tmp_path):
    df = spark.createDataFrame([(1, 10), (2, 20)], "g int, v long")
    t = TxTable.create(spark, str(tmp_path / "tbl"), df)
    t.set_partition_spec(["g"])
    t.append(spark.createDataFrame([(3, 30)], "g int, v long"))
    for f in t.snapshot().values():
        if f.partition:
            assert isinstance(f.partition["g"], int)
    got = t.read()
    assert dict(got.dtypes)["g"] == "int"
    assert got.where(F.col("g") == 3).count() == 1


def test_audio_onsets_empty_body_emits_no_rows(spark):
    import pandas as pd

    from sandbox_data_pipeline_spark.operators.multimodal import audio_onsets

    # 16-byte RIFF preamble + EMPTY body, plus one 3-byte body
    empty = b"R" * 16
    tiny = b"R" * 16 + bytes([10, 20, 30])
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2],
                "media_type": ["audio", "audio"],
                "content": [empty, tiny],
            }
        )
    )
    rows = audio_onsets(media, window_bytes=64).collect()
    # no window-0 row for the empty clip; one window for the 3-byte clip
    assert {r["media_id"] for r in rows} == {2}
    assert len(rows) == 1
    assert rows[0]["energy"] == 10 * 10 + 20 * 20 + 30 * 30


def test_audio_corpus_within_oracle_enumeration_bound(spark):
    """The q_audio_onsets oracle enumerates characters up to 65536 per
    document; the operator has no such cap. Assert the grading corpus
    (audio docs: doc_id % 3 = 1) stays inside the bound and non-empty
    at the SFs the driver grades, so oracle and operator see the same
    row set by construction."""
    import os

    for sf in ("sf0.001", "sf0.01"):
        p = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(p):
            continue
        docs = spark.read.parquet(p).where("doc_id % 3 = 1")
        bad = docs.where("n_chars <= 0 OR n_chars > 65536").count()
        assert bad == 0, f"{sf}: {bad} audio docs outside (0, 65536]"


def test_bloom_index_sidecar_above_threshold(spark, tmp_path):
    """Above inline_max_files the per-file bitmaps spill to a sidecar
    parquet under the log dir (never the vacuumable data dir) and the
    commit entry carries only the pointer; point lookups give the same
    answer through the distributed probe as through the inline dict."""
    import os

    from sandbox_data_pipeline_spark.sinks.txlog import (
        build_bloom_index,
        files_skipped_bloom,
    )

    df = (
        spark.range(0, 400)
        .select(F.col("id").alias("u"), (F.col("id") * 3).alias("v"))
        .repartitionByRange(4, "u")
    )
    t = TxTable.create(spark, str(tmp_path / "tbl"), df)
    n_files = len(t.snapshot())
    assert n_files >= 2

    # force the sidecar path with a tiny threshold
    build_bloom_index(t, "u", inline_max_files=1)
    entry = t._read_entry(t.latest_version())["keys_touched"]["bloom"]
    assert "files_ref" in entry and "files" not in entry
    side_dir = os.path.join(t.log_path, entry["files_ref"])
    assert os.path.isdir(side_dir)
    # log entry stays O(1): no bitmap payload inline
    assert len(str(entry)) < 200

    r_hit = files_skipped_bloom(t, "u", 7)
    r_miss = files_skipped_bloom(t, "u", 424242)
    assert r_hit["files_total"] == n_files
    assert 1 <= r_hit["files_read"] <= n_files
    # a never-present key prunes at least as hard as a present one
    assert r_miss["files_read"] <= r_hit["files_read"]

    # inline path on an identical table agrees
    t2 = TxTable.create(spark, str(tmp_path / "tbl2"), df)
    build_bloom_index(t2, "u")  # default threshold -> inline
    e2 = t2._read_entry(t2.latest_version())["keys_touched"]["bloom"]
    assert "files" in e2
    assert files_skipped_bloom(t2, "u", 7) == r_hit
    assert files_skipped_bloom(t2, "u", 424242) == r_miss

    # vacuum must never delete the sidecar (it lives under the log dir)
    t.vacuum(retain_versions=1, retain_seconds=0)
    assert os.path.isdir(side_dir)
    assert files_skipped_bloom(t, "u", 7) == r_hit
