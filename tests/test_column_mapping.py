"""Column mapping (Delta's 'name' mode): rename/drop are metadata-only
commits; physical parquet columns never change, time travel resolves
names per version, and a re-added logical name gets a fresh physical
name so dropped bytes cannot resurrect."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.sinks.txlog import (
    TxTable,
    clone,
    create_branch,
    table_changes,
)


def _mk(spark, tmp_path, rows=((1, 10, "a"), (2, 20, "b"))):
    df = spark.createDataFrame(list(rows), "id long, qty long, tag string")
    return TxTable.create(spark, str(tmp_path / "tbl"), df)


def test_rename_is_metadata_only_and_time_travels(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = set(t.snapshot().keys())
    v = t.rename_column("qty", "quantity")
    assert set(t.snapshot().keys()) == before  # zero files touched
    assert t.read().columns == ["id", "quantity", "tag"]
    assert t.read(version=v - 1).columns == ["id", "qty", "tag"]
    assert {(r["id"], r["quantity"]) for r in t.read().collect()} == {
        (1, 10),
        (2, 20),
    }


def test_append_after_rename_writes_physical_names(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("qty", "quantity")
    t.append(
        spark.createDataFrame(
            [(3, 30, "c")], "id long, quantity long, tag string"
        )
    )
    got = {(r["id"], r["quantity"], r["tag"]) for r in t.read().collect()}
    assert got == {(1, 10, "a"), (2, 20, "b"), (3, 30, "c")}
    # the new data file carries the ORIGINAL physical name
    newest = [f for f in t.snapshot().values() if "/v2-" in f.path]
    assert newest  # append targeted v2 (create=0, rename=1)
    raw = spark.read.parquet(os.path.join(t.path, newest[0].path))
    assert "qty" in raw.columns and "quantity" not in raw.columns


def test_drop_hides_then_fresh_readd_does_not_resurrect(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v_drop = t.drop_column("tag")
    assert t.read().columns == ["id", "qty"]
    assert t.read(version=v_drop - 1).columns == ["id", "qty", "tag"]
    t.add_columns([("tag", "string")])
    t.append(
        spark.createDataFrame([(3, 30, "new")], "id long, qty long, tag string")
    )
    rows = {(r["id"], r["tag"]) for r in t.read().collect()}
    # old rows must NOT resurrect their dropped 'a'/'b' values
    assert rows == {(1, None), (2, None), (3, "new")}


def test_rename_guards(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("qty", "tag")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    t.set_partition_spec(["tag"])
    with pytest.raises(ValueError, match="partition column"):
        t.rename_column("tag", "category")
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column("tag")


def test_drop_guards(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_constraint("qty_pos", "qty > 0")
    with pytest.raises(ValueError, match="CHECK"):
        t.drop_column("qty")
    one = TxTable.create(
        spark,
        str(tmp_path / "one"),
        spark.createDataFrame([(1,)], "id long"),
    )
    with pytest.raises(ValueError, match="only column"):
        one.drop_column("id")


def test_delete_and_cdf_through_rename(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("qty", "quantity")
    res = t.delete_where("quantity", 15, 25)  # deletes id=2
    assert res["files_rewritten"] >= 1
    assert {r["id"] for r in t.read().collect()} == {1}
    feed = table_changes(t, 0, t.latest_version())
    assert set(feed.columns) >= {"id", "quantity", "tag", "_change_type"}
    deld = {r["id"] for r in feed.where("_change_type = 'delete'").collect()}
    assert deld == {2}


def test_clone_and_branch_carry_mapping(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("qty", "quantity")
    c = clone(t, spark, str(tmp_path / "copy"))
    assert c.read().columns == ["id", "quantity", "tag"]
    assert {(r["id"], r["quantity"]) for r in c.read().collect()} == {
        (1, 10),
        (2, 20),
    }
    b = create_branch(t, "dev")
    assert b.read().columns == ["id", "quantity", "tag"]


def test_predicate_pruning_uses_physical_stats(spark, tmp_path):
    from sandbox_data_pipeline_spark.sinks.txlog import files_skipped

    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(9, 90, "z")], "id long, qty long, tag string"))
    t.rename_column("qty", "quantity")
    # pruning on the LOGICAL name must consult physical footer stats
    skipped = files_skipped(t, "quantity", 85, 95)
    assert skipped["files_read"] < skipped["files_total"]
    got = {r["id"] for r in t.read(predicate=("quantity", 85, 95)).collect()}
    assert 9 in got


@pytest.mark.slow
def test_merge_schema_evolution(spark, tmp_path):
    """MERGE autoMerge: an extra source column widens the table
    (NULL on pre-merge rows); a missing source column NULL-fills."""
    t = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, 25, "b2", "eu"), (5, 50, "e", "us")],
        "id long, qty long, tag string, region string",
    )
    t.merge(src, "id", evolve_schema=True)
    got = {
        (r["id"], r["qty"], r["region"]) for r in t.read().collect()
    }
    assert got == {(1, 10, None), (2, 25, "eu"), (5, 50, "us")}
    # default stays historical: extra source columns projected away
    t2 = _mk(spark, tmp_path / "b")
    t2.merge(src, "id")
    assert "region" not in t2.read().columns
    # evolution + missing source column: NULL-filled source side
    src2 = spark.createDataFrame([(7, 70)], "id long, qty long")
    t.merge(src2, "id", evolve_schema=True)
    r7 = [r for r in t.read().collect() if r["id"] == 7][0]
    assert r7["qty"] == 70 and r7["tag"] is None and r7["region"] is None


def test_merge_schema_evolution_under_mapping(spark, tmp_path):
    """autoMerge through a rename: the new column gets a fresh
    physical name and the renamed key still prunes/merges."""
    t = _mk(spark, tmp_path)
    t.rename_column("qty", "quantity")
    src = spark.createDataFrame(
        [(1, 11, "a1", 99)], "id long, quantity long, tag string, score long"
    )
    t.merge(src, "id", evolve_schema=True)
    got = {(r["id"], r["quantity"], r["score"]) for r in t.read().collect()}
    assert got == {(1, 11, 99), (2, 20, None)}


def test_streaming_sink_through_rename(spark, tmp_path):
    """txlog_sink appends keep working after a rename: the foreachBatch
    write resolves the mapping at write time."""
    import json as _json

    from sandbox_data_pipeline_spark.sinks.txlog import txlog_sink

    t = _mk(spark, tmp_path)
    t.rename_column("qty", "quantity")
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(
        _json.dumps({"id": 3, "quantity": 30, "tag": "c"})
    )
    stream = spark.readStream.schema(
        "id long, quantity long, tag string"
    ).json(str(src))
    q = (
        stream.writeStream.foreachBatch(txlog_sink(t.path, "cmtest"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["id"], r["quantity"]) for r in t.read().collect()}
    assert got == {(1, 10), (2, 20), (3, 30)}


def test_rename_refuses_constraint_referenced_column(spark, tmp_path):
    """A rename under an active CHECK constraint would leave the stored
    constraint SQL pointing at a missing logical name — every later
    write would fail resolution. The guard refuses up front (same as
    drop_column); dropping the constraint unblocks the rename."""
    t = _mk(spark, tmp_path)
    t.add_constraint("qty_cap", "qty <= 100")
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("qty", "quantity")
    # table is still writable (the failed rename committed nothing)
    t.append(spark.createDataFrame([(3, 30, "c")], "id long, qty long, tag string"))
    assert t.read().count() == 3
    t.drop_constraint("qty_cap")
    t.rename_column("qty", "quantity")
    assert t.read().columns == ["id", "quantity", "tag"]


def test_scoped_optimize_prunes_through_renamed_column(spark, tmp_path):
    """optimize(where=) maps the logical predicate column to its
    physical stats key: after a rename, a scoped optimize still
    compacts ONLY the overlapping files instead of silently degrading
    to a whole-table rewrite."""
    from sandbox_data_pipeline_spark.sinks.txlog import optimize

    base = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    ).repartitionByRange(4, "k")
    t = TxTable.create(spark, str(tmp_path / "opt"), base)
    t.rename_column("k", "key")
    before = t.snapshot()
    untouched = {
        p: f.bytes
        for p, f in before.items()
        if f.stats["k"]["max"] < 0 or f.stats["k"]["min"] > 99
    }
    assert untouched  # files wholly outside the range exist
    r = optimize(t, where=("key", 0, 99), num_files=1)
    assert r["files_before"] < len(before)  # pruning actually fired
    after = t.snapshot()
    for p, b in untouched.items():
        assert p in after and after[p].bytes == b
    assert t.read().count() == 400
