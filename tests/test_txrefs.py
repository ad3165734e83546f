"""Named refs (tags + WAP branches) and CDF-driven incremental
join-view maintenance on the transactional table format.

Covers the semantics the oracle queries (q_table_branch, q_join_ivm)
cannot: tag immutability under later commits, branch isolation in both
directions, publish-time OCC conflicts, duplicate-ref races, and the
join IVM's delta-vs-recompute equivalence across a delete."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.sinks.txlog import (
    ConcurrentModification,
    TxTable,
    branch_table,
    create_branch,
    create_tag,
    list_refs,
    publish_branch,
    read_ref,
    read_tag,
    refresh_join_rollup,
)


def _mk(spark, tmp_path, n=100, start=0, parts=4):
    df = (
        spark.range(start, start + n)
        .select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
        .repartitionByRange(parts, "k")
    )
    return TxTable.create(spark, str(tmp_path / "tbl"), df)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_tag_pins_version_forever(spark, tmp_path):
    t = _mk(spark, tmp_path)
    create_tag(t, "initial")
    t.append(_rows(spark, 100, 150))
    t.overwrite_all(_rows(spark, 0, 10))
    assert read_tag(t, "initial").count() == 100
    assert t.read().count() == 10


def test_tag_name_is_unique(spark, tmp_path):
    t = _mk(spark, tmp_path)
    create_tag(t, "x")
    with pytest.raises(FileExistsError):
        create_tag(t, "x")


def test_tag_rejects_bad_version_and_name(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError):
        create_tag(t, "y", version=5)
    with pytest.raises(ValueError):
        create_tag(t, "../escape")


def test_branch_is_isolated_both_ways(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = create_branch(t, "dev")
    b.append(_rows(spark, 100, 120))
    t.append(_rows(spark, 200, 250))
    assert b.read().count() == 120  # branch never sees parent's append
    assert t.read().count() == 150  # parent never sees branch's append
    assert b.read().where(F.col("k") >= 200).count() == 0


def test_branch_fork_is_zero_copy(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = create_branch(t, "dev")
    e = b._read_entry(0)
    assert e["operation"] == "branch_fork"
    # every v0 file resolves against the PARENT's root — no bytes moved
    assert all(a.get("base") == t.path for a in e["add"])


def test_publish_composes_with_parent_appends(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = create_branch(t, "wap")
    b.append(_rows(spark, 100, 120))
    b.append(_rows(spark, 120, 130))
    t.append(_rows(spark, 200, 250))
    v = publish_branch(t, "wap")
    got = t.read()
    assert got.count() == 100 + 30 + 50
    # one commit landed the whole branch delta
    assert t.history()[v]["operation"] == "publish_branch"
    # time travel to just before the publish shows no branch rows
    assert t.read(version=v - 1).where(
        F.col("k").between(100, 129)
    ).count() == 0


def test_publish_conflicts_with_parent_rewrite(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = create_branch(t, "wap")
    b.delete_where("k", 10, 20)  # branch REMOVES fork-snapshot files
    t.delete_where("k", 50, 60)  # parent rewrites after the fork
    with pytest.raises(ConcurrentModification):
        publish_branch(t, "wap")


def test_publish_branch_delete_lands(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = create_branch(t, "wap")
    b.delete_where("k", 10, 20)
    publish_branch(t, "wap")
    assert t.read().where(F.col("k").between(10, 20)).count() == 0
    assert t.read().count() == 89


def test_publish_rejects_diverged_schema(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = create_branch(t, "wap")
    b.add_columns([("extra", "string")])
    with pytest.raises(ValueError, match="schema diverged"):
        publish_branch(t, "wap")


def test_refs_listing_and_branch_handle(spark, tmp_path):
    t = _mk(spark, tmp_path)
    create_tag(t, "t0")
    create_branch(t, "dev")
    refs = {r["name"]: r["type"] for r in list_refs(t)}
    assert refs == {"t0": "tag", "dev": "branch"}
    assert read_ref(t, "dev")["fork_version"] == 0
    b = branch_table(t, "dev")
    assert b.read().count() == 100
    with pytest.raises(ValueError):
        branch_table(t, "t0")


def _join_mv_recompute(t, dim):
    return (
        t.read()
        .join(dim, F.col("k") % 5 == F.col("g"))
        .groupBy("name")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
    )


def test_join_ivm_tracks_append_and_delete(spark, tmp_path):
    t = _mk(spark, tmp_path)
    dim = spark.createDataFrame(
        [(g, f"grp{g}") for g in range(5)], "g long, name string"
    )
    args = dict(fact_key="kmod", dim_key="g", group_col="name", val="v")
    # the join key is k % 5, materialized as a fact column
    def with_key(df):
        return df.withColumn("kmod", F.col("k") % 5)

    # rebuild the fact table with the join-key column
    t2 = TxTable.create(
        spark,
        str(tmp_path / "tbl2"),
        with_key(_rows(spark, 0, 100)).repartitionByRange(4, "k"),
    )
    mv, ver = refresh_join_rollup(t2, dim, mv=None, last_version=-1, **args)
    mv = spark.createDataFrame(mv.collect(), mv.schema)
    t2.append(with_key(_rows(spark, 100, 150)))
    mv, ver = refresh_join_rollup(t2, dim, mv=mv, last_version=ver, **args)
    mv = spark.createDataFrame(mv.collect(), mv.schema)
    t2.delete_where("k", 0, 120)
    mv, ver = refresh_join_rollup(t2, dim, mv=mv, last_version=ver, **args)
    got = {r["name"]: (r["total"], r["n"]) for r in mv.collect()}
    want = {
        r["name"]: (r["total"], r["n"])
        for r in (
            t2.read()
            .join(dim, F.col("kmod") == F.col("g"))
            .groupBy("name")
            .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert got == want
    assert ver == t2.latest_version()


def test_join_ivm_drops_empty_groups(spark, tmp_path):
    dim = spark.createDataFrame([(0, "only")], "g long, name string")
    df = (
        spark.range(0, 10)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("v"),
            F.lit(0).cast("long").alias("kmod"),
        )
        .repartitionByRange(2, "k")
    )
    t = TxTable.create(spark, str(tmp_path / "tbl"), df)
    args = dict(fact_key="kmod", dim_key="g", group_col="name", val="v")
    mv, ver = refresh_join_rollup(t, dim, mv=None, last_version=-1, **args)
    mv = spark.createDataFrame(mv.collect(), mv.schema)
    assert mv.count() == 1
    t.delete_where("k", 0, 9)  # every fact row gone
    mv, ver = refresh_join_rollup(t, dim, mv=mv, last_version=ver, **args)
    assert mv.count() == 0  # group count reached 0 → dropped


def test_join_ivm_noop_refresh_returns_same_mv(spark, tmp_path):
    dim = spark.createDataFrame([(0, "only")], "g long, name string")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.lit(0).cast("long").alias("kmod"),
    )
    t = TxTable.create(spark, str(tmp_path / "tbl"), df)
    args = dict(fact_key="kmod", dim_key="g", group_col="name", val="v")
    mv, ver = refresh_join_rollup(t, dim, mv=None, last_version=-1, **args)
    mv = spark.createDataFrame(mv.collect(), mv.schema)
    mv2, ver2 = refresh_join_rollup(t, dim, mv=mv, last_version=ver, **args)
    assert mv2 is mv and ver2 == ver


def test_vacuum_honors_ref_pins(spark, tmp_path):
    """A tag's version and a branch's fork point survive vacuum until
    the ref is dropped — refs are retention policy, not just pointers."""
    from pyspark.sql import functions as F

    from sandbox_data_pipeline_spark.sinks.txlog import (
        TxTable,
        create_tag,
        drop_ref,
        read_tag,
    )

    df = spark.range(0, 50).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    t = TxTable.create(spark, str(tmp_path / "t"), df)
    create_tag(t, "snap0")
    t.overwrite_all(spark.createDataFrame([(1, 1)], "k long, v long"))
    deleted = t.vacuum(retain_versions=1, retain_seconds=0)
    assert deleted == []  # v0 files pinned by the tag
    assert read_tag(t, "snap0").count() == 50
    drop_ref(t, "snap0")
    deleted = t.vacuum(retain_versions=1, retain_seconds=0)
    assert deleted  # pin released → v0 reclaimed
    assert t.read().count() == 1
