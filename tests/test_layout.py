"""write_clustered: file-level data skipping via range clustering.

The assertion reads parquet FOOTER statistics with pyarrow — exactly
what any engine's scan planner consults — so the test proves the
layout enables skipping rather than trusting the writer's intent.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.sinks.writers import write_clustered

N_FILES = 8


def _file_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` per parquet file, from footer stats."""
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        ranges.append((lo, hi))
    return ranges


def test_clustered_files_are_disjoint_and_skippable(spark, sf_dir, tmp_path):
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    dst = str(tmp_path / "clustered")
    write_clustered(li, dst, ["l_orderkey"], n_files=N_FILES)

    ranges = sorted(_file_ranges(dst, "l_orderkey"))
    assert len(ranges) == N_FILES
    # range partitioning → file key ranges are pairwise disjoint
    for (_, hi_prev), (lo, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo

    # a narrow predicate overlaps exactly one file's [min, max]
    lo0, hi0 = ranges[0]
    probe = (lo0 + hi0) // 2
    overlapping = [r for r in ranges if r[0] <= probe <= r[1]]
    assert len(overlapping) == 1

    # counter-baseline: the same data hash-shuffled leaves every file
    # covering ~the whole domain, so the same probe prunes nothing
    messy = str(tmp_path / "messy")
    li.repartition(N_FILES).write.mode("overwrite").parquet(messy)
    messy_overlap = [r for r in _file_ranges(messy, "l_orderkey") if r[0] <= probe <= r[1]]
    assert len(messy_overlap) == len(_file_ranges(messy, "l_orderkey"))


def test_clustered_write_preserves_rows(spark, sf_dir, tmp_path):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    dst = str(tmp_path / "clustered2")
    write_clustered(li, dst, ["l_orderkey"], n_files=4)
    assert spark.read.parquet(dst).count() == li.count()


def _overlap_count(path: str, col: str, probe) -> tuple[int, int]:
    ranges = _file_ranges(path, col)
    return len([r for r in ranges if r[0] <= probe <= r[1]]), len(ranges)


def test_zordered_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    from sandbox_data_pipeline_spark.sinks.writers import write_zordered

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    dst = str(tmp_path / "zordered")
    write_zordered(li, dst, ["l_orderkey", "l_partkey"], n_files=16)

    import pyspark.sql.functions as F

    mids = li.agg(
        F.expr("percentile_approx(l_orderkey, 0.5)"),
        F.expr("percentile_approx(l_partkey, 0.5)"),
    ).collect()[0]

    # point predicates on EITHER z-ordered column overlap only a
    # fraction of files; a hash layout overlaps all of them
    for col, probe in (("l_orderkey", mids[0]), ("l_partkey", mids[1])):
        hit, total = _overlap_count(dst, col, probe)
        assert total >= 8
        assert hit <= total // 2, (col, hit, total)

    messy = str(tmp_path / "zmessy")
    li.repartition(16).write.mode("overwrite").parquet(messy)
    hit, total = _overlap_count(messy, "l_orderkey", mids[0])
    assert hit == total  # baseline: no skipping at all


def test_zordered_preserves_rows_and_schema(spark, sf_dir, tmp_path):
    from sandbox_data_pipeline_spark.sinks.writers import write_zordered

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    dst = str(tmp_path / "zordered2")
    write_zordered(li, dst, ["l_orderkey", "l_partkey"], n_files=4)
    back = spark.read.parquet(dst)
    assert set(back.columns) == {"l_orderkey", "l_partkey", "l_quantity"}
    assert back.count() == li.count()
    # no helper columns leak into the layout
    assert not any(c.startswith("_z") for c in back.columns)


def test_retention_sweep_drops_only_expired_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from sandbox_data_pipeline_spark.sinks.writers import (
        retention_sweep,
        write_partitioned,
    )

    base = str(tmp_path / "t")
    df = spark.range(30).select(
        F.col("id"), (F.lit(2024010100) + F.col("id") % 3).alias("run_hr")
    )
    write_partitioned(df, base)
    dropped = retention_sweep(spark, base, keep_from=2024010101)
    assert dropped == [2024010100]
    left = spark.read.parquet(base)
    assert {r.run_hr for r in left.select("run_hr").distinct().collect()} == {
        2024010101,
        2024010102,
    }
    assert left.count() == 20  # surviving partitions untouched
    # sweeping again is a no-op (idempotent)
    assert retention_sweep(spark, base, keep_from=2024010101) == []
    # missing root is a no-op, not an error
    assert retention_sweep(spark, str(tmp_path / "absent"), keep_from=0) == []


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Append-with-new-column then mergeSchema read: the production
    schema-evolution path for a partitioned landing table — old
    partitions surface the new column as NULL, no rewrite."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "t")
    v1 = spark.range(5).select("id", F.lit(2024010100).alias("run_hr"))
    v1.write.mode("overwrite").partitionBy("run_hr").parquet(base)
    v2 = spark.range(5, 10).select(
        "id", F.lit("en").alias("lang"), F.lit(2024010101).alias("run_hr")
    )
    v2.write.mode("append").partitionBy("run_hr").parquet(base)
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "lang", "run_hr"}
    old = merged.where("run_hr = 2024010100").select("lang").distinct().collect()
    assert [r.lang for r in old] == [None]
    assert merged.count() == 10


def test_zorder_skipping_beats_natural_layout(spark, sf_dir):
    """The oracle-verified analytic: for a predicate on the SECOND
    z-ordered column, the natural (first-column-ranged) layout skips
    ~nothing while the Morton layout skips most buckets."""
    from sandbox_data_pipeline_spark.queries.layout import q_zorder_skipping

    rows = {r["layout"]: r for r in q_zorder_skipping(spark, sf_dir).collect()}
    nat, z = rows["natural"], rows["zorder"]
    assert nat["buckets_total"] == z["buckets_total"]
    assert z["buckets_skipped"] > nat["buckets_skipped"]
    # z-order must prune a real majority of buckets, not a sliver
    assert z["buckets_skipped"] * 2 > z["buckets_total"]


def test_zvalue_matches_python_reference(spark, sf_dir):
    """Bit-level check of the Morton interleave against a direct
    Python reimplementation on a sample of rows."""
    from sandbox_data_pipeline_spark.operators.layout import zvalue

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sample = zvalue(li, "l_orderkey", "l_partkey", bits=8).limit(200).collect()
    lo_a = li.agg({"l_orderkey": "min"}).collect()[0][0]
    hi_a = li.agg({"l_orderkey": "max"}).collect()[0][0]
    lo_b = li.agg({"l_partkey": "min"}).collect()[0][0]
    hi_b = li.agg({"l_partkey": "max"}).collect()[0][0]

    def quant(x, lo, hi):
        return (x - lo) * 256 // (hi - lo + 1)

    def morton(qa, qb):
        out = 0
        for i in range(8):
            out |= ((qa >> i) & 1) << (2 * i)
            out |= ((qb >> i) & 1) << (2 * i + 1)
        return out

    for r in sample:
        expect = morton(
            quant(r["l_orderkey"], lo_a, hi_a), quant(r["l_partkey"], lo_b, hi_b)
        )
        assert r["zval"] == expect, r


def test_compaction_plan_invariants(spark, sf_dir):
    """First-fit grouping: rows conserved, groups contiguous from 0,
    and no group overshoots target by more than one file."""
    from sandbox_data_pipeline_spark.queries.layout import (
        COMPACT_TARGET,
        q_compaction_plan,
    )

    e = table(spark, sf_dir, "events")
    n_events = e.count()
    n_hours = e.selectExpr("date_trunc('hour', ts) h").distinct().count()
    max_file = (
        e.selectExpr("date_trunc('hour', ts) h")
        .groupBy("h")
        .count()
        .agg({"count": "max"})
        .collect()[0][0]
    )
    plan = q_compaction_plan(spark, sf_dir).collect()
    assert sum(r["total_rows"] for r in plan) == n_events
    assert sum(r["n_files"] for r in plan) == n_hours
    assert sorted(r["group_id"] for r in plan) == list(range(len(plan)))
    for r in plan:
        assert r["total_rows"] < COMPACT_TARGET + max_file


def test_stable_global_ids_dense_and_deterministic(spark, sf_dir):
    from sandbox_data_pipeline_spark.operators.ids import stable_global_ids

    e = table(spark, sf_dir, "events")
    n = e.count()
    ids1 = stable_global_ids(e, ["ts", "event_id"], num_partitions=7)
    got = ids1.select("global_id").collect()
    vals = sorted(r["global_id"] for r in got)
    assert vals == list(range(n))  # dense, 0-based, no gaps or dups
    # deterministic across runs and partition counts
    ids2 = stable_global_ids(e, ["ts", "event_id"], num_partitions=3)
    j = (
        ids1.select("event_id", F.col("global_id").alias("g1"))
        .join(ids2.select("event_id", F.col("global_id").alias("g2")), "event_id")
    )
    assert j.where(F.col("g1") != F.col("g2")).count() == 0


def test_ring_negative_samples_contract(spark, sf_dir):
    """Every anchor gets exactly k distinct negatives, none equal to
    the anchor, and the pairing is identical across runs."""
    from sandbox_data_pipeline_spark.operators.ids import ring_negative_samples

    d = table(spark, sf_dir, "documents")
    k = 3
    out = ring_negative_samples(d, k=k)
    rows = out.collect()
    n_docs = d.count()
    assert len(rows) == n_docs * k
    per_anchor = {}
    for r in rows:
        assert r["anchor_id"] != r["negative_id"]
        per_anchor.setdefault(r["anchor_id"], set()).add(r["negative_id"])
    assert all(len(v) == k for v in per_anchor.values())
    again = {(r["anchor_id"], r["neg_idx"], r["negative_id"]) for r in ring_negative_samples(d, k=k).collect()}
    assert again == {(r["anchor_id"], r["neg_idx"], r["negative_id"]) for r in rows}


def test_compaction_plan_renumbers_after_oversized_file(spark):
    """A file >= 2x target skips raw bin indices; group ids must still
    come out contiguous from 0 (the review-found latent break)."""
    from sandbox_data_pipeline_spark.operators.layout import compaction_plan

    files = spark.createDataFrame(
        [(1, 5000), (2, 100), (3, 100)], ["f", "rows"]
    )
    plan = sorted(
        compaction_plan(files, "rows", "f", target=2000).collect(),
        key=lambda r: r["group_id"],
    )
    assert [r["group_id"] for r in plan] == list(range(len(plan)))
    assert plan[0]["n_files"] == 1 and plan[0]["total_rows"] == 5000
    assert sum(r["total_rows"] for r in plan) == 5200


def test_csv_interchange_roundtrip_lossless(spark, tmp_path):
    """Write→read through the quoting config used by
    q_csv_interchange: hostile strings (commas, quotes, leading/
    trailing spaces) and dates survive bit-exactly."""
    rows = [
        (1, 'plain', None),
        (2, 'a,b', '2020-05-01'),
        (3, 'say "hi"', '2021-12-31'),
        (4, ' lead and trail ', '2019-02-28'),
        (5, 'mix,"of,both"', '2020-02-29'),
        (6, '', '2020-01-01'),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "id BIGINT, s STRING, ds STRING").select(
        "id", "s", F.col("ds").cast("date").alias("d")
    )
    path = str(tmp_path / "csvx")
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )
    back = (
        spark.read.schema("id BIGINT, s STRING, d DATE")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "FAILFAST")
        .csv(path)
    )
    want = {(r["id"], r["s"], r["d"]) for r in df.collect()}
    got = {(r["id"], r["s"], r["d"]) for r in back.collect()}
    # Spark's CSV writer emits empty string as empty field, which the
    # reader hands back as NULL — the documented boundary; everything
    # else must be identical.
    want = {(i, None if s == "" else s, d) for i, s, d in want}
    assert got == want


def test_csv_interchange_query_groups(spark, sf_dir):
    from sandbox_data_pipeline_spark.queries.layout import q_csv_interchange

    rows = q_csv_interchange(spark, sf_dir).collect()
    assert rows
    langs = {r["lang"] for r in rows}
    assert len(langs) == len(rows)
    for r in rows:
        assert r["n_rows"] >= 1
        assert r["tricky_chars"] > r["n_rows"] * 3  # quotes+comma rode along


def test_ingest_quarantine_salvages_and_captures(spark, sf_dir):
    """Valid lines parse fully; garbage lines land verbatim in
    _corrupt_record; nothing is dropped."""
    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.queries.layout import q_ingest_quarantine

    docs = table(spark, sf_dir, "documents")
    n_total = docs.count()
    n_bad = docs.where("doc_id % 7 = 0").count()
    rows = {r["grp"]: r for r in q_ingest_quarantine(spark, sf_dir).collect()}
    q = rows.pop("__quarantine__")
    assert q["n_rows"] == n_bad == q["n_corrupt"]
    assert q["sum_chars"] is None  # no declared field salvaged from garbage
    assert q["quarantine_chars"] is not None  # raw lines captured
    assert sum(r["n_rows"] for r in rows.values()) == n_total - n_bad
    assert all(r["n_corrupt"] == 0 for r in rows.values())
    assert all(r["quarantine_chars"] is None for r in rows.values())
