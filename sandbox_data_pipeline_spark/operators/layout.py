"""Data-layout operators: Z-order clustering, min-max data skipping,
and small-file compaction planning.

At 100 TB the dominant cost is the scan, and the dominant scan lever
is what you DON'T read. These operators make layout a first-class,
measurable artifact:

- ``zvalue`` interleaves the bits of two quantized key columns into a
  single Morton (Z-order) key. Sorting/range-partitioning the table by
  that key clusters BOTH dimensions at once, so per-file min-max
  statistics prune scans for predicates on either column — the same
  trick Delta Lake's ``OPTIMIZE ZORDER BY`` and Hudi's space-filling
  curves use. Everything is integer expression arithmetic inside
  whole-stage codegen: zero shuffle, zero Python.
- ``skipping_stats`` computes the per-bucket min-max footprint a file
  pruner would consult, and ``skipping_report`` scores a layout
  against a predicate range: how many buckets (files) could be
  skipped outright. Comparing the natural layout against the Z-order
  layout turns "Z-ordering helps" into a measured row.
- ``compaction_plan`` bins a FILE LIST (metadata-scale, not
  data-scale) into merge groups by cumulative size, the planning half
  of a small-file compaction job. The window frame runs over the file
  manifest — thousands of rows at 100 TB — never over the data.

The quantization and bit-interleave are emitted as SQL text via a
tiny dialect shim so the Spark plan and the DuckDB oracle run
CHARACTER-IDENTICAL arithmetic (only the bit-op spelling differs).

Relationship to ``sinks/writers.py:write_zordered``: that is the
PHYSICAL write path — quantile-rank quantization (skew-proof: a heavy
value spreads over many rank buckets) feeding the same Morton
interleave, then range-partition + sort + write, with the layout
proven skippable from parquet FOOTER stats in tests/test_layout.py.
This module is the ANALYTIC side: value-range quantization (exact
integer arithmetic, so DuckDB can replay it bit-for-bit) feeding
oracle-verified skipping-effectiveness measurements. Production uses
the writer; the oracle rows prove the curve's pruning math.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Dialect:
    """Bit-op spellings that differ between Spark SQL and DuckDB."""

    name: str

    def shr(self, x: str, i: int) -> str:
        if self.name == "spark":
            return f"shiftright({x}, {i})"
        return f"(({x}) >> {i})"

    def shl(self, x: str, i: int) -> str:
        if self.name == "spark":
            return f"shiftleft({x}, {i})"
        return f"(({x}) << {i})"

    def intdiv(self, a: str, b: str) -> str:
        if self.name == "spark":
            return f"(({a}) div ({b}))"
        return f"(({a}) // ({b}))"


SPARK = Dialect("spark")
DUCK = Dialect("duck")


def quantize_sql(col: str, lo: str, hi: str, bits: int, d: Dialect) -> str:
    """Map ``col`` in [lo, hi] to an integer bucket in [0, 2**bits).

    Pure integer arithmetic — ``(col - lo) * 2**bits // (hi - lo + 1)``
    — so both engines compute bit-identical buckets (no float rounding
    at bucket edges). Inputs must be integer-typed and lo <= col <= hi.
    """
    return d.intdiv(f"(({col}) - ({lo})) * {1 << bits}", f"({hi}) - ({lo}) + 1")


def interleave_sql(qa: str, qb: str, bits: int, d: Dialect) -> str:
    """Morton interleave: bit i of ``qa`` lands at position 2i, bit i
    of ``qb`` at 2i+1. ``2*bits`` total output bits; expands to a flat
    sum of masked shifts that whole-stage codegen fuses into straight
    integer ops."""
    terms = []
    for i in range(bits):
        terms.append(d.shl(f"({d.shr(qa, i)} & 1)", 2 * i))
        terms.append(d.shl(f"({d.shr(qb, i)} & 1)", 2 * i + 1))
    return "(" + " + ".join(terms) + ")"


def zvalue(
    df: DataFrame,
    a: str,
    b: str,
    bits: int = 8,
    out: str = "zval",
) -> DataFrame:
    """Attach a Z-order key interleaving quantized ``a`` and ``b``.

    The quantization bounds come from a one-row min-max aggregate
    broadcast back onto the scan (a 1-row crossJoin — the standard
    scalar-subquery shape; at 100 TB the bounds come from table stats
    instead and the plan is identical minus the tiny agg). Layout use:
    ``df.repartitionByRange(N, 'zval').sortWithinPartitions('zval')``
    then write — per-file min-max stats on BOTH a and b become tight.
    """
    bounds = df.agg(
        F.min(a).alias("_a_lo"),
        F.max(a).alias("_a_hi"),
        F.min(b).alias("_b_lo"),
        F.max(b).alias("_b_hi"),
    )
    qa = quantize_sql(a, "_a_lo", "_a_hi", bits, SPARK)
    qb = quantize_sql(b, "_b_lo", "_b_hi", bits, SPARK)
    z = interleave_sql(f"({qa})", f"({qb})", bits, SPARK)
    return df.crossJoin(F.broadcast(bounds)).withColumn(out, F.expr(z)).drop(
        "_a_lo", "_a_hi", "_b_lo", "_b_hi"
    )


def skipping_stats(
    df: DataFrame,
    bucket_col: str,
    value_col: str,
    lo_col: str = "_lo",
    hi_col: str = "_hi",
) -> DataFrame:
    """Per-bucket (≈ per-file) min-max footprint of ``value_col`` — the
    stats a pruner consults before deciding to open the file. One
    partial-aggregated shuffle on the bucket id. The predicate bounds
    ride along as row-constant columns (``any_value``), so no driver
    collect is needed to score the layout afterwards."""
    return df.groupBy(bucket_col).agg(
        F.count("*").alias("bucket_rows"),
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
        F.any_value(lo_col).alias("_lo"),
        F.any_value(hi_col).alias("_hi"),
    )


def skipping_report(
    stats: DataFrame,
    layout: str,
) -> DataFrame:
    """Score a layout against the predicate ``value BETWEEN _lo AND
    _hi`` (bound columns carried by ``skipping_stats``): a bucket whose
    [v_min, v_max] misses the range entirely is never read. Emits one
    row: (layout, buckets_total, buckets_skipped, rows_skipped)."""
    skippable = (F.col("v_max") < F.col("_lo")) | (F.col("v_min") > F.col("_hi"))
    return stats.agg(
        F.lit(layout).alias("layout"),
        F.count("*").alias("buckets_total"),
        F.sum(skippable.cast("long")).alias("buckets_skipped"),
        F.sum(F.when(skippable, F.col("bucket_rows")).otherwise(0)).alias(
            "rows_skipped"
        ),
    )


def compaction_plan(
    files: DataFrame,
    size_col: str,
    order_col: str,
    target: int,
) -> DataFrame:
    """Assign files to merge groups by cumulative size: group k holds
    the files whose preceding cumulative size lands in
    [k*target, (k+1)*target). Deterministic first-fit — the standard
    bin-edge rule, so a file straddling an edge starts a new group's
    overshoot rather than splitting. A single file >= 2x target skips
    raw bin indices, so groups are densely renumbered at the end —
    group ids are always contiguous from 0 (the invariant the tests
    and PARITY claim).

    Both single-partition window frames run over the FILE MANIFEST
    (metadata scale: one row per file/partition, then one per group),
    never the data; at 100 TB a manifest is 10^4-10^6 rows and this
    stays a driver-light one-task stage.
    """
    w = (
        Window.orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    grouped = (
        files.withColumn("_cum_before", cum)
        .withColumn(
            "_bin", F.floor(F.col("_cum_before") / F.lit(target)).cast("long")
        )
        .groupBy("_bin")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(size_col).alias("total_rows"),
            F.min(order_col).alias("first_file"),
            F.max(order_col).alias("last_file"),
        )
    )
    dense = (F.dense_rank().over(Window.orderBy("_bin")) - 1).cast("long")
    return grouped.withColumn("group_id", dense).drop("_bin").select(
        "group_id", "n_files", "total_rows", "first_file", "last_file"
    )
