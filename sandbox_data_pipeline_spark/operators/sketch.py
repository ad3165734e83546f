"""Count-min sketch: fixed-size frequency summaries for heavy-hitter
estimation over unbounded key spaces.

The sketch is a (depth × width) grid of counters; each key increments
one counter per row, chosen by an independent hash. Point estimates
take the MIN over the key's depth cells — always an overestimate,
with error bounded by (e/width)·N at probability 1 − (1/e)^depth.

Scale design: building the sketch is ONE groupBy over (seed, bucket)
whose key space is depth·width cells — constant, independent of both
corpus size and cardinality — so the shuffle reduces to a few hundred
rows no matter how many tokens stream through; map-side partial
aggregation does nearly all the work. The hash is the portable 60-bit
md5 (operators/dedup.py: portable_hash) so DuckDB can replay the
identical sketch for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.operators.dedup import portable_hash

CMS_DEPTH = 4
CMS_WIDTH = 64


def _bucket(col: Column, seed: int, width: int) -> Column:
    return F.pmod(portable_hash(col, salt=f"cms{seed}"), F.lit(width))


def _cells(key_col: str, depth: int, width: int) -> Column:
    """The (seed, bucket) cell list for one key — the ONE definition
    both build and estimate share, so the hashing can never drift
    between them."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("seed"),
                    _bucket(F.col(key_col), d, width).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    )


def cms_build(
    items: DataFrame,
    key_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch cells: (seed, bucket, c) — ≤ depth·width rows
    (cells no key hashed into are absent and mean count 0)."""
    cells = items.select(_cells(key_col, depth, width).alias("sb"))
    return (
        cells.select(F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate candidate keys against a sketch: min over the
    key's depth cells, where an absent cell counts as 0 — so a key
    the build stream never saw estimates cms_n = 0 (unless every one
    of its cells collides), and no candidate row is ever dropped.
    The sketch is ≤ depth·width rows → broadcast; the probe is a
    map-side join however many candidates stream in."""
    probes = candidates.select(
        "*", _cells(key_col, depth, width).alias("sb")
    ).select(
        *candidates.columns,
        F.col("sb.seed").alias("seed"),
        F.col("sb.bucket").alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy(*candidates.columns)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_n"))
    )


# --- KMV (k-minimum-values) distinct sketch ---------------------------------
#
# The theta-sketch family member whose every operation is integer
# arithmetic on portable hashes — so unlike HLL (whose register layout
# is engine-internal), a KMV estimate is EXACTLY replayable in SQL and
# earns a full oracle row. Mergeable by construction: union = the k
# smallest of the concatenation, which is how a 100 TB scan combines
# per-partition sketches (partial TakeOrdered per partition, one tiny
# final merge — the same two-phase shape Spark's TakeOrdered plans).

KMV_K = 256
KMV_MAX = (1 << 60) - 1  # portable_hash emits 60-bit non-negatives


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Per-group KMV sketch: the k smallest distinct 60-bit hashes of
    ``value_col``. Returns (group, kth_value, n_kept) — enough for the
    estimator and for pairwise intersections."""
    from pyspark.sql import Window

    from sandbox_data_pipeline_spark.operators.dedup import portable_hash

    hashed = df.select(
        F.col(group_col).alias("grp"),
        portable_hash(F.col(value_col).cast("string"), salt="kmv").alias("hv"),
    ).distinct()
    w = Window.partitionBy("grp").orderBy("hv")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy("grp")
        .agg(
            F.max("hv").alias("kth_value"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )


def kmv_estimate_col(n_kept: Column, kth_value: Column) -> Column:
    """Distinct-count estimate: exact count when the set is smaller
    than k (kth_value is just the max then), else (k-1) / normalized
    kth minimum — the classic KMV estimator.

    Pure integer arithmetic: round_half_up((k-1)·MAX / kth) computed as
    (2·N + kth) div (2·kth) on decimal(38,0) — engine round(double)
    differs between repr-based and binary-based builds, so no double
    may touch the estimate. DuckDB twin: kmv_estimate_sql."""
    full = n_kept >= F.lit(KMV_K)
    n2 = str(2 * (KMV_K - 1) * KMV_MAX)
    num = (F.lit(n2).cast("decimal(38,0)") + kth_value).cast("decimal(38,0)")
    den = (F.lit(2) * kth_value).cast("decimal(38,0)")
    q = ((num - num % den) / den).cast("long")
    return F.when(full, q).otherwise(n_kept.cast("long"))


def kmv_estimate_sql(n_kept: str, kth: str) -> str:
    """DuckDB twin of kmv_estimate_col (HUGEINT // truncation)."""
    n2 = 2 * (KMV_K - 1) * KMV_MAX
    return (
        f"CASE WHEN ({n_kept}) >= {KMV_K} "
        f"THEN CAST(({n2} + ({kth})) // (2 * ({kth})) AS BIGINT) "
        f"ELSE CAST(({n_kept}) AS BIGINT) END"
    )


# --- DD-style mergeable quantile sketch (base-2 log buckets) ------------------
#
# Completes the sketch family's third leg (KMV = distinct counts,
# CMS = heavy hitters, DD = quantiles). Same shape as DDSketch
# (Masson, Rim & Lee, VLDB 2019) but with base-2 octaves and LINEAR
# sub-buckets computed in pure integer arithmetic: for value v >= 1,
#   e   = bit length of v           (octave; length(bin(v)) both engines)
#   p   = 2^(e-1)                   (octave lower bound)
#   s   = ((v - p) * SUB) div p     (linear sub-bucket, 0..SUB-1)
# The bucket's lower bound p + (s*p div SUB) under-estimates its
# members by at most p/SUB, so any quantile estimate is within 1/SUB
# (6.25% at SUB=16) relative error — with NO floats anywhere, which is
# what makes the whole sketch (and estimator) bit-identically
# replayable by the DuckDB oracle.
#
# Scale design: the sketch IS a groupBy over (group, e, s) — at most
# SUB * 63 cells per group regardless of row count, so map-side
# partial aggregation collapses 100 TB of rows into a few hundred
# counters per group before any shuffle; merging shards = adding
# counters (the same associative agg). Quantile extraction runs on
# the tiny bucket table: a per-group cumulative-sum window over
# <= ~400 rows.

DD_SUB = 16


def dd_sketch(df: DataFrame, group_col: str, cents_col: str) -> DataFrame:
    """Per-group quantile sketch over positive integer ``cents_col``:
    one row per occupied (octave, sub-bucket) with its count and exact
    integer lower bound."""
    b = (
        df.select(F.col(group_col).alias("grp"), F.col(cents_col).alias("v"))
        .where(F.col("v") >= 1)
        .selectExpr("grp", "v", "CAST(length(bin(v)) AS INT) AS e")
        .selectExpr(
            "grp",
            "e",
            "shiftleft(CAST(1 AS BIGINT), e - 1) AS p",
            "v",
        )
        .selectExpr("grp", "e", "p", f"CAST(((v - p) * {DD_SUB}) DIV p AS INT) AS s")
    )
    return (
        b.groupBy("grp", "e", "s")
        .agg(F.count(F.lit(1)).alias("cnt"), F.first("p").alias("p"))
        .selectExpr("grp", "e", "s", "cnt", f"p + (s * p) DIV {DD_SUB} AS lb")
    )


def dd_quantiles(sketch: DataFrame, qs: list[tuple[int, int]]) -> DataFrame:
    """Extract quantiles from a dd_sketch: for q = qn/qd the estimate
    is the lower bound of the first bucket whose cumulative count
    reaches rank ceil(q*n) — all integer, so both engines agree on
    every tie. Output: grp, n_rows, n_buckets, q_<qn>_<qd> columns."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("grp")
        .orderBy("e", "s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sketch.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("grp"))
    )
    aggs = [
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_buckets"),
    ]
    for qn, qd in qs:
        rank = F.expr(f"(n * {qn} + {qd} - 1) DIV {qd}")
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col("lb"))).alias(
                f"q_{qn}_{qd}"
            )
        )
    return cum.groupBy("grp").agg(*aggs)


def dd_sketch_sql(table_expr: str, group_col: str, cents_expr: str) -> str:
    """DuckDB twin of dd_sketch — structurally identical bucket math."""
    return f"""
SELECT grp, e, s, COUNT(*) AS cnt, ANY_VALUE(p) + (s * ANY_VALUE(p)) // {DD_SUB} AS lb
FROM (
  SELECT grp, e, p, ((v - p) * {DD_SUB}) // p AS s
  FROM (
    SELECT grp, v, e, (1::BIGINT << (e - 1)) AS p
    FROM (
      SELECT {group_col} AS grp, {cents_expr} AS v,
             CAST(length(bin({cents_expr})) AS INT) AS e
      FROM {table_expr} WHERE {cents_expr} >= 1
    )
  )
)
GROUP BY grp, e, s
"""
