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
