"""Distributed bloom-filter prefilter for semi joins.

The 100 TB problem this solves: a semi join whose filter side is too
large to broadcast as an exact hash relation (tens of millions of
keys) forces a full shuffle of the probe side. A bloom filter of the
key set is a few MB regardless of key count, broadcasts everywhere,
and eliminates the vast majority of non-matching probe rows BEFORE the
shuffle — the exact join that follows only pays for rows that might
match (false-positive rate ``~fpp``, no false negatives).

Spark's own Catalyst runtime bloom filter (see
``spark.sql.optimizer.runtime.bloomFilter.enabled`` in
``session.SCALE_CONFS``) does this automatically when a selective
filter sits on the build side; this operator is the explicit,
composable form for when the planner can't see the selectivity —
a key set produced by an arbitrary upstream pipeline stage.

Everything here is declarative DataFrame code — the build is one
shuffle of ``num_hashes`` bit positions per key, bit_or-combined
map-side; the probe is a broadcast of ONE row holding the packed long
words, tested with codegen'd shift/AND expressions. No UDF, no
driver-side bitset.

Reference parity: the reference (Qbizinc/sandbox-data-pipeline)
delegates all joins to its warehouses; this corresponds to the
warehouse-internal runtime-filter optimizations its queries rely on
(e.g. BigQuery semi-join pushdown), surfaced as an engine operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_probe", "bloom_semi_join"]


def _position(key: Column, salt: int, num_bits: int) -> Column:
    """Bit position for one probe: xxhash64(key, salt) mod num_bits.
    The integer salt participates in the hash, so probes are
    independent."""
    return F.pmod(F.xxhash64(key, F.lit(salt)), F.lit(num_bits))


def bloom_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Build a bloom filter of ``keys[key_col]`` as a 1-row DataFrame
    with column ``bf_words: array<bigint>`` (dense bit words, word w
    holds bits [64w, 64w+63]).

    The aggregation is two-phase: per-partition bit_or partials mean
    at most num_bits/64 x |partitions| rows cross the shuffle,
    bounded regardless of key count. 2^23 bits = 1 MiB, good for ~1M
    keys at fpp ~3% with 5 hashes; scale num_bits linearly with the
    key count (2^30 bits = 128 MiB still broadcasts).
    """
    assert num_bits % 64 == 0, "num_bits must pack into 64-bit words"
    n_words = num_bits // 64
    pos = F.explode(
        F.array(
            *[_position(F.col(key_col), i, num_bits) for i in range(num_hashes)]
        )
    )
    words = (
        keys.select(pos.alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, int(pos % 64))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
    )
    # densify: union a zero row per word (so every index exists), then
    # sort-and-project. NOT a map lookup per index — Spark MapType
    # element_at is a linear scan, which would make this O(n_words^2).
    zero_fill = keys.sparkSession.range(n_words).select(
        F.col("id").cast("int").alias("w"), F.lit(0).cast("bigint").alias("bits")
    )
    dense = (
        words.unionByName(zero_fill)
        .groupBy("w")
        .agg(F.bit_or("bits").alias("bits"))
    )
    return dense.agg(
        F.array_sort(F.collect_list(F.struct("w", "bits"))).alias("a")
    ).select(F.transform("a", lambda x: x["bits"]).alias("bf_words"))


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Keep rows of ``df`` whose ``key_col`` might be in the filter
    (no false negatives; false positives at the filter's fpp).

    The bloom row is crossJoin-broadcast (1 row); each hash probe is a
    pure column expression (element_at + shift/AND) inside whole-stage
    codegen. num_bits/num_hashes MUST match the build call.
    """
    tests = []
    for i in range(num_hashes):
        p = f"pmod(xxhash64({key_col}, {i}), {num_bits})"
        tests.append(
            f"(element_at(bf_words, int({p} / 64) + 1)"
            f" & shiftleft(1L, int({p} % 64))) != 0"
        )
    return (
        df.crossJoin(F.broadcast(bloom))
        .where(F.expr(" AND ".join(tests)))
        .drop("bf_words")
    )


def bloom_semi_join(
    large: DataFrame,
    keys: DataFrame,
    on: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Exact semi join accelerated by a bloom prefilter.

    Result EQUALS ``large.join(keys, on, "left_semi")`` — the bloom
    pass has no false negatives, and the exact semi join afterwards
    removes its false positives. What changes is cost: the shuffle for
    the exact join only carries rows that survived the broadcast bit
    test, so at 100 TB the probe-side shuffle shrinks by roughly the
    non-match fraction.
    """
    bloom = bloom_build(keys.select(on), on, num_bits, num_hashes)
    prefiltered = bloom_probe(large, bloom, on, num_bits, num_hashes)
    return prefiltered.join(keys.select(on).distinct(), on, "left_semi")
