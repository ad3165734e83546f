"""Skewed-duplicate stress: the corpus every real training-data crawl
looks like — a shared boilerplate prefix on EVERY document and one fat
near-dup cluster — must not blow up candidate generation.

The assertions here are fan-out bounds, not timings: the number of
join rows each guard admits is the quantity that scales (or explodes)
at 100 TB, and it is deterministic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.operators.dedup import (
    minhash_bands,
    minhash_candidate_pairs,
    minhash_signatures,
    word_shingles,
)

N_DOCS = 1000
CLUSTER = 100  # 10% of docs in ONE near-dup cluster
BOILER = "shared boilerplate header for corpus docs"  # on every doc


def _corpus(spark):
    rows = []
    for i in range(N_DOCS):
        if i < CLUSTER:
            # three near-identical variants -> one connected cluster
            rows.append((i, f"{BOILER} alpha beta gamma delta epsilon zeta eta v{i % 3}"))
        else:
            rows.append((i, f"{BOILER} w{i} x{i} y{i} z{i} q{i} r{i} s{i} t{i}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_df_cap_bounds_shingle_join_fanout(spark):
    """The shingle self-join's cost is sum(df^2) over shingles. The
    boilerplate prefix puts several shingles on all 1000 docs; df_cap
    must cut the fan-out to the near-dup cluster's own mass."""
    docs = _corpus(spark)

    def fanout(df_cap):
        sh = word_shingles(docs, n=3, df_cap=df_cap)
        return (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("pairs"))
            .first()["pairs"]
        )

    unguarded = fanout(None)
    guarded = fanout(200)
    # boilerplate shingles alone contribute ~6 * C(1000,2) ~ 3M rows
    assert unguarded > 2_000_000
    # guarded: only intra-cluster shingles survive (df <= ~100);
    # measured 36k vs 2.03M unguarded (1.8%)
    assert guarded < 0.02 * unguarded
    # and the guard's bound holds exactly: no surviving shingle above cap
    max_df = (
        word_shingles(docs, n=3, df_cap=200)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df"))
        .first()[0]
    )
    assert max_df <= 200


def test_band_join_fanout_bounded_by_duplicate_density(spark):
    """MinHash banding under boilerplate skew: candidate pairs must be
    dominated by the true cluster (~bands * C(100,2)), nowhere near the
    C(1000,2) all-pairs a naive similarity join would do."""
    docs = _corpus(spark)
    bands = minhash_bands(minhash_signatures(docs, k=16, n=3), k=16, bands=4)
    fanout = (
        bands.groupBy("band_idx", "band_sig")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"))
        .first()["pairs"]
    )
    all_pairs = N_DOCS * (N_DOCS - 1) / 2  # 499_500
    cluster_mass = 4 * CLUSTER * (CLUSTER - 1) / 2  # 19_800
    assert fanout < 3 * cluster_mass  # bounded by duplicate density
    assert fanout < 0.15 * all_pairs

    # end-to-end: the verified pairs are dominated by the planted
    # cluster (a few boilerplate pairs can clear the estimate threshold
    # by minhash sampling noise — that is LSH semantics, not a guard
    # failure; the exact-jaccard tier filters them)
    pairs = minhash_candidate_pairs(docs, k=16, bands=4, n=3, threshold=0.5)
    hits = pairs.select("doc_a", "doc_b").collect()
    assert len(hits) > 0
    in_cluster = sum(1 for r in hits if r.doc_a < CLUSTER and r.doc_b < CLUSTER)
    assert in_cluster / len(hits) > 0.9
