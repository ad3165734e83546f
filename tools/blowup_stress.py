"""10x blow-up stress for the hot-bucket caps (round-11 verdict item).

The three quadratic-blowup guards — IMAGE_BAND_CAP / VIDEO_BAND_CAP
(queries/multimodal.py) and the shingle ``df_cap``
(operators/dedup.py: word_shingles) — were sized from sf0.1
measurements. This tool PROVES them at 10x instead of arguing them:

1. Builds a 10x synthetic blow-up of sf0.1 under /tmp: documents and
   embeddings replicated with id offsets (texts unchanged, so hot
   shingles get exactly 10x hotter — the adversarial direction; media
   payloads derive from doc_id, so new ids extend the closed-form
   corpus naturally). Other tables are symlinked from the source SF.
2. Runs the three capped paths end-to-end (real decode, real joins)
   and measures, for each: wall seconds, PRE-cap max bucket occupancy
   (how hot the hottest band/shingle actually got), buckets dropped by
   the cap, POST-cap max occupancy (must be <= CAP), and the max
   per-bucket candidate-pair count (must be <= CAP*(CAP-1)/2).
3. Runs tools/skew_stress.py's salted/AQE join matrix against the
   blown-up dir for the join-layer evidence.

Prints one JSON line; paste the numbers into SCALE.md's
measured-evidence table.

Usage: python tools/blowup_stress.py [--factor 10] [--src /root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

FACTOR = 10


def build_blowup(spark, src: str, factor: int) -> str:
    out = f"/tmp/blowup{factor}x"
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for tbl, idc in (("documents", "doc_id"), ("embeddings", "vec_id")):
        df = spark.read.parquet(os.path.join(src, f"{tbl}.parquet"))
        mx = df.agg(F.max(idc)).first()[0] + 1
        reps = spark.range(factor).select(F.col("id").alias("_rep"))
        blown = df.crossJoin(F.broadcast(reps)).select(
            (F.col(idc) + F.col("_rep") * F.lit(mx)).alias(idc),
            *[c for c in df.columns if c != idc],
        )
        blown.write.mode("overwrite").parquet(os.path.join(out, f"{tbl}.parquet"))
    for f in os.listdir(src):
        dst = os.path.join(out, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(src, f), dst)
    return out


def _band_stats(bands, cap: int, keys: list[str]) -> dict:
    """Occupancy stats for a (band_idx, band_val[, ...]) frame: pre-cap
    max bucket, dropped buckets, post-cap max, max pair count."""
    occ = bands.groupBy(*keys).agg(F.count(F.lit(1)).alias("c"))
    row = occ.agg(
        F.max("c").alias("max_pre"),
        F.sum(F.when(F.col("c") > cap, 1).otherwise(0)).alias("dropped"),
        F.max(F.when(F.col("c") <= cap, F.col("c"))).alias("max_post"),
    ).first()
    max_post = int(row["max_post"] or 0)
    return {
        "cap": cap,
        "max_bucket_pre_cap": int(row["max_pre"]),
        "buckets_dropped": int(row["dropped"]),
        "max_bucket_post_cap": max_post,
        "max_pairs_per_bucket": max_post * (max_post - 1) // 2,
        "pair_bound_cap2_over_2": cap * (cap - 1) // 2,
        "post_cap_within_bound": max_post <= cap,
    }


def image_stress(spark, sf_dir: str) -> dict:
    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.operators.jpeg import jpeg_dhash, jpeg_media
    from sandbox_data_pipeline_spark.queries.multimodal import (
        IMAGE_BAND_CAP,
        q_image_dhash_dedup,
    )

    t0 = time.time()
    n_rows = q_image_dhash_dedup(spark, sf_dir).count()
    wall = time.time() - t0
    hashes = jpeg_dhash(jpeg_media(table(spark, sf_dir, "documents")))
    bands = hashes.selectExpr(
        "media_id",
        "stack(4, 0, h1 >> 16, 1, h1 & 65535, 2, h2 >> 16, 3, h2 & 65535)"
        " AS (band_idx, band_val)",
    )
    out = _band_stats(bands, IMAGE_BAND_CAP, ["band_idx", "band_val"])
    out.update({"query_sec": round(wall, 2), "result_rows": n_rows})
    return out


def video_stress(spark, sf_dir: str) -> dict:
    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.operators.video import (
        avi_media,
        video_frame_dhash,
    )
    from sandbox_data_pipeline_spark.queries.multimodal import (
        VIDEO_BAND_CAP,
        q_video_near_dup,
    )

    t0 = time.time()
    n_rows = q_video_near_dup(spark, sf_dir).count()
    wall = time.time() - t0
    hashes = video_frame_dhash(avi_media(table(spark, sf_dir, "documents")))
    bands = hashes.selectExpr(
        "media_id",
        "frame_idx",
        "stack(4, 0, h1 >> 16, 1, h1 & 65535, 2, h2 >> 16, 3, h2 & 65535)"
        " AS (band_idx, band_val)",
    )
    out = _band_stats(bands, VIDEO_BAND_CAP, ["band_idx", "band_val"])
    out.update({"query_sec": round(wall, 2), "result_rows": n_rows})
    return out


def shingle_stress(spark, sf_dir: str) -> dict:
    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.operators.dedup import word_shingles
    from sandbox_data_pipeline_spark.queries.dedup import (
        JACCARD_DF_CAP,
        JACCARD_N,
        q_dedup_ngram_jaccard,
    )

    t0 = time.time()
    n_rows = q_dedup_ngram_jaccard(spark, sf_dir).count()
    wall = time.time() - t0
    raw = word_shingles(table(spark, sf_dir, "documents"), n=JACCARD_N)
    occ = raw.groupBy("shingle").agg(F.count(F.lit(1)).alias("c"))
    row = occ.agg(
        F.max("c").alias("max_pre"),
        F.sum(F.when(F.col("c") > JACCARD_DF_CAP, 1).otherwise(0)).alias(
            "dropped"
        ),
        F.max(F.when(F.col("c") <= JACCARD_DF_CAP, F.col("c"))).alias(
            "max_post"
        ),
    ).first()
    max_post = int(row["max_post"] or 0)
    return {
        "cap": JACCARD_DF_CAP,
        "max_shingle_df_pre_cap": int(row["max_pre"]),
        "shingles_dropped": int(row["dropped"]),
        "max_shingle_df_post_cap": max_post,
        "max_join_rows_per_shingle": max_post * max_post,
        "bound_cap_squared": JACCARD_DF_CAP * JACCARD_DF_CAP,
        "post_cap_within_bound": max_post <= JACCARD_DF_CAP,
        "query_sec": round(wall, 2),
        "result_rows": n_rows,
    }


def main() -> None:
    factor = FACTOR
    src = "/root/testdata/sf0.1"
    args = sys.argv[1:]
    if "--factor" in args:
        factor = int(args[args.index("--factor") + 1])
    if "--src" in args:
        src = args[args.index("--src") + 1]

    from sandbox_data_pipeline_spark.session import get_spark

    # Model a production executor's heap (8g), not Spark's 1g local
    # default: the stress asks "do the caps bound the quadratic paths
    # on a sanely-sized executor at 10x", not "does 10x the corpus fit
    # in 1 GB". The first run under the 1g default was itself useful —
    # it exposed the unbounded media Arrow batches (fixed: builders
    # chunk + maxRecordsPerBatch=512) before OOMing in the legitimately
    # 100x-bigger duplicated-corpus shingle join.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark("blowup-stress")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    bdir = build_blowup(spark, src, factor)
    result = {
        "factor": factor,
        "src": src,
        "blowup_dir": bdir,
        "build_sec": round(time.time() - t0, 2),
    }
    print(f"[blowup] built {bdir}", file=sys.stderr, flush=True)
    for name, fn in (
        ("image_band_cap", image_stress),
        ("video_band_cap", video_stress),
        ("shingle_df_cap", shingle_stress),
    ):
        print(f"[blowup] {name}", file=sys.stderr, flush=True)
        result[name] = fn(spark, bdir)
    print(json.dumps(result, separators=(",", ":")))
    shutil.rmtree(bdir, ignore_errors=True)


if __name__ == "__main__":
    main()
