"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>}

Each query is materialized with a noop write (full execution on
executors, no driver-side row transfer) after a warm-up of the JVM +
file listing via a trivial count.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set — ROTATED per round like DRIVER_PRIORITY: round 9's
# 193-query run came back regression-free, so round 10 measures the
# ~80 registry queries never benched in ANY recorded round (union of
# BENCH_r* tails + BENCH_LOCAL), closing cumulative bench coverage —
# round 9 proved first-contact benching finds real bugs (the
# q_video_near_dup hot-band OOM). The round-9 standing exclusions
# (table/file writers, stdlib codec-stress rows) are LIFTED for this
# one round for the same reason: a writer with a hidden scale bug is
# still a bug, and each pays its cost once here. Continuity: the 10
# slowest round-9 queries re-run for the round-over-round compare,
# plus the queries changed/added this round (rholoss two-phase rank,
# coverage-greedy anti-join, the 3 fingerprint-manifest queries — the
# manifest builds once per process on first touch, so the min-of-3
# numbers for ALL THREE measure the decode-free parquet probe path;
# the decode cost itself is what q_image_dhash_dedup/q_video_near_dup
# continue to measure, which IS the layout story the twins exist to
# tell). Names must exist in queries().
HEADLINE = [
    "q_coverage_greedy",
    "q_dbscan_grid",
    "q_quality_classifier",
    "q_embedding_dup_clusters",
    "q_naive_bayes",
    "q_suffix_dedup_apply",
    "q_suffix_dedup_apply_keep_first",
    "q_anchored_dup_spans",
    "q_substring_dup_spans",
    "q_similarity_ivf_kmeans_topk",
    "q_media_fingerprint_manifest",
    "q_image_dhash_from_manifest",
    "q_video_near_dup_from_manifest",
    "q_rholoss_select",
    "q_hash_canary",
    "q_t_closeness",
    "q_group_ttest",
    "q_event_trigrams",
    "q_kaplan_meier",
    "q_column_mapping",
    "q_burstiness",
    "q_autocorrelation",
    "q_jackknife_ci",
    "q_rolling_median",
    "q_heaps_law",
    "q_update_where",
    "q_runs_test",
    "q_lakehouse_lifecycle",
    "q_brier_score",
    "q_mase_forecast_eval",
    "q_explode",
    "q_gap_fill",
    "q_orc_interchange",
    "q_ks_drift",
    "q_skyline",
    "q_l_diversity",
    "q_calibration_bins",
    "q_pii_scrub",
    "q_source_quota",
    "q_url_dedup",
    "q_cusum_changepoints",
    "q_best_split",
    "q_pr_curve",
    "q_partition_evolution",
    "q_hidden_partitioning",
    "q_bloom_index",
    "q_merge_conditional",
    "q_schema_evolution",
    "q_check_constraint",
    "q_position_delete",
    "q_table_branch",
    "q_csv_interchange",
    "q_ingest_quarantine",
    "q_sketch_ivm",
    "q_join_ivm",
    "q_jpeg_decode_stats",
    "q_video_keyframes",
    "q_gif_keyframes",
    "q_audio_onsets",
    "q_image_dhash_dedup",
    "q_video_near_dup",
    "q_embedding_gram",
    "q_time_travel",
    "q_first_seen_batch",
    "q_token_count",
    "q_dedup_exact",
    "q_txlog_ivm",
    "q_sessionize_batch",
    "q_restore",
    "q_scd2_priority",
    "q_trending_batch",
    "q_compaction_plan",
    "q_join_inner",
    "q_table_changes",
    "q_skew_report",
    "q_replace_where",
    "q_profile_drift",
    "q_benford_audit",
    "q_passage_dedup",
    "q_tpch_q13",
    "q_pack_sequences",
    "q_agg_approx",
    "q_point_in_time_features",
    "q_window_rank",
    "q_gopher_rules",
    "q_latest_per_key",
    "q_event_transitions",
    "q_subquery_in",
    "q_unigram_bits",
    "q_window_hourly",
    "q_doc_chunks",
    "q_bpe_merges",
    "q_zipf_fit",
    "q_curriculum_shards",
]


def compare_block(timings: dict[str, float], threshold: float = 1.5):
    """Round-over-round comparison vs the latest BENCH_r{N}.json, so a
    regression is separable from environment noise without re-deriving:
    same-query ratios < ``threshold`` are within the documented VM
    variance band (round-2 ran untouched round-1 queries 1.5-2x slower
    under identical code); larger ones are listed for review."""
    import glob
    import re

    benches = sorted(
        glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json"))
    )
    if not benches:
        return None
    path = benches[-1]
    try:
        with open(path, encoding="utf-8") as f:
            doc = json.load(f)
        # Merge every available source: the parsed final line carries a
        # BUDGETED per-query subset (slowest-first), while the raw tail
        # may hold extra pairs from the full first line — regex the
        # tail, then let parsed values win.
        old = {
            k: float(v)
            for k, v in re.findall(
                r'"(q_\w+|flagship)":\s?([0-9.]+)', doc.get("tail", "")
            )
        }
        if isinstance(doc.get("parsed"), dict):
            old.update(doc["parsed"].get("queries") or {})
        if "queries" in doc:
            old.update(doc["queries"])
        if not old:
            return None
    except Exception:
        return None
    shared = sorted(set(old) & set(timings))
    t_old = sum(old[k] for k in shared)
    t_new = sum(timings[k] for k in shared)
    flagged = {
        k: {"old": old[k], "new": timings[k], "ratio": round(timings[k] / old[k], 2)}
        for k in shared
        if old[k] > 0 and timings[k] / old[k] >= threshold
    }
    return {
        "baseline": re.sub(r".*/", "", path),
        "shared_queries": len(shared),
        "shared_total_old_sec": round(t_old, 3),
        "shared_total_new_sec": round(t_new, 3),
        "shared_total_ratio": round(t_new / t_old, 3) if t_old else None,
        "env_noise_threshold": threshold,
        "flagged_over_threshold": flagged,
        "note": (
            "same-query deltas under the threshold are environment noise "
            "(documented 1.5-2x VM speed variance between rounds); flagged "
            "entries need a reproduced regression before they count"
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    from sandbox_data_pipeline_spark.plans.flagship import flagship_query
    from sandbox_data_pipeline_spark.queries import registry
    from sandbox_data_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()

    # Warm-up: JVM JIT, parquet footer reads, broadcast machinery.
    flagship_query(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}

    def release_storage() -> None:
        """Unpersist every cached/localCheckpointed RDD between
        queries: iterative operators (PageRank/LPA/k-core/suffix
        array/PPR) cut lineage with localCheckpoint, whose storage
        blocks otherwise ACCUMULATE across the ~140-query run and OOM
        the shared local JVM near the end (observed at 142 queries).
        Storage is per-query scratch here, not a cross-query cache —
        and a query's timing must not depend on its position in the
        run."""
        spark.catalog.clearCache()
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)

    def run(name: str, build) -> None:
        print(f"[bench] {name}", file=sys.stderr, flush=True)
        # min of three executions: local timings swing ±15% (and worse
        # under co-tenant load); the min is the reproducible number
        # (plan cost + data), the max is the noise.
        best = None
        try:
            for _ in range(3):
                # time build() + materialize: operators with eager
                # stages (iterative clustering, centroid fitting) do
                # real work at build time, and excluding it would
                # under-report them
                t0 = time.time()
                df = build()
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001 — one bad query must
            # not sink the whole run; the error is the measurement
            errors[name] = f"{type(e).__name__}: {e}"[:200]
        release_storage()

    run("flagship", lambda: flagship_query(spark, sf_dir))
    for name in HEADLINE:
        if name in queries:
            run(name, lambda n=name: queries[n](spark, sf_dir))

    total = round(sum(timings.values()), 3)
    # Verbose record (full precision + round-over-round compare) goes
    # to a file; stdout's LAST line is the formal artifact. The driver
    # records only the LAST 2000 characters of stdout and parses the
    # final line — r04-r06 all came back "parsed": null because the
    # 98-query dict pushed the line past 2000 chars and the capture
    # cut off its FRONT. So: (1) the complete per-query line prints
    # FIRST (for humans reading the raw run), (2) the final line is
    # budgeted to ≤1900 chars — headline fields always present, then
    # as many per-query entries as fit (overflow names live in
    # BENCH_LOCAL.json, pointed to by "full").
    verbose = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        verbose["errors"] = errors
    cmp_block = compare_block(timings)
    if cmp_block is not None:
        verbose["compare"] = cmp_block
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as f:
            json.dump(verbose, f, indent=1)
    except OSError:
        pass
    full_line = {
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
    }
    print(json.dumps(full_line, separators=(",", ":")))
    # Stop Spark BEFORE the final line so no JVM/py4j shutdown output
    # can trail it on stdout.
    spark.stop()
    budget = 1900
    base = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "full": "BENCH_LOCAL.json",
        "queries": {},
    }
    line = json.dumps(base, separators=(",", ":"))
    fitted: dict[str, float] = {}
    # slowest-first: the entries that matter for a perf read survive
    for k in sorted(timings, key=lambda k: -timings[k]):
        trial = dict(fitted)
        trial[k] = round(timings[k], 2)
        cand = dict(base, queries=trial)
        s = json.dumps(cand, separators=(",", ":"))
        if len(s) > budget:
            break
        fitted = trial
        line = s
    sys.stdout.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
