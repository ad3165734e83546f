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

# Headline set — ROTATED per round like DRIVER_PRIORITY: after round
# 8's 144-query run came back regression-free, round 9 measures the
# ~149 registry queries never benched before (so a hidden slow query
# in the unbenched tail gets caught), keeping the 10 slowest round-8
# queries for round-over-round continuity (flagship always runs).
# Excluded by standing policy: table/file writers (q_time_travel,
# the txlog lifecycle rows, the interchange writers) and the
# stdlib-Python codec-stress rows (q_gif_keyframes,
# q_jpeg_decode_stats, q_video_keyframes) — correctness rows, not
# throughput probes. Names must exist in queries().
HEADLINE = [
    # continuity: round-8 top-10 slowest
    "q_suffix_dedup_apply",
    "q_anchored_dup_spans",
    "q_substring_dup_spans",
    "q_pagerank_dups",
    "q_ppr_influence",
    "q_similarity_ivf_kmeans_topk",
    "q_suffix_dedup_apply_keep_first",
    "q_suffix_dedup_spans",
    "q_simhash_quality_sweep",
    "q_dedup_clusters",
    # first-time coverage: never benched through round 8
    "q_agg_cube",
    "q_agg_distinct",
    "q_agg_maxby",
    "q_agg_rollup",
    "q_array_funcs",
    "q_date_funcs",
    "q_exists_correlated",
    "q_funnel",
    "q_histogram",
    "q_join_anti",
    "q_quality_classifier",
    "q_doremi_weights",
    "q_join_multi",
    "q_activity_heatmap",
    "q_click_attribution",
    "q_dataset_card",
    "q_domain_blocklist",
    "q_entity_matches",
    "q_ewma_smooth",
    "q_filter_cascade",
    "q_group_quantiles",
    "q_hash_split",
    "q_mixture_sample",
    "q_pack_efficiency",
    "q_pack_manifest",
    "q_repetition",
    "q_seasonal_index",
    "q_source_stats",
    "q_stratified_sample",
    "q_temperature_mixture",
    "q_timeseries_decompose",
    "q_token_quantiles",
    "q_url_canonical",
    "q_masked_export",
    # q_image_dhash_dedup / q_video_near_dup excluded: stdlib-Python
    # JPEG/MJPEG decode per doc (23s / 35s at sf0.1) — codec-stress
    # correctness rows, same policy as q_jpeg_decode_stats. Round 9
    # DID first-bench them once: the video banded join OOMed the JVM
    # until the hot-band cap landed (see q_video_near_dup docstring);
    # the residual cost is decode, not the join.
    "q_audio_near_dup",
    "q_media_resolution_filter",
    "q_entity_resolution",
    "q_winnow_fingerprints",
    "q_crosslingual_dups",
    "q_embedding_dup_clusters",
    "q_dup_triangles",
    "q_dup_degree_dist",
    "q_dup_rate_by_source",
    "q_leakage_safe_split",
    "q_passage_dup_ratio",
    "q_similarity_ivf_lists",
    "q_ann_index_drift",
    "q_pq_codes",
    "q_embedding_quantize",
    "q_embedding_centroids",
    "q_inverted_index",
    "q_ngram_freq",
    "q_lang_confusion",
    "q_weather_stage",
    "q_dq_report",
    "q_zorder_stats",
    "q_retention_cohorts",
    "q_multimodal_meta",
    "q_filter_basic",
    "q_cocktails_stage",
    "q_dq_suite",
    "q_merge_delete",
    "q_rfm_segments",
    "q_media_features",
    "q_dedup_exact_keep",
    "q_similarity_lsh_buckets",
    "q_delete_run_hr",
    "q_weather_variant_stage",
    "q_dq_freshness",
    "q_grouping_sets",
    "q_media_frames",
    "q_lang_id",
    "q_dedup_ngram_jaccard",
    "q_tpch_q03",
    "q_cocktails_variant_stage",
    "q_table_diff",
    "q_global_ids",
    "q_dq_referential",
    "q_media_resize",
    "q_fingerprint",
    "q_similarity_near_dup",
    "q_tpch_q04",
    "q_join_left",
    "q_weather_insert",
    "q_k_anonymity",
    "q_rollup_ivm",
    "q_negative_samples",
    "q_unpivot",
    "q_media_probe",
    "q_tfidf_top_terms",
    "q_similarity_near_dup_lsh",
    "q_join_semi",
    "q_weather_variant_insert",
    "q_safe_casts",
    "q_dedup_simhash",
    "q_tpch_q06",
    "q_weather_variant_native",
    "q_audio_windows",
    "q_tpch_q07",
    "q_cocktails_insert",
    "q_dedup_survivors",
    "q_tpch_q08",
    "q_cocktails_variant_insert",
    "q_bmp_resize_stats",
    "q_dedup_normalized",
    "q_join_salted",
    "q_cities_source",
    "q_semantic_search",
    "q_tpch_q10",
    "q_city_normalize",
    "q_png_resize_stats",
    "q_ann_recall",
    "q_tpch_q11",
    "q_join_range",
    "q_clean_json",
    "q_tpch_q12",
    "q_mixture_weights",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_sessionize",
    "q_tpch_q17",
    "q_rollup_cascade",
    "q_tpch_q19",
    "q_minhash_precision",
    "q_tpch_q20",
    "q_window_frame",
    "q_hard_negatives",
    "q_training_triplets",
    "q_tpch_q22",
    "q_sort_limit",
    "q_top5",
    "q_union_all",
    "q_quality_sweep",
    "q_scalar_subquery",
    "q_set_ops",
    "q_string_funcs",
    "q_json_funcs",
    "q_run_hr_derive",
    "q_bigram_bits",
    "q_nested_struct",
    "q_pivot",
    "q_window_analytics",
    "q_map_funcs",
    "q_string_agg",
    "q_regex_extract",
    "q_outliers",
    # round-9 second wave (never benched, added this round)
    "q_isotonic_calibration",
    "q_mannwhitney_u",
    "q_rholoss_select",
    "q_pca_power",
    "q_holt_smooth",
    "q_wasserstein_drift",
    "q_cuped_adjust",
    # round-9 wave-2 additions (never benched)
    "q_hill_tail",
    "q_eb_shrinkage",
    "q_ips_eval",
    "q_kneser_ney_bits",
    "q_naive_bayes",
    "q_dbscan_grid",
    "q_item_cooccurrence",
    "q_rbo_rankings",
    "q_fellegi_sunter",
    "q_holt_winters",
    "q_phrase_search",
    "q_quantile_normalize",
    "q_coverage_greedy",
    "q_diff_in_diff",
    "q_sinkhorn_ot",
    "q_shapley_attribution",
    "q_sprt_ab",
    "q_map_mrr_eval",
    "q_kruskal_wallis",
    "q_cramers_v",
    "q_wordpiece_encode",
    "q_regression_discontinuity",
    "q_covariate_balance",
    "q_mutual_information",
    "q_hodges_lehmann",
    "q_sequence_mining",
    "q_power_analysis",
    "q_srm_check",
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
