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

# Headline set: one per operator family. Names must exist in queries().
HEADLINE = [
    "q_agg_basic",
    "q_join_broadcast",
    "q_join_inner",
    "q_join_asof",
    "q_window_rank",
    "q_latest_per_key",
    "q_explode",
    "q_window_hourly",
    "q_gap_fill",
    "q_winsorize",
    "q_subquery_in",
    "q_tpch_q01",
    "q_tpch_q02",
    "q_tpch_q05",
    "q_tpch_q09",
    "q_tpch_q13",
    "q_tpch_q18",
    "q_tpch_q21",
    "q_merge_upsert",
    "q_scd2_priority",
    "q_bloom_prefilter",
    "q_mad_anomalies",
    "q_dedup_exact",
    "q_dedup_clusters",
    "q_passage_dedup",
    "q_incremental_dedup",
    "q_dedup_minhash_pairs",
    "q_dedup_simhash_pairs",
    "q_similarity_topk",
    "q_similarity_lsh_topk",
    "q_similarity_ivf_topk",
    "q_knn_join",
    "q_text_quality",
    "q_gopher_rules",
    "q_token_count",
    "q_pii_scrub",
    "q_decontam",
    "q_pack_sequences",
    "q_semdedup",
    "q_pq_adc_topk",
    "q_containment_pairs",
    "q_url_dedup",
    "q_source_quota",
    "q_budget_select",
    "q_weighted_sample",
    "q_ann_index",
    "q_skew_report",
    "q_profile_orders",
    "q_join_cardinality_audit",
    "q_curation_pipeline",
    "q_first_seen_batch",
    "q_trending_batch",
    "q_sessionize_batch",
    "q_substring_dup_spans",
    "q_zorder_skipping",
    "q_compaction_plan",
    "q_unigram_bits",
    "q_allpairs_jaccard",
    "q_doc_chunks",
    "q_pmi_pairs",
    "q_cms_heavy_hitters",
    "q_pagerank_dups",
    "q_event_funnel",
    "q_rag_index_pipeline",
    "q_source_drift_kl",
    "q_bpe_merges",
    "q_mmr_rerank",
    "q_histogram_equidepth",
    "q_hits_dups",
    "q_clustering_coeff",
    "q_bmp_decode_stats",
    "q_zipf_fit",
    # round-4 additions (q_time_travel excluded: it writes a table per
    # run — correctness row, not a throughput probe)
    "q_curriculum_shards",
    "q_point_in_time_features",
    "q_profile_drift",
    "q_benford_audit",
    "q_gini_concentration",
    "q_psi_drift",
    "q_event_transitions",
    "q_png_decode_stats",
    "q_gif_decode_stats",
    "q_kmv_distinct",
    "q_simhash_quality_sweep",
    # round-5 additions: replayable sketches + exact-integer k-means IVF
    "q_agg_approx",
    "q_hll_rollup",
    "q_similarity_ivf_kmeans_topk",
    "q_anchored_dup_spans",
    "q_kmv_jaccard",
    # round-6 addition: grammian tree-aggregation (distributed PCA half)
    "q_embedding_gram",
    "q_bpe_encode",
    "q_bm25_topk",
    "q_fuzzy_match",
    "q_numeric_corr",
    "q_hybrid_rrf",
    "q_linear_fit",
    "q_audio_onsets",
    # q_gif_keyframes excluded: it LZW-encodes AND decodes 2-4 full
    # frames per doc in stdlib Python by design (codec-stress
    # correctness row, ~5.5 s at sf0.1 — not a throughput probe);
    # q_schema_evolution / q_check_constraint excluded: they write a
    # table per run, like q_time_travel
    # round-6 session-3 additions (q_jpeg_decode_stats /
    # q_video_keyframes excluded: codec-stress rows, same policy as
    # q_gif_keyframes; q_csv_interchange / q_ingest_quarantine /
    # q_partition_evolution excluded: they write landing files or a
    # table per run, same policy as q_time_travel)
    "q_dd_quantiles",
    # round-7 additions: suffix-array dedup + graph/drift/curation ops
    # (q_orc_interchange excluded: writes interchange files per run,
    # same policy as q_csv_interchange)
    "q_suffix_repeats",
    "q_suffix_dedup_spans",
    "q_suffix_dedup_apply",
    "q_lpa_communities",
    "q_graph_bfs",
    "q_ks_drift",
    "q_skyline",
    "q_l_diversity",
    "q_auc_score",
    "q_calibration_bins",
    # round-7 second wave: monitoring, basket mining, feature eng
    "q_cusum_changepoints",
    "q_association_rules",
    "q_target_encode",
    "q_best_split",
    "q_pr_curve",
    "q_chi2_terms",
    "q_kcore_peel",
    "q_t_closeness",
    "q_feature_hashing",
    "q_group_ttest",
    "q_lof_outliers",
    "q_link_prediction",
    "q_ndcg_at_k",
    "q_event_trigrams",
    "q_kaplan_meier",
    # round-8 additions: span-removal apply, classifier QA, diversity,
    # keyword extraction, time-series + resampling diagnostics
    # (q_column_mapping excluded: writes a table per run, same policy
    # as q_time_travel)
    "q_suffix_dedup_apply_keep_first",
    "q_cohen_kappa",
    "q_class_f1",
    "q_token_entropy",
    "q_burstiness",
    "q_textrank_keywords",
    "q_autocorrelation",
    "q_jackknife_ci",
    "q_ppr_influence",
    "q_theilsen_trend",
    "q_rolling_median",
    "q_assortativity",
    "q_matryoshka_recall",
    "q_heaps_law",
    "q_bigram_perplexity",
    "q_conformal_interval",
    "q_pair_bleu",
    "q_runs_test",
    "q_unigram_segment_cost",
    "q_brier_score",
    "q_mase_forecast_eval",
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
        # min of three executions: local timings swing ±15% (and worse
        # under co-tenant load); the min is the reproducible number
        # (plan cost + data), the max is the noise.
        best = None
        for _ in range(3):
            # time build() + materialize: operators with eager stages
            # (iterative clustering, centroid fitting) do real work at
            # build time, and excluding it would under-report them
            t0 = time.time()
            df = build()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
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
