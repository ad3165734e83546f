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

# Headline set — ROTATED per round like DRIVER_PRIORITY. Round 12:
# (1) the 20-query continuity set (r11's slowest + the manifest twins
#     + the canary), run FIRST on the freshly-warmed JVM, anchors the
#     round-over-round compare;
# (2) the 142 ledger entries whose BENCH_CUMULATIVE timing still dates
#     from r07/r08/r09 — one pass here makes every ledger row at most
#     two rounds old (round-11 verdict item 3). Mostly sub-second.
# Names must exist in queries().
HEADLINE = [
    "q_coverage_greedy",
    "q_similarity_ivf_kmeans_topk",
    "q_quality_classifier",
    "q_dbscan_grid",
    "q_suffix_dedup_apply_keep_first",
    "q_video_keyframes",
    "q_video_near_dup",
    "q_image_dhash_dedup",
    "q_jpeg_decode_stats",
    "q_embedding_dup_clusters",
    "q_naive_bayes",
    "q_suffix_dedup_apply",
    "q_anchored_dup_spans",
    "q_rholoss_select",
    "q_lakehouse_lifecycle",
    "q_media_fingerprint_manifest",
    "q_media_manifest_ivm",
    "q_image_dhash_from_manifest",
    "q_video_near_dup_from_manifest",
    "q_hash_canary",
    "q_agg_basic",
    "q_agg_cube",
    "q_agg_rollup",
    "q_allpairs_jaccard",
    "q_ann_index",
    "q_ann_index_drift",
    "q_ann_recall",
    "q_association_rules",
    "q_assortativity",
    "q_auc_score",
    "q_audio_near_dup",
    "q_bigram_bits",
    "q_bigram_perplexity",
    "q_bloom_prefilter",
    "q_bm25_topk",
    "q_bmp_decode_stats",
    "q_bmp_resize_stats",
    "q_bpe_encode",
    "q_budget_select",
    "q_chi2_terms",
    "q_class_f1",
    "q_clustering_coeff",
    "q_cms_heavy_hitters",
    "q_cohen_kappa",
    "q_conformal_interval",
    "q_containment_pairs",
    "q_crosslingual_dups",
    "q_curation_pipeline",
    "q_dd_quantiles",
    "q_decontam",
    "q_dedup_clusters",
    "q_dedup_minhash_pairs",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_dedup_simhash_pairs",
    "q_dedup_survivors",
    "q_diff_in_diff",
    "q_doremi_weights",
    "q_dq_referential",
    "q_dq_report",
    "q_dq_suite",
    "q_dup_degree_dist",
    "q_dup_triangles",
    "q_embedding_quantize",
    "q_entity_matches",
    "q_entity_resolution",
    "q_event_funnel",
    "q_ewma_smooth",
    "q_feature_hashing",
    "q_fellegi_sunter",
    "q_fuzzy_match",
    "q_gif_decode_stats",
    "q_gini_concentration",
    "q_global_ids",
    "q_graph_bfs",
    "q_grouping_sets",
    "q_hard_negatives",
    "q_histogram_equidepth",
    "q_hits_dups",
    "q_hll_rollup",
    "q_hybrid_rrf",
    "q_incremental_dedup",
    "q_join_asof",
    "q_join_broadcast",
    "q_join_cardinality_audit",
    "q_join_salted",
    "q_kcore_peel",
    "q_kmv_distinct",
    "q_kmv_jaccard",
    "q_kneser_ney_bits",
    "q_knn_join",
    "q_lang_confusion",
    "q_leakage_safe_split",
    "q_linear_fit",
    "q_link_prediction",
    "q_lof_outliers",
    "q_lpa_communities",
    "q_mad_anomalies",
    "q_map_mrr_eval",
    "q_matryoshka_recall",
    "q_merge_upsert",
    "q_minhash_precision",
    "q_mmr_rerank",
    "q_ndcg_at_k",
    "q_ngram_freq",
    "q_numeric_corr",
    "q_pagerank_dups",
    "q_pair_bleu",
    "q_pca_power",
    "q_pmi_pairs",
    "q_png_decode_stats",
    "q_png_resize_stats",
    "q_ppr_influence",
    "q_pq_adc_topk",
    "q_pq_codes",
    "q_profile_orders",
    "q_psi_drift",
    "q_rag_index_pipeline",
    "q_repetition",
    "q_safe_casts",
    "q_semantic_search",
    "q_semdedup",
    "q_sequence_mining",
    "q_simhash_quality_sweep",
    "q_similarity_ivf_topk",
    "q_similarity_lsh_topk",
    "q_similarity_near_dup",
    "q_similarity_near_dup_lsh",
    "q_similarity_topk",
    "q_source_drift_kl",
    "q_srm_check",
    "q_suffix_dedup_spans",
    "q_suffix_repeats",
    "q_target_encode",
    "q_text_quality",
    "q_textrank_keywords",
    "q_tfidf_top_terms",
    "q_theilsen_trend",
    "q_token_entropy",
    "q_tpch_q01",
    "q_tpch_q02",
    "q_tpch_q03",
    "q_tpch_q05",
    "q_tpch_q07",
    "q_tpch_q08",
    "q_tpch_q09",
    "q_tpch_q10",
    "q_tpch_q16",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q21",
    "q_training_triplets",
    "q_unigram_segment_cost",
    "q_weather_insert",
    "q_weather_stage",
    "q_weather_variant_insert",
    "q_weather_variant_native",
    "q_weighted_sample",
    "q_winnow_fingerprints",
    "q_winsorize",
    "q_wordpiece_encode",
    "q_zorder_skipping",
]


# BENCH_r10's compare flagged these 5 at >=1.5x vs BENCH_r09 raw. The
# judge's adjudication: 4 of 5 had zero code changes since r9 and the
# unchanged flagship drifted 1.48x in the same run — machine drift,
# not regression — but the discharge needs a REPRODUCED number, not an
# argument. Rule (VERDICT.md round 10): each query is discharged when
# its flagship-normalized ratio vs r9 — (new/r9_sec) divided by
# (new_flagship/r9_flagship) — lands below 1.25; otherwise it is a
# reproduced regression and must be root-caused. Values are verbatim
# from BENCH_r09.json / BENCH_r10.json.
FLAGGED_R10 = {
    "flagship": {"r9": 1.03, "r10": 1.52},
    # q_coverage_greedy was the ONE reproduced regression (1.347
    # normalized on the round-11 quiet re-run): root cause = round
    # 10's covered-set rework added a per-round driver round-trip
    # (collect the winner's ~90 bigrams, re-ship via createDataFrame)
    # on top of the broadcast anti-join. Fixed in round 11 by keeping
    # covered entirely executor-side as the broadcast subquery `tok
    # where doc_id in selected` (plan still constant-size: only the
    # <= K literal ids) — identical selection, 1-row argmax is now the
    # only per-round transfer. Re-measured min-of-3 after a flagship
    # calibration: 10.585s vs flagship 1.223s -> normalized-vs-r9
    # (10.585/8.77)/(1.223/1.03) = 1.02 — discharged.
    "q_coverage_greedy": {"r9": 8.77, "r10": 17.09},
    "q_similarity_ivf_kmeans_topk": {"r9": 3.67, "r10": 7.00},
    "q_quality_classifier": {"r9": 7.71, "r10": 13.71},
    "q_dbscan_grid": {"r9": 8.46, "r10": 14.89},
    "q_suffix_dedup_apply_keep_first": {"r9": 3.92, "r10": 6.21},
}


def flagged_adjudication(timings: dict[str, float], threshold: float = 1.25):
    """Flagship-normalized re-adjudication of the round-10 flags: the
    flagship query is the machine-speed control (trivial, untouched
    since round 1), so dividing each query's vs-r9 ratio by the
    flagship's vs-r9 ratio cancels VM drift and leaves only true plan
    regressions."""
    if "flagship" not in timings:
        return None
    cal = timings["flagship"] / FLAGGED_R10["flagship"]["r9"]
    out = {"flagship_vs_r9": round(cal, 3), "threshold": threshold, "queries": {}}
    for name, ref in FLAGGED_R10.items():
        if name == "flagship" or name not in timings:
            continue
        raw = timings[name] / ref["r9"]
        norm = raw / cal if cal > 0 else None
        out["queries"][name] = {
            "r9": ref["r9"],
            "r10": ref["r10"],
            "now": timings[name],
            "raw_vs_r9": round(raw, 3),
            "normalized_vs_r9": round(norm, 3) if norm is not None else None,
            "verdict": (
                "no_calibration"
                if norm is None
                else ("discharged" if norm < threshold else "REGRESSION")
            ),
        }
    return out


def update_cumulative_ledger(timings: dict[str, float], sf: float) -> None:
    """Merge this run's timings into BENCH_CUMULATIVE.json — the
    on-disk proof that every registry query has been benched at least
    once (BENCH_r* final lines are budgeted slowest-first, so fast
    queries fall off the surviving per-round artifacts; the ledger is
    the complete record). Latest measurement wins; the `at` label
    records which run produced it."""
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "BENCH_CUMULATIVE.json")
    try:
        with open(path, encoding="utf-8") as f:
            ledger = json.load(f)
    except (OSError, ValueError):
        ledger = {}
    label = os.environ.get("SPARK_GRAFT_ROUND", "r12-local")
    for k, v in timings.items():
        ledger[k] = {"sec": round(v, 3), "at": label, "sf": sf}
    try:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
    except OSError as e:
        # The ledger is pitched as the on-disk completeness proof —
        # a silent write failure would quietly stale it.
        print(f"WARNING: BENCH_CUMULATIVE.json write failed: {e}", file=sys.stderr)


def compare_block(timings: dict[str, float], threshold: float = 1.5):
    """Round-over-round comparison vs the latest BENCH_r{N}.json, so a
    regression is separable from environment noise without re-deriving:
    same-query ratios < ``threshold`` are within the documented VM
    variance band (round-2 ran untouched round-1 queries 1.5-2x slower
    under identical code); larger ones are listed for review."""
    import glob
    import re

    benches = sorted(
        p
        for p in glob.glob(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")
        )
        # Main-run artifacts only: BENCH_r12_c8.json is the driver's
        # 8-core SCALING run — sorting it as "latest" made every
        # 32-core compare flag queries at exactly their 8/32-core
        # ratios (measurement bug found in round 13; the r13-entry
        # run "flagged" q_fellegi_sunter at 2.79x = its scaling
        # ratio, not a regression).
        if re.fullmatch(r"BENCH_r\d+\.json", os.path.basename(p))
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
    adj = flagged_adjudication(timings)
    if adj is not None:
        verbose["flagged_adjudication"] = adj
    update_cumulative_ledger(timings, sf)
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
