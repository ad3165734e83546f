"""Registry hygiene: a query name registered twice in one module is
silently last-wins (dict semantics) — exactly the shadowing bug this
guards against. Cross-module duplicates already raise in registry().
"""

from __future__ import annotations

import ast
import pathlib

QUERY_DIR = pathlib.Path(__file__).parent.parent / "sandbox_data_pipeline_spark" / "queries"


def _registered_names(path: pathlib.Path) -> list[str]:
    """Every query name bound into QUERIES: literal dict keys in
    ``QUERIES = {...}`` plus ``QUERIES["name"] = ...`` subscripts."""
    tree = ast.parse(path.read_text())
    names: list[str] = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Assign):
            continue
        for tgt in node.targets:
            if (
                isinstance(tgt, ast.Name)
                and tgt.id == "QUERIES"
                and isinstance(node.value, ast.Dict)
            ):
                for k in node.value.keys:
                    if isinstance(k, ast.Constant) and isinstance(k.value, str):
                        names.append(k.value)
            if (
                isinstance(tgt, ast.Subscript)
                and isinstance(tgt.value, ast.Name)
                and tgt.value.id == "QUERIES"
                and isinstance(tgt.slice, ast.Constant)
                and isinstance(tgt.slice.value, str)
            ):
                names.append(tgt.slice.value)
    return names


def test_no_shadowed_query_registrations():
    for path in sorted(QUERY_DIR.glob("*.py")):
        names = _registered_names(path)
        dups = sorted({n for n in names if names.count(n) > 1})
        assert not dups, f"{path.name}: shadowed registrations {dups}"


def test_priority_names_resolve_and_registry_loads():
    from sandbox_data_pipeline_spark.queries import DRIVER_PRIORITY, registry

    q, o = registry()
    assert set(o) <= set(q)
    assert set(DRIVER_PRIORITY) <= set(q)
    # every priority name must appear first, in order
    assert list(q)[: len(DRIVER_PRIORITY)] == list(DRIVER_PRIORITY)


def _driver_samples() -> tuple[dict, set[str]]:
    """Latest-round verdict per query + the set of every query ever
    driver-sampled, from the committed CORRECTNESS_r*.json artifacts."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict = {}
    seen: set[str] = set()
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(p, encoding="utf-8") as f:
                d = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(d, dict):
            seen |= set(d)
            latest = d
    return latest, seen


def test_rotation_policy_head_grades_never_sampled_first():
    """ROTATION POLICY (encoded so it survives builder context loss):
    the driver grades roughly the first 50 DRIVER_PRIORITY entries per
    round. When the latest CORRECTNESS artifact is all-green, holding
    long-green queries in that window wastes the round — the head must
    lead with never-sampled coverage (canary excepted: it keeps slot 1
    as the comparator-environment tripwire). If this fails after a
    round with reds, rotate the red slots back into the head instead.
    """
    from sandbox_data_pipeline_spark.queries import DRIVER_PRIORITY, registry

    latest, seen = _driver_samples()
    if not latest:
        return  # no artifacts yet (fresh clone)
    assert DRIVER_PRIORITY[0] == "q_hash_canary"
    q, _ = registry()
    never = set(q) - seen
    if not never:
        return  # everything has been graded at least once
    all_green = all(
        (v.get("hash_match") or (v.get("rows_match") and v.get("err") is None))
        for v in latest.values()
        if isinstance(v, dict)
    )
    if not all_green:
        return  # red rounds re-prove reds first; rotation resumes after
    head = [n for n in DRIVER_PRIORITY[:50] if n != "q_hash_canary"]
    n_never_in_head = sum(1 for n in head if n in never)
    want = min(len(never), 45)
    assert n_never_in_head >= want, (
        f"graded head holds {n_never_in_head} never-sampled queries, "
        f"needs >= {want}: {len(never)} queries have never been "
        "driver-graded — rotate them into DRIVER_PRIORITY[:50]"
    )


def test_bench_headline_names_resolve():
    """bench.py silently skips HEADLINE names missing from the
    registry (`if name in queries`), so a renamed query would
    quietly shrink the benchmark — pin membership here."""
    import sys

    sys.path.insert(0, str(QUERY_DIR.parent.parent))
    import bench

    from sandbox_data_pipeline_spark.queries import registry

    q, _ = registry(raw=True)
    missing = [n for n in bench.HEADLINE if n not in q]
    assert not missing, f"HEADLINE names not in registry: {missing}"
    dups = sorted({n for n in bench.HEADLINE if bench.HEADLINE.count(n) > 1})
    assert not dups, f"duplicate HEADLINE names: {dups}"


def test_bench_compare_baseline_skips_scaling_artifacts():
    """r13 measurement bug: compare_block's glob sorted
    BENCH_r12_c8.json (the driver's 8-CORE scaling run) as the
    "latest" baseline, so 32-core runs flagged queries at exactly
    their 8/32-core scaling ratios. The baseline must be a main-run
    BENCH_r<N>.json artifact."""
    import sys

    sys.path.insert(0, str(QUERY_DIR.parent.parent))
    import bench

    cmp = bench.compare_block({"flagship": 1.0})
    assert cmp is None or __import__("re").fullmatch(
        r"BENCH_r\d+\.json", cmp["baseline"]
    ), f"scaling/variant artifact chosen as compare baseline: {cmp['baseline']}"


def test_bench_cumulative_ledger_complete():
    """Round-10 judge finding: surviving BENCH_r* artifacts proved
    only 236/355 queries ever benched (final lines are budgeted
    slowest-first, truncating fast queries), making the README's
    cumulative-coverage claim unreproducible. BENCH_CUMULATIVE.json is
    now the complete on-disk ledger, updated by every bench.py run.
    Every registry query must appear there — or in bench.HEADLINE,
    which means it is scheduled for the next run (new queries land in
    HEADLINE first, the ledger after the run)."""
    import json
    import sys

    sys.path.insert(0, str(QUERY_DIR.parent.parent))
    import bench

    from sandbox_data_pipeline_spark.queries import registry

    q, _ = registry(raw=True)
    ledger = json.loads(
        (QUERY_DIR.parent.parent / "BENCH_CUMULATIVE.json").read_text()
    )
    covered = set(ledger) | set(bench.HEADLINE)
    missing = sorted(set(q) - covered)
    assert not missing, (
        f"{len(missing)} registry queries neither benched "
        f"(BENCH_CUMULATIVE.json) nor scheduled (bench.HEADLINE): {missing}"
    )
    # ledger rows must be well-formed so a judge jq can trust them
    for name, row in ledger.items():
        assert isinstance(row.get("sec"), (int, float)) and row["sec"] >= 0, name
        assert row.get("at"), name


def test_collect_sites_are_allowlisted():
    """Every driver-side .collect() in product code is an AUDITED
    bounded collect (metadata scale, k-bounded, or a loud-guarded
    trainer fold — see SCALE.md and each site's docstring). A new
    collect site fails here until it is reviewed and added: an
    unreviewed collect is the #1 way a distributed operator silently
    becomes a driver loop. Keyed on (file, enclosing function), not
    line numbers, so refactors don't churn it."""
    import ast
    from collections import Counter

    allow = {
        ("operators/bpe.py", "bpe_merges"): 2,  # per-merge argmax, vocab-capped
        ("operators/dq.py", "run_checks"): 1,  # one row per DQ check
        ("operators/ids.py", "stable_global_ids_with_count"): 1,  # per-partition counts
        ("operators/linalg.py", "pca_components"): 1,  # d x d Gram fold
        ("operators/quality.py", "doremi_weights"): 1,  # J-row domain weights
        # (J+2)-row per GD step x2 + the r12 local path's J+2 final rows
        ("operators/quality.py", "train_quality_lr"): 3,
        ("operators/similarity.py", "ivf_centroids"): 1,  # n_centroids rows
        # k rows/round (loop) + the r12 local path's k*dim final rows
        ("operators/similarity.py", "ivf_centroids_kmeans_exact"): 3,
        ("operators/similarity.py", "pq_codebook"): 1,  # codebook rows
        # 1-row gate: (position count, ascii flag) for the local path
        ("operators/suffix.py", "_span_local_stats"): 1,
        ("operators/unigram.py", "unigram_train_from_docs"): 1,  # capped vocab
        ("queries/analytics.py", "q_shapley_attribution"): 1,  # 2^4 lattice
        ("queries/analytics.py", "q_sinkhorn_ot"): 1,  # bin histogram
        ("queries/dedup.py", "q_incremental_dedup"): 1,  # admitted-batch ids
        ("queries/similarity.py", "q_pca_power"): 1,  # d x d Gram
        ("queries/text.py", "q_coverage_greedy"): 1,  # 1-row argmax per round
        ("queries/text.py", "q_wordpiece_encode"): 1,  # WP_MAX_TYPES-guarded vocab
        ("queries/txlog.py", "q_join_ivm"): 3,  # txlog metadata frames
        ("queries/txlog.py", "q_replace_where"): 1,  # txlog metadata
        ("queries/txlog.py", "q_table_changes"): 1,  # txlog metadata
        ("queries/txlog.py", "q_txlog_ivm"): 3,  # txlog metadata frames
        ("sinks/txlog.py", "build_bloom_index"): 1,  # per-file bloom rows
        ("sinks/writers.py", "notify_query_result"): 1,  # bounded limit() collect
        ("streaming/cdc.py", "_apply"): 1,  # touched key-buckets per batch
        ("streaming/hourly.py", "_publish"): 1,  # per-trigger hour rows
        ("streaming/trending.py", "_publish"): 1,  # top-k per trigger
    }
    pkg = QUERY_DIR.parent
    got: Counter = Counter()
    for p in sorted(pkg.rglob("*.py")):
        tree = ast.parse(p.read_text())
        rel = str(p.relative_to(pkg))
        stack: list[str] = []

        class V(ast.NodeVisitor):
            def visit_FunctionDef(self, n):
                stack.append(n.name)
                self.generic_visit(n)
                stack.pop()

            visit_AsyncFunctionDef = visit_FunctionDef

            def visit_Call(self, n):
                f = n.func
                if (
                    isinstance(f, ast.Attribute)
                    and f.attr == "collect"
                    and not n.args
                    and not n.keywords
                ):
                    got[(rel, stack[-1] if stack else "<module>")] += 1
                self.generic_visit(n)

        V().visit(tree)
    assert dict(got) == allow, (
        f"unreviewed collect sites: {dict(got.items() - allow.items())}; "
        f"stale allowlist rows: {dict(allow.items() - got.items())}"
    )


def _ast_call_sites(attr: str, skip_receivers: frozenset = frozenset()) -> dict:
    """(file-relative-to-package, enclosing function) -> count of
    ``.{attr}(...)`` calls, for the audited-site tripwires below.
    ``skip_receivers`` drops calls whose receiver is a bare name in
    the set (e.g. ``F`` — ``F.first(...)`` is the SQL aggregate, not
    a driver materialization)."""
    import ast
    from collections import Counter

    pkg = QUERY_DIR.parent
    got: Counter = Counter()
    for p in sorted(pkg.rglob("*.py")):
        tree = ast.parse(p.read_text())
        rel = str(p.relative_to(pkg))
        stack: list[str] = []

        class V(ast.NodeVisitor):
            def visit_FunctionDef(self, n):
                stack.append(n.name)
                self.generic_visit(n)
                stack.pop()

            visit_AsyncFunctionDef = visit_FunctionDef

            def visit_Call(self, n):
                f = n.func
                if (
                    isinstance(f, ast.Attribute)
                    and f.attr == attr
                    and not (
                        isinstance(f.value, ast.Name)
                        and f.value.id in skip_receivers
                    )
                ):
                    got[(rel, stack[-1] if stack else "<module>")] += 1
                self.generic_visit(n)

        V().visit(tree)
    return dict(got)


def test_crossjoin_sites_are_allowlisted():
    """Every crossJoin in product code broadcasts a 1-row or bounded
    frame (scalar totals, centroid/codebook tables, per-group
    aggregates) — the judge's standing manual audit, pinned. A new
    crossJoin fails here until it is reviewed and added: an unreviewed
    cross join against a corpus-scale frame is the quadratic-blowup
    twin of the unreviewed collect."""
    allow = {
        ("operators/bloom.py", "bloom_probe"): 1,
        ("operators/dq.py", "dq_metrics"): 1,
        ("operators/graph.py", "hits"): 1,
        ("operators/graph.py", "pagerank"): 2,
        ("operators/graph.py", "personalized_pagerank"): 1,
        ("operators/layout.py", "zvalue"): 1,
        ("operators/quality.py", "doremi_weights"): 1,
        ("operators/skew.py", "key_skew_report"): 1,
        ("operators/text.py", "bm25_topk"): 1,
        ("operators/text.py", "drift_kl"): 2,
        ("operators/text.py", "pmi_pairs"): 1,
        ("operators/text.py", "tfidf_top_terms"): 1,
        ("operators/text.py", "unigram_cross_entropy"): 1,
        ("queries/analytics.py", "q_association_rules"): 1,
        ("queries/analytics.py", "q_autocorrelation"): 1,
        ("queries/analytics.py", "q_conformal_interval"): 1,
        ("queries/analytics.py", "q_cramers_v"): 2,
        ("queries/analytics.py", "q_eb_shrinkage"): 1,
        ("queries/analytics.py", "q_event_funnel"): 1,
        ("queries/analytics.py", "q_hill_tail"): 1,
        ("queries/analytics.py", "q_hodges_lehmann"): 4,
        ("queries/analytics.py", "q_item_cooccurrence"): 1,
        ("queries/analytics.py", "q_kaplan_meier"): 1,
        ("queries/analytics.py", "q_kruskal_wallis"): 2,
        ("queries/analytics.py", "q_ks_drift"): 1,
        ("queries/analytics.py", "q_mase_forecast_eval"): 1,
        ("queries/analytics.py", "q_psi_drift"): 1,
        ("queries/analytics.py", "q_runs_test"): 1,
        ("queries/analytics.py", "q_sinkhorn_ot"): 1,
        ("queries/analytics.py", "q_target_encode"): 1,
        ("queries/analytics.py", "q_theilsen_trend"): 1,
        ("queries/analytics.py", "q_wasserstein_drift"): 1,
        ("queries/cdc.py", "q_rollup_ivm"): 2,
        ("queries/dedup.py", "q_fellegi_sunter"): 3,
        ("queries/dq.py", "q_dq_freshness"): 1,
        ("queries/dq.py", "q_t_closeness"): 2,
        ("queries/layout.py", "q_zorder_skipping"): 1,
        ("queries/relational.py", "q_funnel"): 2,
        ("queries/relational.py", "q_gap_fill"): 1,
        ("queries/similarity.py", "q_auc_score"): 1,
        ("queries/similarity.py", "q_best_split"): 1,
        ("queries/similarity.py", "q_brier_score"): 1,
        ("queries/similarity.py", "q_calibration_bins"): 1,
        ("queries/similarity.py", "q_pr_curve"): 1,
        ("queries/text.py", "q_bigram_perplexity"): 1,
        ("queries/text.py", "q_burstiness"): 1,
        ("queries/text.py", "q_chi2_terms"): 1,
        ("queries/text.py", "q_cohen_kappa"): 1,
        ("queries/text.py", "q_dataset_card"): 1,
        ("queries/text.py", "q_kmv_jaccard"): 1,
        ("queries/text.py", "q_kneser_ney_bits"): 1,
        ("queries/text.py", "q_map_mrr_eval"): 1,
        ("queries/text.py", "q_mixture_sample"): 1,
        ("queries/text.py", "q_mixture_weights"): 2,
        ("queries/text.py", "q_mutual_information"): 1,
        ("queries/text.py", "q_naive_bayes"): 2,
        ("queries/text.py", "q_rbo_rankings"): 1,
        ("queries/text.py", "q_rholoss_select"): 1,
        ("queries/text.py", "q_temperature_mixture"): 2,
        ("queries/tpch.py", "_partsupp"): 1,
        ("queries/tpch.py", "q_tpch_q11"): 1,
        ("queries/tpch.py", "q_tpch_q15"): 1,
        ("queries/tpch.py", "q_tpch_q22"): 1,
    }
    got = _ast_call_sites("crossJoin")
    assert got == allow, (
        f"unreviewed crossJoin sites: {dict(got.items() - allow.items())}; "
        f"stale allowlist rows: {dict(allow.items() - got.items())}"
    )


def test_other_materialization_sites_are_allowlisted():
    """Review finding (round 10): the collect tripwire above counts
    only zero-argument .collect() — toPandas / take / head /
    collectAsList / first / show / collect(*args) escaped it, so its
    'every unreviewed driver collect fails here' guarantee was
    narrower than advertised. Close the gap: EVERY driver-side
    materialization spelling is now audited. Product code currently
    has zero toPandas/take/head/show sites (a new one fails here until
    reviewed) and five DataFrame.first() sites, each a bounded
    metadata probe (1-row dimension lookup, txlog snapshot metadata).
    ``F.first`` is the SQL aggregate, executor-side, excluded by
    receiver."""
    empty_attrs = ["toPandas", "take", "head", "collectAsList", "show"]
    for attr in empty_attrs:
        got = _ast_call_sites(attr)
        assert got == {}, f"unreviewed driver-side .{attr}() sites: {got}"

    first_allow = {
        # 1-row probe of the embedding dimensionality before planning
        ("operators/similarity.py", "near_dup_pairs"): 1,
        # txlog snapshot/version metadata — bounded by commit count
        ("queries/txlog.py", "q_time_travel"): 1,
        ("queries/txlog.py", "q_restore"): 1,
        ("sinks/txlog.py", "merge"): 2,
    }
    got_first = _ast_call_sites("first", skip_receivers=frozenset({"F"}))
    assert got_first == first_allow, (
        f"unreviewed DataFrame.first() sites: "
        f"{dict(got_first.items() - first_allow.items())}; stale rows: "
        f"{dict(first_allow.items() - got_first.items())}"
    )

    # collect WITH arguments (the zero-arg form is pinned above)
    import ast
    from collections import Counter

    pkg = QUERY_DIR.parent
    got_args: Counter = Counter()
    for p in sorted(pkg.rglob("*.py")):
        tree = ast.parse(p.read_text())
        rel = str(p.relative_to(pkg))

        class V(ast.NodeVisitor):
            def visit_Call(self, n):
                f = n.func
                if (
                    isinstance(f, ast.Attribute)
                    and f.attr == "collect"
                    and (n.args or n.keywords)
                ):
                    got_args[rel] += 1
                self.generic_visit(n)

        V().visit(tree)
    assert dict(got_args) == {}, (
        f"unreviewed collect(*args) sites: {dict(got_args)}"
    )
