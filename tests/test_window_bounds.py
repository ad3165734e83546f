"""Boundedness proof for GLOBAL_WINDOW_OK (round-11 verdict item).

tools/explain_all.py flags unpartitioned windows mechanically, but the
32 allowlisted queries' "the frame is bounded" claims were argued in
comments, not measured. This module MEASURES them: each query runs at
sf0.01, the executed plan is walked for Window/WindowGroupLimit nodes
whose spec has no partition columns, and the row count ENTERING each
(the nearest descendant Exchange's recordsRead, falling back to the
nearest numOutputRows) must stay under the query's documented ceiling.

Ceilings are set well above the measured frame (headroom for data
drift) but far below corpus cardinality at sf0.01, so an edit that
rebinds a global window to a per-row frame — the q_heaps_law (round 8)
and q_rholoss_select (round 9) bug class — trips mechanically.

Measured reference (round 11): every frame was SF-stable between
sf0.001 and sf0.01 (e.g. benford 9/9, ks_drift 311/313, hodges
1988/1966) while the corpora grew 10x — the boundedness claim,
observed. Windows over driver-built local frames report 0/None (no
exchange metrics); they are bounded by construction (literal-size
input) and skipped.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from explain_all import GLOBAL_WINDOW_OK  # noqa: E402

from conftest import SF01_DIR  # noqa: E402  (sf0.01 corpus, env-overridable)

# query -> (ceiling, documented bound). The ceiling is the mechanical
# tripwire; the string is the SURVEY-grade statement of WHY the frame
# cannot scale with the corpus.
BOUNDS: dict[str, tuple[int, str]] = {
    "q_benford_audit": (9, "first-digit histogram: digits 1-9"),
    "q_best_split": (33, "32 fixed-width feature bins (+1 edge)"),
    "q_bm25_topk": (2000, "postings of 3 pinned query terms (sum of dfs), k=20"),
    "q_brier_score": (10, "10 equal-width score bins"),
    "q_compaction_plan": (4096, "file-manifest rows: one per data file"),
    "q_conformal_interval": (64, "per-partition offset frame (<= shuffle partitions)"),
    "q_cramers_v": (256, "lang x source contingency cells"),
    "q_eb_shrinkage": (64, "per-source frame (source cardinality)"),
    "q_event_trigrams": (250, "event-type^3 pattern lattice (5^3 = 125)"),
    "q_fellegi_sunter": (8, "2^3 field-agreement patterns"),
    "q_heaps_law": (64, "two-phase rank per-partition offset frame"),
    "q_hill_tail": (201, "top-(k+1) order statistics, k = 200"),
    "q_hodges_lehmann": (4096, "distinct pairwise differences (value-range bounded)"),
    "q_hybrid_rrf": (2000, "two post-limit ranked candidate lists"),
    "q_ips_eval": (8, "action/priority lattice"),
    "q_isotonic_calibration": (64, "<= 16 price bins (PAVA via bin-frame joins)"),
    "q_jackknife_ci": (32, "2 windows x 8 leave-one-out groups"),
    "q_kaplan_meier": (744, "hour-grain durations inside the one-month horizon"),
    "q_kruskal_wallis": (2048, "distinct (lang, n_chars) cells (5 x value domain)"),
    "q_ks_drift": (1024, "distinct n_chars values (value histogram)"),
    "q_mannwhitney_u": (1024, "distinct n_chars values (value histogram)"),
    "q_map_mrr_eval": (64, "judged ranking lists (driver-literal frame)"),
    "q_pr_curve": (33, "32 fixed-width score bins (+1 edge)"),
    "q_rbo_rankings": (64, "two ranked lists x depth k"),
    "q_runs_test": (366, "calendar-day frame"),
    "q_seasonal_index": (24, "hour-of-day groups"),
    "q_skew_report": (64, "bucket report frame"),
    "q_skyline": (1024, "distinct n_chars values (value histogram)"),
    "q_sprt_ab": (366, "calendar-day frame"),
    "q_suffix_repeats": (64, "two-phase rank per-partition offset frame"),
    "q_theilsen_trend": (64, "two-phase rank per-partition offset frame"),
    "q_wasserstein_drift": (1024, "distinct n_chars values (value histogram)"),
}


def test_bounds_cover_allowlist_exactly():
    """Adding a query to GLOBAL_WINDOW_OK without a documented,
    enforced ceiling here must fail — that documentation is the
    allowlist's admission price."""
    assert set(BOUNDS) == set(GLOBAL_WINDOW_OK), (
        f"missing bounds: {sorted(set(GLOBAL_WINDOW_OK) - set(BOUNDS))}; "
        f"stale bounds: {sorted(set(BOUNDS) - set(GLOBAL_WINDOW_OK))}"
    )


def _children(node):
    out = []
    ch = node.children()
    for i in range(ch.size()):
        out.append(ch.apply(i))
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        out.append(node.executedPlan())
    elif "QueryStageExec" in cls:
        out.append(node.plan())
    return out


def _input_rows(node):
    for c in _children(node):
        m = c.metrics()
        it = m.keysIterator()
        keys = set()
        while it.hasNext():
            keys.add(it.next())
        if "recordsRead" in keys:
            return int(m.apply("recordsRead").value())
        if "numOutputRows" in keys:
            return int(m.apply("numOutputRows").value())
        r = _input_rows(c)
        if r is not None:
            return r
    return None


def _is_unpartitioned(node) -> bool:
    s = node.simpleString(1000)
    i = s.find("windowspecdefinition(")
    if i < 0:
        return False
    j = i + len("windowspecdefinition(")
    depth = 0
    first = []
    while j < len(s):
        ch = s[j]
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                break
            depth -= 1
        elif ch == "," and depth == 0:
            break
        first.append(ch)
        j += 1
    arg = "".join(first).strip()
    return " ASC" in arg or " DESC" in arg or arg.startswith("specifiedwindowframe")


def _global_window_inputs(node, acc):
    if node.nodeName() in ("Window", "WindowGroupLimit") and _is_unpartitioned(
        node
    ):
        acc.append(_input_rows(node))
    for c in _children(node):
        _global_window_inputs(c, acc)
    return acc


@pytest.mark.parametrize("name", sorted(BOUNDS))
def test_global_window_frame_bounded(name, spark):
    from sandbox_data_pipeline_spark.queries import registry

    qs, _ = registry()
    ceiling, why = BOUNDS[name]
    df = qs[name](spark, SF01_DIR)
    df.collect()
    frames = _global_window_inputs(
        df._jdf.queryExecution().executedPlan(), []
    )
    measured = [f for f in frames if f]  # 0/None = driver-literal frame
    for rows in measured:
        assert rows <= ceiling, (
            f"{name}: global window frame holds {rows} rows, documented "
            f"bound is {ceiling} ({why}) — the frame is no longer bounded"
        )
