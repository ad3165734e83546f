"""Plan auditor: print the formatted physical plan of every declared
query and flag scale smells mechanically.

Checks per plan (see SCALE.md):
- parquet scans list pushed filters when the query filters scanned rows
- no scan reads more columns than the plan consumes (ReadSchema pruned)
- every groupBy shows a partial HashAggregate before its Exchange
- no `CartesianProduct` or `BroadcastNestedLoopJoin` outside the
  intentionally-crossing operators (IVF/LSH literal-expression ops are
  map-side and never produce one)
- no Python `BatchEvalPython` (row-at-a-time UDF) outside the declared
  UDF query (q_clean_json)

Usage: python tools/explain_all.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

ROW_UDF_OK = {"q_clean_json"}  # X2: ast.literal_eval repair, inherently Python


def _unpartitioned_windows(plan: str) -> int:
    """Count Window specs with NO partition columns. In the formatted
    plan a windowspecdefinition lists partition cols first (bare
    column refs), then order cols (suffixed ASC/DESC), then the frame
    — so a spec whose FIRST argument is an order col or the frame
    itself is a global window: all rows in one task. The first
    argument is extracted with a paren-balancing scan, not a regex —
    an order EXPRESSION can nest arbitrarily (coalesce(cast(x as
    bigint), y) ASC ...) and a bounded regex would truncate it and
    misclassify the global window as partitioned."""
    n = 0
    start = 0
    needle = "windowspecdefinition("
    while True:
        i = plan.find(needle, start)
        if i < 0:
            return n
        j = i + len(needle)
        depth = 0
        first = []
        while j < len(plan):
            ch = plan[j]
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
        if (
            " ASC" in arg
            or " DESC" in arg
            or arg.startswith("specifiedwindowframe")
        ):
            n += 1
        start = j


# Queries ALLOWED to run a global (unpartitioned) window, because the
# windowed frame is provably bounded — value-histogram, calendar,
# pattern-lattice, post-limit(k), or per-partition-totals scale — never
# corpus-cardinality. Every entry's docstring documents which bounded
# frame it is. Adding a query here requires that documentation; the
# q_heaps_law (round 8) and q_rholoss_select (round 9) scale bugs were
# exactly global windows over per-document frames that a list like
# this would have flagged mechanically. Every entry's bound is now
# MEASURED, not argued: tests/test_window_bounds.py runs each query,
# reads the rows entering every unpartitioned Window from the executed
# plan's exchange metrics, and asserts them under a documented ceiling
# (one line per entry in its BOUNDS table — adding a query here
# without a bound there fails test_bounds_cover_allowlist_exactly).
GLOBAL_WINDOW_OK: set[str] = {
    # digit/key/value-histogram or domain-bounded frames:
    "q_benford_audit", "q_skew_report", "q_ks_drift", "q_mannwhitney_u",
    "q_kruskal_wallis", "q_hodges_lehmann", "q_wasserstein_drift",
    "q_best_split", "q_pr_curve", "q_brier_score", "q_skyline",
    "q_isotonic_calibration",
    # calendar / day-grain frames:
    "q_seasonal_index", "q_sprt_ab", "q_runs_test", "q_theilsen_trend",
    "q_kaplan_meier",
    # pattern-lattice / bounded-group frames (2^fields patterns,
    # trigram types, group/source counts):
    "q_fellegi_sunter", "q_event_trigrams", "q_eb_shrinkage",
    "q_jackknife_ci", "q_ips_eval", "q_cramers_v",
    # post-limit(k) / TakeOrdered-bounded frames:
    "q_bm25_topk", "q_hybrid_rrf", "q_map_mrr_eval", "q_rbo_rankings",
    "q_hill_tail",
    # per-partition-totals offsets frames (bounded by the partition
    # count — the two-phase rank's own metadata window):
    "q_heaps_law", "q_conformal_interval", "q_suffix_repeats",
    "q_compaction_plan",
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, plan: str) -> list[str]:
    smells = []
    if "CartesianProduct" in plan:
        smells.append("CartesianProduct")
    if "BatchEvalPython" in plan and name not in ROW_UDF_OK:
        smells.append("row-at-a-time Python UDF in plan")
    # A HashAggregate with real functions must have a partial phase.
    # Keys-only aggregates (distinct / intersect / except) show
    # "Functions [0]" and partial-dedupe before the Exchange anyway.
    import re

    if (
        "HashAggregate" in plan
        and re.search(r"Functions \[[1-9]", plan)
        and "partial_" not in plan
    ):
        smells.append("aggregate without partial (map-side combine missing)")
    k = _unpartitioned_windows(plan)
    if k and name not in GLOBAL_WINDOW_OK:
        smells.append(
            f"{k} unpartitioned window(s) — bounded-frame queries belong "
            "in GLOBAL_WINDOW_OK with the boundedness documented"
        )
    return smells


def main() -> int:
    import __spark_entry__ as m
    from sandbox_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    verbose = bool(only)
    failures = 0
    for name, fn in sorted(m.queries().items()):
        if only and name not in only:
            continue
        try:
            plan = plan_of(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            failures += 1
            continue
        smells = audit(name, plan)
        status = "SMELL" if smells else "ok"
        if smells:
            failures += 1
        print(f"{status:5s} {name}" + (f": {'; '.join(smells)}" if smells else ""))
        if verbose:
            print(plan)
    print(f"\n{failures} plans with smells")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
