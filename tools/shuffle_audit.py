"""Measure ACTUAL shuffle volume per query from executed-plan SQL
metrics — the evidence behind SCALE.md's shuffle-inventory table.

For each registry query: execute it (collect — the action binds the
metrics to this Dataset's QueryExecution), then walk the AQE final
physical plan summing `shuffleBytesWritten` over Exchange nodes plus
`spillSize` everywhere, and count exchanges. A query whose plan claims
"zero shuffle" must measure 0 bytes written; a claimed
"constant-size shuffle" (e.g. the count-min sketch's 256 cells) must
measure KBs regardless of scan size.

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
Prints one line per query:  name  exchanges  shuffle_bytes  spill  rows
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def walk_metrics(node, visited: set, acc: dict) -> None:
    nid = node.id()
    if nid in visited:
        return
    visited.add(nid)
    name = node.nodeName()
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        k, v = kv._1(), kv._2().value()
        if k == "shuffleBytesWritten":
            acc["shuffle_bytes"] += v
            acc["exchanges"] += 1
        elif k == "spillSize":
            acc["spill_bytes"] += max(v, 0)
    if name.startswith("AdaptiveSparkPlan"):
        walk_metrics(node.executedPlan(), visited, acc)
        return
    ch = node.children().iterator()
    while ch.hasNext():
        walk_metrics(ch.next(), visited, acc)
    # QueryStage / ReusedExchange wrappers hide their subtree behind
    # plan()/child() instead of children()
    for meth in ("plan", "child"):
        try:
            sub = getattr(node, meth)()
            if sub is not None and hasattr(sub, "nodeName"):
                walk_metrics(sub, visited, acc)
        except Exception:
            pass


def audit_query(df) -> dict:
    rows = df.collect()
    acc = {"shuffle_bytes": 0, "spill_bytes": 0, "exchanges": 0}
    walk_metrics(df._jdf.queryExecution().executedPlan(), set(), acc)
    acc["rows"] = len(rows)
    return acc


def main() -> int:
    from sandbox_data_pipeline_spark.queries import registry
    from sandbox_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    spark = get_spark("shuffle-audit", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()
    if not names:
        names = list(queries)
    total = {"shuffle_bytes": 0, "spill_bytes": 0, "exchanges": 0}
    errors = 0
    for name in names:
        try:
            acc = audit_query(queries[name](spark, sf_dir))
        except Exception as ex:  # keep auditing the rest
            print(f"ERR   {name}: {str(ex)[:90]}")
            errors += 1
            continue
        for k in total:
            total[k] += acc[k]
        print(
            f"ok    {name}: exchanges={acc['exchanges']} "
            f"shuffle={acc['shuffle_bytes']:,}B spill={acc['spill_bytes']:,}B "
            f"rows={acc['rows']}"
        )
    print(
        f"\nTOTAL exchanges={total['exchanges']} "
        f"shuffle={total['shuffle_bytes'] / 1e6:.1f}MB "
        f"spill={total['spill_bytes'] / 1e6:.1f}MB over {len(names)} queries"
        + (f" ({errors} ERRORS)" if errors else "")
    )
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
