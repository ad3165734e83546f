"""Compare two bench.py outputs per-query.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold]

Accepts either the raw one-line bench output or the driver's
BENCH_r{N}.json envelope (which nests it under ["parsed"]). Prints the
shared-set totals and every query whose ratio new/old exceeds the
threshold (default 1.5), plus entries present on only one side — the
regression diff to read before trusting a round's headline number.
Timings swing with machine load; compare mins from bench.py's
min-of-3, and treat <1.5x as noise unless it reproduces.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    if "queries" not in doc and "parsed" in doc:
        doc = doc["parsed"]
    return doc["queries"]


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    shared = sorted(set(old) & set(new))
    t_old = sum(old[k] for k in shared)
    t_new = sum(new[k] for k in shared)
    print(
        f"shared {len(shared)} queries: old={t_old:.2f}s new={t_new:.2f}s "
        f"ratio={t_new / t_old if t_old else float('nan'):.2f}"
    )
    flagged = [
        (new[k] / old[k], k)
        for k in shared
        if old[k] > 0 and new[k] / old[k] >= threshold
    ]
    for ratio, k in sorted(flagged, reverse=True):
        print(f"  x{ratio:4.2f}  {k}: {old[k]:.3f} -> {new[k]:.3f}")
    for k in sorted(set(new) - set(old)):
        print(f"  new-only  {k}: {new[k]:.3f}")
    for k in sorted(set(old) - set(new)):
        print(f"  dropped   {k}: {old[k]:.3f}")


if __name__ == "__main__":
    main()
