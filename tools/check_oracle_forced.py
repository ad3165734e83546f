"""Oracle gate with the capped local solves FORCED OFF.

Round-12 verdict item 3's correctness leg: every query that owns a
capped one-task local solve must stay oracle-green when the cap is
zeroed and the distributed fallback runs instead. This wraps
tools/check_oracle.py with tools/scale_fallback_bench.force_distributed()
applied BEFORE the registry builds any plan.

Usage: python tools/check_oracle_forced.py [sf_dir] [query_name ...]
(defaults to sf0.01 and the capped-family query list).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_fallback_bench import QUERIES, force_distributed  # noqa: E402


def main() -> int:
    force_distributed()
    import tools.check_oracle as co

    if len(sys.argv) < 2:
        sys.argv.append("/root/testdata/sf0.01")
    if len(sys.argv) < 3:
        sys.argv.extend(QUERIES)
    return co.main()


if __name__ == "__main__":
    raise SystemExit(main())
