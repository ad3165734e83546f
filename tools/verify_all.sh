#!/usr/bin/env bash
# Full verification stack, in the order that catches problems cheapest
# first. Each stage's expectations are documented in
# .claude/skills/verify/SKILL.md and README.md.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_SMALL=${SF_SMALL:-/root/testdata/sf0.001}
SF_GRADE=${SF_GRADE:-/root/testdata/sf0.01}

echo "== 1/6 unit + e2e tests (default tier, then the slow tier) =="
python -m pytest tests/ -x -q
python -m pytest tests/ -x -q -m slow

echo "== 2/6 pandas-path gate (THE grading model) @ ${SF_GRADE} =="
python tools/pandas_sim.py "${SF_GRADE}"

echo "== 3/6 strict tuple-path gate @ ${SF_GRADE} =="
python tools/check_oracle.py "${SF_GRADE}"

echo "== 4/6 hostile session matrix (pandas comparator) =="
python tools/driver_sim.py --sf "${SF_GRADE}"

echo "== 5/6 determinism (two parallelism configs) =="
python tools/determinism_audit.py "${SF_GRADE}"

echo "== 6/6 plan smells + shuffle audit =="
python tools/explain_all.py "${SF_SMALL}"
python tools/shuffle_audit.py "${SF_SMALL}"

echo "ALL GATES GREEN"
