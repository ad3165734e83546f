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
