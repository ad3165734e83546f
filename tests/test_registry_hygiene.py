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
