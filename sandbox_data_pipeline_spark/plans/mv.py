"""Materialized views with automatic plan-fingerprint query rewrite.

The missing piece between the IVM family (q_rollup_ivm / q_join_ivm /
q_sketch_ivm maintain MV CONTENTS incrementally) and the query layer:
a catalog that recognizes when a NEW query is the same logical plan as
a registered view and silently substitutes the materialized scan —
what warehouse engines call transparent MV rewrite.

Matching is by normalized analyzed-plan fingerprint: Spark's analyzer
resolves both the registered definition and the candidate query to
logical plans whose only run-to-run differences are expression ids
(``col#123``) and plan ids; stripping those yields a canonical string
that is equal exactly when the two DataFrames were built from the same
relations, projections, filters, and aggregates — regardless of which
SparkSession built them or in what order the builder chained equivalent
calls that analyze identically.

Scope (documented, not hidden): this is EXACT-match rewrite — the
subsumption case (query derivable from the view by further
aggregation/filtering) is the classic follow-up and is out of scope;
staleness is the caller's contract (refresh() after base-table writes),
matching the manual-refresh mode of warehouse MVs.

At 100 TB the payoff is the usual one: the fingerprint comparison is
driver-side string work (milliseconds, zero cluster cost), and a hit
replaces a full aggregation pipeline with a parquet scan of the
pre-aggregated result.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_EXPR_ID = re.compile(r"#\d+L?")
_PLAN_ID = re.compile(r"plan_id=\d+")


def plan_fingerprint(df: DataFrame) -> str:
    """Canonical string of the ANALYZED logical plan: expression ids
    and plan ids stripped (allocation order is session-global state,
    not semantics). Analysis — not optimization — keeps the
    fingerprint independent of optimizer rule changes AND cheap (no
    cost-based work); two queries that analyze identically would also
    optimize identically."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    s = _EXPR_ID.sub("#", analyzed)
    return _PLAN_ID.sub("plan_id=", s)


class MaterializedViewCatalog:
    """Directory-backed MV store: one parquet dataset + fingerprint
    sidecar per view. Survives the SparkSession (the fingerprint is
    session-independent by construction)."""

    def __init__(self, spark: SparkSession, store_dir: str) -> None:
        self.spark = spark
        self.store = store_dir
        os.makedirs(store_dir, exist_ok=True)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.store, f"{name}.mv.json")

    def _data_path(self, name: str) -> str:
        return os.path.join(self.store, f"{name}.parquet")

    def create(self, name: str, df: DataFrame) -> None:
        """Materialize ``df`` under ``name`` and register its
        fingerprint for rewrite. Overwrites an existing view."""
        fp = plan_fingerprint(df)
        df.write.mode("overwrite").parquet(self._data_path(name))
        with open(self._meta_path(name), "w", encoding="utf-8") as f:
            json.dump({"name": name, "fingerprint": fp}, f)

    def refresh(self, name: str, df: DataFrame) -> None:
        """Re-materialize after base-table changes (the staleness
        contract is manual refresh; the IVM queries show the
        incremental-maintenance alternative)."""
        self.create(name, df)

    def drop(self, name: str) -> None:
        for p in (self._meta_path(name),):
            if os.path.exists(p):
                os.remove(p)
        shutil.rmtree(self._data_path(name), ignore_errors=True)

    def _registry(self) -> dict[str, str]:
        out: dict[str, str] = {}
        for fn in os.listdir(self.store):
            if fn.endswith(".mv.json"):
                with open(os.path.join(self.store, fn), encoding="utf-8") as f:
                    meta = json.load(f)
                out[meta["fingerprint"]] = meta["name"]
        return out

    def rewrite(self, df: DataFrame) -> tuple[DataFrame, str | None]:
        """Return (possibly-substituted DataFrame, hit name or None).
        On a fingerprint hit the result is a scan of the materialized
        parquet — column order re-projected to the query's schema so
        the substitution is invisible downstream."""
        fp = plan_fingerprint(df)
        hit = self._registry().get(fp)
        if hit is None:
            return df, None
        mv = self.spark.read.parquet(self._data_path(hit))
        return mv.select(*df.columns), hit
