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

Scope (documented, not hidden): ``MaterializedViewCatalog`` does
EXACT-match rewrite; ``RollupRewriteCatalog`` adds the classic
subsumption case for decomposable aggregates (a query grouping by a
SUBSET of the view's keys over the same child plan re-aggregates the
tiny materialized result — sum/count/min/max only; avg must be
declared as sum+count). Filter subsumption stays out of scope.
Staleness is the caller's contract (refresh() after base-table
writes), matching the manual-refresh mode of warehouse MVs.

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


# --- Rollup subsumption rewrite ---------------------------------------------
#
# The exact-match rewrite's classic follow-up: a query that aggregates
# by a SUBSET of a view's grouping keys, over the same child plan, with
# re-aggregable functions (sum/count/min/max — the decomposable class;
# avg is NOT, it must be declared as sum+count), derives from the view
# by one further aggregation over the tiny materialized result instead
# of a full base-table pass.

_AGG_HEAD = re.compile(r"^Aggregate \[(.*?)\], \[(.*)\]$")
_ALIAS = re.compile(r"^(\w+)\((.*)\) AS (\w+)#\d*L?$")
_SUPPORTED = {"sum", "count", "min", "max"}


def _split_top_commas(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
            continue
        depth += ch in "(["
        depth -= ch in ")]"
        cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def aggregate_parts(df: DataFrame):
    """(group_cols, aggs, child_fingerprint) when the analyzed plan is
    a single Aggregate of supported functions over named columns;
    None otherwise. Column names come id-stripped; aggs are
    (func, normalized_arg, output_alias) triples."""
    s = df._jdf.queryExecution().analyzed().toString()
    head, _, child = s.partition("\n")
    m = _AGG_HEAD.match(head)
    if not m:
        return None
    strip = lambda x: _EXPR_ID.sub("", x).strip()  # noqa: E731
    groups = [strip(g) for g in _split_top_commas(m.group(1)) if g.strip()]
    aggs: list[tuple[str, str, str]] = []
    for item in _split_top_commas(m.group(2)):
        if strip(item) in groups:
            continue
        am = _ALIAS.match(item)
        if not am or am.group(1) not in _SUPPORTED:
            return None
        aggs.append((am.group(1), strip(am.group(2)), am.group(3)))
    child_fp = _PLAN_ID.sub("plan_id=", _EXPR_ID.sub("#", child))
    return groups, aggs, child_fp


class RollupRewriteCatalog(MaterializedViewCatalog):
    """MV catalog that additionally derives subset-grouping rollups.
    create() records the aggregate decomposition when the view IS a
    supported aggregate; rewrite() falls back from exact match to
    subsumption."""

    def create(self, name: str, df: DataFrame) -> None:
        super().create(name, df)
        parts = aggregate_parts(df)
        if parts:
            groups, aggs, child_fp = parts
            # map the plan-side output aliases to the DataFrame's
            # column names positionally (alias ids were stripped)
            meta_path = self._meta_path(name)
            with open(meta_path, encoding="utf-8") as f:
                meta = json.load(f)
            meta["agg"] = {
                "groups": groups,
                "aggs": aggs,
                "child_fp": child_fp,
                "group_out": df.columns[: len(groups)],
            }
            with open(meta_path, "w", encoding="utf-8") as f:
                json.dump(meta, f)

    def rewrite(self, df: DataFrame) -> tuple[DataFrame, str | None]:
        out, hit = super().rewrite(df)
        if hit is not None:
            return out, hit
        parts = aggregate_parts(df)
        if not parts:
            return df, None
        q_groups, q_aggs, q_child = parts
        for fn in os.listdir(self.store):
            if not fn.endswith(".mv.json"):
                continue
            with open(os.path.join(self.store, fn), encoding="utf-8") as f:
                meta = json.load(f)
            a = meta.get("agg")
            if not a or a["child_fp"] != q_child:
                continue
            if not set(q_groups) <= set(a["groups"]):
                continue
            # every query agg must be derivable from a view agg with
            # the SAME (func, arg): sum→sum, count→sum, min/max→same
            mv_alias = {(f_, arg): al for f_, arg, al in a["aggs"]}
            derivations = []
            ok = True
            for f_, arg, alias in q_aggs:
                src = mv_alias.get((f_, arg))
                if src is None:
                    ok = False
                    break
                refn = "sum" if f_ in ("sum", "count") else f_
                derivations.append((refn, src, alias))
            if not ok:
                continue
            from pyspark.sql import functions as F

            mv = self.spark.read.parquet(self._data_path(meta["name"]))
            # view group columns carry the view's OUTPUT names; the
            # query's subset groups map by normalized source column
            g_map = dict(zip(a["groups"], a["group_out"]))
            sel_groups = [
                F.col(g_map[g]).alias(out_name)
                for g, out_name in zip(q_groups, df.columns[: len(q_groups)])
            ]
            agg_cols = [
                getattr(F, refn)(src).alias(alias)
                for refn, src, alias in derivations
            ]
            derived = mv.groupBy(*sel_groups).agg(*agg_cols)
            return derived.select(*df.columns), meta["name"]
        return df, None
