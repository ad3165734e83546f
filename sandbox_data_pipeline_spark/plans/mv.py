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
EXACT-match rewrite; ``RollupRewriteCatalog`` adds the two classic
subsumption cases — (a) decomposable-aggregate rollup (a query
grouping by a SUBSET of the view's keys over the same child plan
re-aggregates the tiny materialized result; sum/count/min/max only,
avg must be declared as sum+count), and (b) filter subsumption for
single-column range/equality predicates (a query Filter over a view's
child whose predicate IMPLIES the view's — e.g. ds >= 7 under a view
of ds >= 5 — re-filters the materialized rows). Compound (AND/OR),
multi-column, and expression predicates are out of scope — parts
parsers return None and the rewrite degrades to no-hit, never to a
wrong substitution. Staleness is the caller's contract (refresh()
after base-table writes), matching the manual-refresh mode of
warehouse MVs.

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


# --- Filter subsumption rewrite ----------------------------------------------
#
# A query Filter(pred_q) over a view's child where pred_q implies the
# view's pred_v answers from the materialized rows re-filtered by
# pred_q. Honest subset: ONE comparison of ONE named column against ONE
# literal (numeric ranges/equality; string equality). Anything else —
# compound predicates, expressions, unparseable literals — returns
# None from filter_parts and the rewrite degrades to no-hit.

_FILTER_HEAD = re.compile(r"^Filter \((\w+)#\d*L? (>=|<=|>|<|=) (.+)\)$")
_CAST_LIT = re.compile(r"^cast\((-?\d+(?:\.\d+)?) as \w+\)$")
_NUM_LIT = re.compile(r"^-?\d+(?:\.\d+)?$")
_STR_LIT = re.compile(r"^[\w.:-]+$")  # no spaces/parens: unambiguous


def filter_parts(df: DataFrame):
    """(col, op, literal, child_fingerprint) when the analyzed plan is
    a single Filter comparing one named column to one literal; None
    otherwise (the degrade-to-no-rewrite contract)."""
    s = df._jdf.queryExecution().analyzed().toString()
    head, _, child = s.partition("\n")
    m = _FILTER_HEAD.match(head)
    if not m:
        return None
    col, op, lit_s = m.groups()
    cm = _CAST_LIT.match(lit_s)
    if cm:
        lit_s = cm.group(1)
    if _NUM_LIT.match(lit_s):
        lit: int | float | str = float(lit_s) if "." in lit_s else int(lit_s)
    elif _STR_LIT.match(lit_s) and op == "=":
        # bare string literal (the analyzed printer quotes nothing);
        # only a restricted charset is unambiguous, only for equality
        lit = lit_s
    else:
        return None
    child_fp = _PLAN_ID.sub("plan_id=", _EXPR_ID.sub("#", child))
    return col, op, lit, child_fp


def _interval(op: str, lit):
    """(lo, lo_open, hi, hi_open) of the satisfying set."""
    inf = float("inf")
    if op == ">":
        return (lit, True, inf, True)
    if op == ">=":
        return (lit, False, inf, True)
    if op == "<":
        return (-inf, True, lit, True)
    if op == "<=":
        return (-inf, True, lit, False)
    return (lit, False, lit, False)  # "="


def predicate_implies(q: tuple, v: tuple) -> bool:
    """Does (col, op, lit) ``q`` imply ``v``? Same column only;
    numeric predicates by interval containment, strings only by
    equality of equalities (lexicographic string ranges are NOT
    attempted — collation subtleties are not worth the hit rate)."""
    qc, qo, ql = q
    vc, vo, vl = v
    if qc != vc:
        return False
    if isinstance(ql, str) or isinstance(vl, str):
        return (
            isinstance(ql, str)
            and isinstance(vl, str)
            and qo == vo == "="
            and ql == vl
        )
    qlo, qloo, qhi, qhio = _interval(qo, ql)
    vlo, vloo, vhi, vhio = _interval(vo, vl)
    lo_ok = qlo > vlo or (qlo == vlo and (qloo or not vloo))
    hi_ok = qhi < vhi or (qhi == vhi and (qhio or not vhio))
    return lo_ok and hi_ok


class RollupRewriteCatalog(MaterializedViewCatalog):
    """MV catalog that additionally derives subset-grouping rollups
    and filter-subsumed scans. create() records the aggregate
    decomposition / filter predicate when the view's plan parses as
    one; rewrite() falls back from exact match to subsumption."""

    def create(self, name: str, df: DataFrame) -> None:
        super().create(name, df)
        fparts = filter_parts(df)
        if fparts:
            col, op, lit, child_fp = fparts
            meta_path = self._meta_path(name)
            with open(meta_path, encoding="utf-8") as f:
                meta = json.load(f)
            meta["filter"] = {
                "col": col,
                "op": op,
                "lit": lit,
                "child_fp": child_fp,
            }
            with open(meta_path, "w", encoding="utf-8") as f:
                json.dump(meta, f)
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
        fhit = self._filter_rewrite(df)
        if fhit is not None:
            return fhit
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

    def _filter_rewrite(
        self, df: DataFrame
    ) -> tuple[DataFrame, str] | None:
        """Filter subsumption: query = Filter(pred_q) over a view's
        child with pred_q ⇒ pred_v answers as MV-scan + re-filter.
        Re-applying pred_q over the (pred_v-satisfying) materialized
        rows selects exactly {child | pred_q} because pred_q ⇒ pred_v
        means no pred_q row was filtered away at materialization."""
        import operator

        qparts = filter_parts(df)
        if qparts is None:
            return None
        qcol, qop, qlit, qchild = qparts
        ops = {
            ">": operator.gt,
            ">=": operator.ge,
            "<": operator.lt,
            "<=": operator.le,
            "=": operator.eq,
        }
        for fn in os.listdir(self.store):
            if not fn.endswith(".mv.json"):
                continue
            with open(os.path.join(self.store, fn), encoding="utf-8") as f:
                meta = json.load(f)
            v = meta.get("filter")
            if not v or v["child_fp"] != qchild:
                continue
            if not predicate_implies(
                (qcol, qop, qlit), (v["col"], v["op"], v["lit"])
            ):
                continue
            from pyspark.sql import functions as F

            mv = self.spark.read.parquet(self._data_path(meta["name"]))
            pred = ops[qop](F.col(qcol), F.lit(qlit))
            return mv.where(pred).select(*df.columns), meta["name"]
        return None
