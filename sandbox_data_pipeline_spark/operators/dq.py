"""Data-quality checks (D1/D2/D3) — the Anomalo surface, native.

The reference triggers an external DQ service per table per run and
persists the JSON verdict to S3
(dags/sandbox_data_pipeline.py:152-228); the check itself is a
table-level metric sweep. Natively that is one aggregation pass:
count, per-column null counts, min/max — computed in a single
job, no extra scan per metric.

``check_table`` returns (metrics_row, check_result_doc) where the doc
has exactly the reference's check_runs[] shape
(include/utils/anomalo_datahub.py:276-279), so downstream catalog
emission (D3) is format-compatible.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.queries._envproof import stable_round


def dq_metrics(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """One-pass table metrics: row count, null count per column, and
    (if key_cols) duplicate-key count. All partial-aggregatable —
    a single shuffle of one row per partition at any scale."""
    aggs = [F.count(F.lit(1)).alias("row_cnt")]
    for c in df.columns:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}"))
    out = df.agg(*aggs)
    if key_cols:
        dup = (
            df.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.sum(F.when(F.col("_n") > 1, F.col("_n") - 1).otherwise(0)).alias("dup_keys"))
        )
        out = out.crossJoin(dup)
    return out


def run_checks(
    df: DataFrame,
    table_name: str,
    not_null: list[str] | None = None,
    unique: list[str] | None = None,
    min_rows: int = 1,
) -> tuple[dict[str, Any], dict[str, Any]]:
    """D1: evaluate rule-based checks in ONE aggregation job and emit
    the reference-shaped result document. Synchronous, so the D2
    status sensor is trivially 'complete' (SURVEY §2.9)."""
    metrics_row = dq_metrics(df, key_cols=unique).collect()[0].asDict()
    failures: list[str] = []
    if metrics_row["row_cnt"] < min_rows:
        failures.append(f"row_cnt {metrics_row['row_cnt']} < {min_rows}")
    for c in not_null or []:
        n = metrics_row.get(f"nulls_{c}", 0)
        if n:
            failures.append(f"column {c} has {n} nulls")
    if unique and metrics_row.get("dup_keys", 0):
        failures.append(f"duplicate keys on {unique}: {metrics_row['dup_keys']}")
    ok = not failures
    doc = {
        "check_runs": [
            {
                "results_pending": False,
                "check_run_url": f"native://dq/{table_name}",
                "run_config": {"_metadata": {"check_message": f"checks for {table_name}"}},
                "results": {
                    "success": ok,
                    "evaluated_message": "all checks passed" if ok else "; ".join(failures),
                },
            }
        ]
    }
    return metrics_row, doc


def check_suite(df: DataFrame, checks: list[tuple[str, "F.Column"]]) -> DataFrame:
    """Declarative rule suite: ``checks`` is (name, VIOLATION predicate)
    pairs; output is long-form (check_name, violations, total_rows,
    passed). Every rule is a conditional sum inside ONE aggregation
    job — adding a rule adds an expression, never a scan — then a
    row-local stack() unpivots the single wide row. This is the shape
    the reference outsources to Anomalo (D1), evaluated where the data
    already is."""
    aggs = [F.count(F.lit(1)).alias("_total")] + [
        F.sum(F.when(pred, 1).otherwise(0)).alias(f"_c{i}")
        for i, (_, pred) in enumerate(checks)
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{name}', _c{i}" for i, (name, _) in enumerate(checks))
    return wide.select(
        F.expr(f"stack({len(checks)}, {stack_args}) AS (check_name, violations)"),
        F.col("_total").alias("total_rows"),
    ).select(
        "check_name",
        F.col("violations").cast("long").alias("violations"),
        "total_rows",
        (F.col("violations") == 0).alias("passed"),
    )


def catalog_events(table_name: str, doc: dict[str, Any]) -> list[dict[str, Any]]:
    """D3-lite: map a check document to catalog assertion events with
    the same fields DataHub receives from the reference
    (include/utils/anomalo_datahub.py:61-80,276-279)."""
    out = []
    for run in doc["check_runs"]:
        out.append(
            {
                "assertion": f"dq.{table_name}",
                "success": bool(run["results"]["success"]),
                "url": run["check_run_url"],
                "message": run["results"]["evaluated_message"],
                "tag": "Monitored_By_Native_DQ",
            }
        )
    return out


class CatalogStore:
    """Institutional-memory link store with append-if-absent semantics,
    matching the reference's DataHub emitter (`add_link`,
    include/utils/anomalo_datahub.py:82-108): a per-table link list
    where a link is appended only when its URL is not already present,
    so re-emitting the same check run — retries, backfills, replayed
    hours — never duplicates catalog entries.

    JSON-file-backed when ``path`` is given (the engine's stand-in for
    the DataHub graph aspect), in-memory otherwise."""

    def __init__(self, path: str | None = None):
        self.path = path
        self.links: dict[str, list[dict[str, str]]] = {}
        if path is not None:
            import json
            import os

            if os.path.exists(path):
                with open(path, encoding="utf-8") as f:
                    self.links = json.load(f)

    def _flush(self) -> None:
        # temp-file + atomic rename: a crash mid-dump can never leave a
        # truncated store that bricks the next __init__ with a
        # JSONDecodeError — the store is either the old state or the new
        if self.path is not None:
            import json
            import os

            tmp = f"{self.path}.tmp.{os.getpid()}"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(self.links, f, indent=1, sort_keys=True)
            os.replace(tmp, self.path)

    def add_link(self, table_name: str, url: str, description: str) -> bool:
        """Append-if-absent; returns whether a write happened (the
        reference's ``need_write``)."""
        elems = self.links.setdefault(table_name, [])
        if any(x["url"] == url for x in elems):
            return False
        elems.append({"url": url, "description": description})
        self._flush()
        return True

    def emit(self, table_name: str, doc: dict[str, Any]) -> list[dict[str, Any]]:
        """Emit assertion events for a check document AND maintain the
        table's institutional-memory links (one per check-run URL,
        deduped on append). Idempotent: emitting the same document
        twice yields the same link store."""
        events = catalog_events(table_name, doc)
        for ev in events:
            self.add_link(
                table_name, ev["url"], f"{ev['assertion']} check run"
            )
        return events


def mad_anomaly_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group anomaly report via median absolute deviation.

    Both the median and the MAD are exact ORDER STATISTICS (the data
    value at rank ceil(n/2)) — selected values are bit-identical across
    engines, unlike interpolated percentiles, so differential oracles
    hash exactly. A point is anomalous when |v - median| > k * MAD.

    Scale: two rank passes per group (swap row_number for
    approx_percentile's mergeable t-digest at 100 TB); the per-group
    scalars broadcast back, so the counting scan never shuffles rows.
    """
    from pyspark.sql import Window

    e = df.select(F.col(group_col).alias("_g"), F.col(value_col).alias("_v"))
    n = e.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy("_g").orderBy("_v")
    med = (
        e.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(n), "_g")
        .where(F.col("_rn") == F.ceil(F.col("_n") * 0.5))
        .groupBy("_g")
        .agg(F.min("_v").alias("_med"))
    )
    dev = e.join(F.broadcast(med), "_g").withColumn(
        "_dev", F.abs(F.col("_v") - F.col("_med"))
    )
    wd = Window.partitionBy("_g").orderBy("_dev")
    mad = (
        dev.withColumn("_rn", F.row_number().over(wd))
        .join(F.broadcast(n), "_g")
        .where(F.col("_rn") == F.ceil(F.col("_n") * 0.5))
        .groupBy("_g")
        .agg(F.min("_dev").alias("_mad"))
    )
    return (
        dev.join(F.broadcast(mad), "_g")
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.min("_med").alias("median_value"),
            F.min("_mad").alias("mad"),
            F.sum(
                F.when(F.col("_dev") > F.lit(k) * F.col("_mad"), 1).otherwise(0)
            ).alias("n_anomalies"),
        )
        .withColumnRenamed("_g", group_col)
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Join/groupBy-key skew diagnostics: the per-key row counts that
    decide whether a shuffle on ``key_col`` needs salting or AQE skew
    handling. Emits the ``top_n`` hottest keys with each key's share of
    the table and its ratio to the MEDIAN key's count — the number you
    compare against your per-task memory budget before shipping a join.

    Two partial-combined aggregations (key counts, then an exact
    order-statistic median over the per-key counts — the count table is
    |keys| rows, tiny relative to data) plus a top-N rank that compiles
    to a WindowGroupLimit partial. Nothing here scales with row count
    beyond the first map-side combine."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key_value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_nkeys")
    )
    w = Window.orderBy("cnt", "key_value")
    ranked = counts.withColumn("_rn", F.row_number().over(w))
    med = (
        ranked.join(F.broadcast(total))
        .where(
            (F.col("_rn") == F.floor((F.col("_nkeys") + 1) / 2))
            | (F.col("_rn") == F.floor((F.col("_nkeys") + 2) / 2))
        )
        .agg(F.avg("cnt").alias("_median_cnt"))
    )
    topw = Window.orderBy(F.col("cnt").desc(), F.col("key_value"))
    return (
        counts.withColumn("rank", F.row_number().over(topw))
        .where(F.col("rank") <= top_n)
        .join(F.broadcast(total))
        .join(F.broadcast(med))
        .select(
            "rank",
            "key_value",
            "cnt",
            stable_round(F.col("cnt") / F.col("_total"), 6).alias("share"),
            stable_round(F.col("cnt") / F.col("_median_cnt"), 4).alias("vs_median"),
        )
    )


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column profiler, long form: one row per profiled column with
    null rate, distinct count, min/max (as strings — one schema fits
    every column type), and the modal value with its frequency.

    ONE full-width pass computes every per-column aggregate
    (partial-combined: count/count-distinct/min/max/mode all fold
    map-side), then a literal-array inline table unpivots the 1-row
    result — one scan regardless of N. Caveat: N exact countDistinct
    aggregates plan through an Expand (in-flight rows multiply ~N×
    before the partial combine); profiling MANY columns of a 100 TB
    table wants approx_count_distinct (HLL, no Expand) — exact is kept
    here for the differential oracle. The standard first query against
    an unfamiliar table."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
            # deterministic=True → ties resolve to the lowest value,
            # reproducible across engines (the oracle mirrors with
            # ORDER BY cnt DESC, value LIMIT 1)
            F.mode(F.col(c).cast("string"), True).alias(f"{c}__mode"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                stable_round(
                    (F.col(f"{c}__n") - F.col(f"{c}__nn")) / F.col(f"{c}__n"), 6
                ).alias("null_rate"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
                F.col(f"{c}__mode").alias("mode_str"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")
