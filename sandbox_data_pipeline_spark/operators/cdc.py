"""Change-data-capture operators: merge/upsert and SCD2 history build.

The reference pipeline's sinks are replace-partition writes
(/root/reference/dags/sql/write_weather_to_bigquery.sql:1-10 deletes a
run_hr then re-inserts); it never needs row-level merge because every
load is a full hour. A warehouse engine serving the same users does
need row-level semantics the moment a source emits a changelog —
these two operators supply them Spark-first.

Both are single-shuffle plans:

``merge_upsert``
    target ∪ updates → one hash shuffle on the key → per-key ordered
    ``row_number`` keeps the newest version; an optional delete flag
    drops tombstoned keys. No join: a union + window is one shuffle
    where target-join-updates would be two (and the window dedups
    updates against each other for free). At 100 TB the win is keeping
    the target bucketed on the key (``sinks/writers.py: save_bucketed``)
    so only the (small) update side moves.

``scd2_history``
    changelog → one shuffle on the key → two ordered passes in the same
    partition: ``lag`` for change-detection (collapse runs of identical
    tracked values), ``lead`` for validity intervals. State per key
    during the pass is O(1); skew follows the key distribution (salt
    via operators/skew.py if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "_cdc_rn"
_CHANGED = "_cdc_changed"


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Upsert ``updates`` into ``target``: newest row per key wins.

    ``order_cols`` break version ties ascending — the row with the
    greatest ordering tuple survives, updates beating target rows on
    exact ties (arrival order). ``delete_col`` (boolean), if given,
    marks tombstones: a key whose surviving row has it true disappears
    from the output, and the column itself is dropped.
    """
    src = F.lit(0)
    t2 = target.withColumn("_cdc_src", src)
    u2 = updates.withColumn("_cdc_src", F.lit(1))
    if delete_col is None:
        t2 = t2.withColumn("_cdc_del", F.lit(False))
        u2 = u2.withColumn("_cdc_del", F.lit(False))
    else:
        t2 = t2.withColumnRenamed(delete_col, "_cdc_del")
        u2 = u2.withColumnRenamed(delete_col, "_cdc_del")

    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols], F.col("_cdc_src").desc()
    )
    merged = (
        t2.unionByName(u2)
        .withColumn(_RN, F.row_number().over(w))
        .where(F.col(_RN) == 1)
        .where(~F.col("_cdc_del"))
        .drop(_RN, "_cdc_src", "_cdc_del")
    )
    return merged


def _tracked_changed(track_cols: list[str], w: Window) -> Column:
    """True on the first row per key and whenever any tracked value
    differs from the previous row's (null-safe)."""
    changed = F.lit(False)
    for c in track_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.row_number().over(w) == 1
    return first | changed


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    track_cols: list[str],
) -> DataFrame:
    """Build slowly-changing-dimension (type 2) history from a changelog.

    Consecutive rows per key whose ``track_cols`` are unchanged collapse
    into one version; each version carries ``valid_from_*`` (its first
    ordering tuple), ``valid_to_*`` (the next version's, null while
    current) and ``is_current``. Ordering tuples must be unique per key
    or version boundaries are nondeterministic.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    versions = (
        changes.select(*key_cols, *order_cols, *track_cols)
        .withColumn(_CHANGED, _tracked_changed(track_cols, w))
        .where(F.col(_CHANGED))
        .drop(_CHANGED)
    )
    wv = Window.partitionBy(*key_cols).orderBy(*order_cols)
    out = versions
    for c in order_cols:
        out = out.withColumn(f"valid_to_{c}", F.lead(c).over(wv))
    out = out.withColumn(
        "is_current", F.col(f"valid_to_{order_cols[0]}").isNull()
    )
    renames = {c: f"valid_from_{c}" for c in order_cols}
    return out.withColumnsRenamed(renames)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot diff: one row per key that changed between two table
    versions, labeled ``added`` / ``removed`` / ``changed``.

    The anti-entropy primitive behind replication checks, late-landing
    audits, and CDC backfills: given yesterday's snapshot and today's,
    emit exactly what a changelog should have delivered.

    One full-outer join on the key (single shuffle per side; zero if
    both snapshots are bucketed on the key — ``save_bucketed``).
    Value comparison is null-safe column equality, evaluated
    map-side after the join; unchanged keys are filtered before
    anything else happens, so the output is proportional to the drift,
    not the table.
    """
    compare_cols = compare_cols or [
        c for c in old.columns if c in set(new.columns) and c not in key_cols
    ]
    # presence sentinels (not derived from compare cols: a row whose
    # compare cols are all NULL still counts as present)
    o = old.select(
        *key_cols,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_old_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_new_{c}") for c in compare_cols],
    )
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}"))
    change = (
        F.when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_in_old").isNull(), F.lit("added"))
        .when(~same, F.lit("changed"))
    )
    return (
        o.join(n, key_cols, "full_outer")
        .withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )


def merge_rollup(
    existing: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Incremental view maintenance for additive rollups: fold a delta
    partial-aggregate into an existing one. Both inputs carry the same
    shape (keys + partial sums + partial count); the merge is a union +
    one re-aggregation — the result equals recomputing the rollup over
    the full input, because sums and counts are associative.

    At 100 TB this is the difference between touching the day's delta
    and re-scanning the table: maintain the rollup hourly by folding
    each hour's partial in. Exactness requires the measures be decimal
    (float partial sums reorder under different reduction trees).
    """
    return (
        existing.unionByName(delta)
        .groupBy(*key_cols)
        .agg(
            *[F.sum(c).alias(c) for c in sum_cols],
            F.sum(count_col).alias(count_col),
        )
    )
