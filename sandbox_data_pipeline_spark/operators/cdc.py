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
