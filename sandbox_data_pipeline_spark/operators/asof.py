"""As-of (point-in-time) join — an operator Spark's join surface lacks,
composed from built-ins exactly as the brief's custom-operator ladder
prescribes: union + ordered last-value carry-forward, no UDF, no range
candidate explosion.

For each left row, attach the latest right row with
``right.ts <= left.ts`` in the same key group (left outer). The naive
formulations both fail at 100 TB: an inequality join explodes to
O(|L|·|R|) candidates per key before picking the max, and a per-row
subquery is quadratic. This formulation is ONE shuffle of L∪R on the
key, one ordered window pass per partition:

    tag left rows 1 / right rows 0
    sort each key group by (ts, tag)           -- right wins ts ties
    carry right values forward with last(..., ignorenulls=True)
    keep left rows

State per group during the pass is the last-seen right values — O(1).
Skewed keys: the window partitions by key only, so a pathological key
serializes; salt+re-merge (operators/skew.py) applies if measured.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SIDE_COL = "_asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left-outer as-of join on ``by`` with time column ``ts_col``.

    ``right_cols`` (default: everything but ``by``/``ts_col``) appear in
    the output as ``<col><suffix>``; the matched right timestamp is
    ``<ts_col><suffix>``. Rows with equal timestamps on both sides
    match (right sorts first). If ``right`` can hold duplicate
    (by, ts) pairs, pre-aggregate it — the carried value would
    otherwise depend on partition order.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (by, ts_col)]
    carried = [ts_col] + right_cols  # right's own ts rides along

    left_cols = [c for c in left.columns if c not in (by, ts_col)]

    l2 = left.select(
        F.col(by),
        F.col(ts_col),
        F.lit(1).alias(SIDE_COL),
        *[F.col(c) for c in left_cols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in carried
        ],
    )
    r2 = right.select(
        F.col(by),
        F.col(ts_col),
        F.lit(0).alias(SIDE_COL),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"__r_{c}") for c in carried],
    )

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts_col).asc(), F.col(SIDE_COL).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l2.unionByName(r2)
    filled = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in carried
        ],
    )
    return filled.where(F.col(SIDE_COL) == 1).select(
        by, ts_col, *left_cols, *[f"{c}{suffix}" for c in carried]
    )
