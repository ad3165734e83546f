"""Distributed gram matrix / PCA (operators/linalg.py) against exact
numpy ground truth computed on the same parquet, plus the partition-
independence and plan-shape properties the 100 TB design rests on."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.operators.linalg import (
    gram_matrix,
    mean_vector,
    pca_components,
    pca_project,
)

SF = "/root/testdata/sf0.001"
DIM = 64


def _X(spark) -> np.ndarray:
    pdf = table(spark, SF, "embeddings").orderBy("vec_id").toPandas()
    return np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])


def test_gram_float_matches_numpy(spark):
    emb = table(spark, SF, "embeddings")
    got = gram_matrix(emb, dim=DIM).toPandas().set_index(["i", "j"])
    X = _X(spark)
    G = X.T @ X
    iu = np.triu_indices(DIM)
    assert len(got) == DIM * (DIM + 1) // 2
    assert (got["n_vecs"] == len(X)).all()
    want = G[iu]
    have = np.array([got.loc[(i, j), "s"] for i, j in zip(*iu)])
    np.testing.assert_allclose(have, want, rtol=1e-12)


def test_gram_quantized_is_exact_and_partition_independent(spark):
    emb = table(spark, SF, "embeddings")
    X = _X(spark)
    Xq = np.trunc(X * 1e6).astype(np.int64)
    G = Xq.T @ Xq
    for parts in (1, 7):
        got = (
            gram_matrix(emb.repartition(parts), dim=DIM, quantize_scale=6)
            .toPandas()
            .set_index(["i", "j"])
        )
        iu = np.triu_indices(DIM)
        for i, j in zip(*iu):
            assert int(got.loc[(i, j), "s"]) == int(G[i, j])


def test_mean_vector_matches_numpy(spark):
    emb = table(spark, SF, "embeddings")
    got = mean_vector(emb, dim=DIM).toPandas().set_index("i").sort_index()
    X = _X(spark)
    np.testing.assert_allclose(got["mean_x"].to_numpy(), X.mean(axis=0), rtol=1e-9)


def test_pca_recovers_numpy_eigh(spark):
    emb = table(spark, SF, "embeddings")
    g = gram_matrix(emb, dim=DIM)
    vals, vecs = pca_components(g, dim=DIM, k=4)
    X = _X(spark)
    ref_vals, ref_vecs = np.linalg.eigh(X.T @ X)
    order = np.argsort(ref_vals)[::-1][:4]
    np.testing.assert_allclose(vals, ref_vals[order], rtol=1e-9)
    # components match up to the deterministic sign fix
    for c in range(4):
        r = ref_vecs[:, order[c]]
        if r[int(np.argmax(np.abs(r)))] < 0:
            r = -r
        np.testing.assert_allclose(vecs[:, c], r, atol=1e-8)
    # orthonormal
    np.testing.assert_allclose(vecs.T @ vecs, np.eye(4), atol=1e-10)


def test_pca_project_matches_numpy(spark):
    emb = table(spark, SF, "embeddings")
    vals, vecs = pca_components(gram_matrix(emb, dim=DIM), dim=DIM, k=3)
    got = (
        pca_project(emb, vecs, col="embedding", out="pca")
        .orderBy("vec_id")
        .toPandas()
    )
    X = _X(spark)
    P = X @ vecs
    got_m = np.vstack([np.asarray(v) for v in got["pca"]])
    np.testing.assert_allclose(got_m, P, atol=1e-10)
    # projection variance is eigval-ordered (energy-descending)
    var = (P * P).sum(axis=0)
    assert var[0] >= var[1] >= var[2]


def test_gram_plan_is_partial_agg_over_batch_partials(spark):
    """The shuffle after mapInPandas carries only (i,j) partials —
    assert the aggregate runs in two phases (map-side partial combine
    before the Exchange), which is what bounds shuffle rows to
    n_batches * d(d+1)/2 regardless of corpus size."""
    import io
    from contextlib import redirect_stdout

    emb = table(spark, SF, "embeddings")
    buf = io.StringIO()
    with redirect_stdout(buf):
        gram_matrix(emb, dim=DIM).explain("formatted")
    plan = buf.getvalue()
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "Exchange" in plan


def test_integer_moments_augmented_gram(spark):
    """integer_moments returns n, linear sums, and product sums of the
    augmented [1|X] matrix — exact, partition-independent."""
    from sandbox_data_pipeline_spark.operators.linalg import integer_moments

    rows = [(2, 10), (3, -4), (5, 7), (-1, 0)]
    df = spark.createDataFrame(rows, "a long, b long")
    for parts in (1, 3):
        got = {
            (r["i"], r["j"]): int(r["s"])
            for r in integer_moments(df.repartition(parts), ["a", "b"]).collect()
        }
        a = [r[0] for r in rows]
        b = [r[1] for r in rows]
        assert got[(0, 0)] == len(rows)
        assert got[(0, 1)] == sum(a)
        assert got[(0, 2)] == sum(b)
        assert got[(1, 1)] == sum(x * x for x in a)
        assert got[(1, 2)] == sum(x * y for x, y in rows)
        assert got[(2, 2)] == sum(y * y for y in b)
