"""Exact rank-based AUC / calibration (round-7 ML-eval family)."""

from __future__ import annotations


def _auc_rows(spark, sf_tmp, rows):
    # build a tiny embeddings-shaped parquet dir the query can read
    import os

    df = spark.createDataFrame(
        [(i, [float(s)] + [0.0] * 3, lab) for i, (s, lab) in enumerate(rows)],
        "vec_id long, embedding array<float>, label int",
    )
    df.write.mode("overwrite").parquet(os.path.join(sf_tmp, "embeddings.parquet"))
    from sandbox_data_pipeline_spark.queries.similarity import q_auc_score

    return q_auc_score(spark, sf_tmp).collect()[0]


def test_auc_perfect_separation(spark, tmp_path):
    # positives (label<5) all score higher than negatives -> AUC 1.0
    rows = [(0.1, 9), (0.2, 8), (0.8, 1), (0.9, 0)]
    r = _auc_rows(spark, str(tmp_path), rows)
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 1.0)


def test_auc_with_ties_half_credit(spark, tmp_path):
    # one positive and one negative share a score: that pair
    # contributes 1/2 -> AUC = (1 + 0.5)/2 = 0.75 with 1 pos vs 2 neg:
    # pairs: (pos,neg1 lower) = 1, (pos,neg2 tied) = 0.5 -> 1.5/2
    rows = [(0.1, 9), (0.5, 8), (0.5, 1)]
    r = _auc_rows(spark, str(tmp_path), rows)
    assert (r.n_pos, r.n_neg) == (1, 2)
    assert abs(r.auc - 0.75) < 1e-9


def test_auc_random_is_half(spark, tmp_path):
    # positives at the extremes, negatives in the middle: of the four
    # (pos, neg) pairs exactly two have the positive ranked higher
    rows = [(0.1, 0), (0.2, 9), (0.3, 8), (0.4, 1)]
    r = _auc_rows(spark, str(tmp_path), rows)
    assert abs(r.auc - 0.5) < 1e-9


def test_calibration_bins_cover_and_count(spark, tmp_path):
    import os

    rows = [(i / 10.0, i) for i in range(10)]
    df = spark.createDataFrame(
        [(i, [float(s)] + [0.0] * 3, lab) for i, (s, lab) in enumerate(rows)],
        "vec_id long, embedding array<float>, label int",
    )
    df.write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )
    from sandbox_data_pipeline_spark.queries.similarity import (
        q_calibration_bins,
    )

    out = {r.bin: r for r in q_calibration_bins(spark, str(tmp_path)).collect()}
    assert sum(r.n for r in out.values()) == 10
    assert set(out) <= set(range(10))
    # scores 0.0-0.4 have labels 0-4 (positive): low bins pure positive
    assert out[0].pos_rate == 1.0
    assert out[9].pos_rate == 0.0
