"""Invariant checks for the behavioral-analytics queries."""

from __future__ import annotations

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.queries.analytics import (
    q_dq_referential,
    q_grouping_sets,
    q_retention_cohorts,
    q_rfm_segments,
)


def test_retention_week0_counts_every_user(spark, sf_dir):
    rows = q_retention_cohorts(spark, sf_dir).collect()
    week0 = sum(r.active_users for r in rows if r.week_since == 0)
    users = table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert week0 == users  # every user is active in their own cohort week
    assert all(r.week_since >= 0 for r in rows)


def test_rfm_partitions_customers(spark, sf_dir):
    rows = q_rfm_segments(spark, sf_dir).collect()
    custs = table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    assert sum(r.customers for r in rows) == custs


def test_grouping_sets_grains(spark, sf_dir):
    rows = q_grouping_sets(spark, sf_dir).collect()
    li_cnt = table(spark, sf_dir, "lineitem").count()
    # grand-total row (both columns grouped out) counts everything once
    totals = [r for r in rows if r.l_returnflag is None and r.l_linestatus is None]
    assert len(totals) == 1 and totals[0].line_cnt == li_cnt
    # each single-column grain also partitions the table
    for grain_col in ("l_returnflag", "l_linestatus"):
        grain_rows = [r for r in rows if r[grain_col] is not None]
        assert sum(r.line_cnt for r in grain_rows) == li_cnt


def test_referential_integrity_clean_corpus(spark, sf_dir):
    rows = {r.relation: r.orphan_rows for r in q_dq_referential(spark, sf_dir).collect()}
    assert len(rows) == 5
    # the synthetic star schema is referentially intact
    assert all(v == 0 for v in rows.values())


def test_unpivot_inverts_wide(spark, sf_dir):
    from sandbox_data_pipeline_spark.queries.analytics import q_unpivot

    rows = q_unpivot(spark, sf_dir).collect()
    segs = {r.c_mktsegment for r in rows}
    assert all(
        len([r for r in rows if r.c_mktsegment == s]) == 3 for s in segs
    )  # 3 measures per segment
    by = {(r.c_mktsegment, r.measure): r.value for r in rows}
    for s in segs:
        assert by[(s, "min_bal")] <= by[(s, "max_bal")]


def test_safe_casts_quarantines_instead_of_throwing(spark, sf_dir):
    from sandbox_data_pipeline_spark.queries.analytics import q_safe_casts

    rows = q_safe_casts(spark, sf_dir).collect()
    assert sum(r.n_bogus_parsed for r in rows) == 0  # blob never parses
    total = sum(r.n_rows for r in rows)
    assert sum(r.n_k_parsed for r in rows) == total  # k always parses
    assert sum(r.n_ratio_ok for r in rows) < total  # some /0 quarantined


def test_group_quantiles_ordered(spark, sf_dir):
    from sandbox_data_pipeline_spark.queries.analytics import q_group_quantiles

    for r in q_group_quantiles(spark, sf_dir).collect():
        assert r.p25 <= r.p50 <= r.p75


def test_hll_rollup_merge_matches_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.queries.analytics import q_hll_rollup

    est = {r.event_type: r.est_users for r in q_hll_rollup(spark, sf_dir).collect()}
    exact = {
        r.event_type: r.n
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        # HLL default lgConfigK=12 → ~1.6% relative error; sketch union
        # is lossless w.r.t. the individual sketches
        assert abs(est[t] - n) / n < 0.05, (t, est[t], n)


def test_mad_median_is_a_data_value(spark, sf_dir):
    from pyspark.sql import functions as F

    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.queries.analytics import q_mad_anomalies

    rows = q_mad_anomalies(spark, sf_dir).collect()
    assert rows
    e = table(spark, sf_dir, "events")
    for r in rows:
        # exact order statistic => the median is an actual data value
        hit = e.where(
            (F.col("event_type") == r.event_type) & (F.col("value") == r.median_value)
        ).count()
        assert hit >= 1, (r.event_type, r.median_value)
        assert r.mad >= 0
        assert 0 <= r.n_anomalies < r.n_total


def test_mad_flags_injected_outlier(spark):
    from pyspark.sql import functions as F

    from sandbox_data_pipeline_spark.operators.dq import mad_anomaly_report

    # a tight cluster plus one wild point: only the wild point is
    # beyond 3 MAD of the median
    base = spark.range(101).select(
        F.lit("t").alias("g"), (F.col("id") % 11 / 10.0 + 100.0).alias("v")
    )
    wild = spark.range(1).select(F.lit("t").alias("g"), F.lit(1e9).alias("v"))
    rep = mad_anomaly_report(base.union(wild), "g", "v", k=3.0).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r.n_total == 102
    assert 100.0 <= r.median_value <= 101.0
    assert r.n_anomalies == 1


def test_skew_report_hot_key_and_median(spark):
    from sandbox_data_pipeline_spark.operators.dq import skew_report

    # keys: a×8, b×2, c×2, d×1 → median key count = 2, hot share 8/13
    rows = [(i, "a") for i in range(8)] + [(8, "b"), (9, "b"), (10, "c"), (11, "c"), (12, "d")]
    df = spark.createDataFrame(rows, "id long, k string")
    got = skew_report(df, "k", top_n=2).collect()
    assert [r.key_value for r in got] == ["a", "b"]
    top = got[0]
    assert top.cnt == 8 and abs(top.share - round(8 / 13, 6)) < 1e-9
    assert top.vs_median == 4.0  # 8 / median(2)


def test_quality_sweep_monotone_retention(spark):
    from sandbox_data_pipeline_spark.queries.text import q_quality_sweep

    rows = sorted(
        q_quality_sweep(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.threshold,
    )
    docs = [r.docs_kept for r in rows]
    toks = [r.tokens_kept for r in rows]
    assert docs == sorted(docs, reverse=True)  # higher cutoff keeps fewer docs
    assert toks == sorted(toks, reverse=True)
    assert docs[0] > 0


def test_profile_table_long_form(spark):
    from sandbox_data_pipeline_spark.operators.dq import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")], "id long, tag string"
    )
    got = {r.column: r for r in profile_table(df, ["id", "tag"]).collect()}
    assert got["id"].null_rate == 0.0 and got["id"].n_distinct == 4
    assert got["tag"].null_rate == 0.25 and got["tag"].n_distinct == 2
    assert got["tag"].mode_str == "a" and got["tag"].min_str == "a" and got["tag"].max_str == "b"


def test_ewma_closed_form_equals_recursion(spark):
    import datetime as dt

    from sandbox_data_pipeline_spark.queries import analytics as qa

    t0 = dt.datetime(2026, 1, 1)
    xs = [10, 10, 30, 10, 10]
    rows = []
    eid = 0
    for i, x in enumerate(xs):
        for _ in range(x):
            rows.append((eid, t0 + dt.timedelta(hours=i), 1, "a", 0.0, "{}"))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    orig = qa.table
    try:
        qa.table = lambda spark, sf_dir, name: events
        got = {r.hour_ts.hour: r for r in qa.q_ewma_smooth(spark, "unused").collect()}
    finally:
        qa.table = orig
    # reference recursion
    alpha = qa.EWMA_ALPHA
    ew = xs[0]
    expect = [ew]
    for x in xs[1:]:
        ew = alpha * x + (1 - alpha) * ew
        expect.append(ew)
    for i, e in enumerate(expect):
        assert abs(got[i].ewma - round(e, 4)) < 1e-9, (i, got[i].ewma, e)
    # the spike hour carries the largest deviation
    assert max(range(5), key=lambda i: got[i].deviation) == 2


def test_numeric_corr_matches_numpy(spark):
    """Pearson matrix vs numpy.corrcoef on the same parquet."""
    import numpy as np
    import pandas as pd

    from sandbox_data_pipeline_spark.queries.analytics import (
        CORR_COLS,
        q_numeric_corr,
    )

    sf = "/root/testdata/sf0.001"
    pdf = pd.read_parquet(f"{sf}/lineitem.parquet")[CORR_COLS].astype(float)
    R = np.corrcoef(pdf.to_numpy().T)
    got = {(r.col_a, r.col_b): r.pearson_r for r in q_numeric_corr(spark, sf).collect()}
    assert len(got) == 6
    for (a, b), r in got.items():
        i, j = CORR_COLS.index(a), CORR_COLS.index(b)
        assert abs(r - R[i, j]) < 1e-9, (a, b)
        assert -1.0 <= r <= 1.0


def test_linear_fit_matches_numpy(spark):
    """Per-segment OLS vs numpy.polyfit on the same parquet (in cents,
    matching the operator's scale-invariant contract)."""
    import numpy as np
    import pandas as pd

    from sandbox_data_pipeline_spark.queries.analytics import q_linear_fit

    sf = "/root/testdata/sf0.001"
    pdf = pd.read_parquet(f"{sf}/lineitem.parquet")
    got = {r["seg"]: r for r in q_linear_fit(spark, sf).collect()}
    for seg, grp in pdf.groupby("l_returnflag"):
        x = (grp["l_quantity"].astype(float) * 100).to_numpy()
        y = (grp["l_extendedprice"].astype(float) * 100).to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        row = got[seg]
        assert row["n_rows"] == len(grp)
        assert abs(row["slope"] - slope) < abs(slope) * 1e-6 + 1e-9
        assert abs(row["intercept"] - intercept) < abs(intercept) * 1e-6 + 1e-6
        assert abs(row["r2"] - r * r) < 1e-9
