"""Data-quality report query (D1): one-pass table metrics over
lineitem + orders, oracle-checked. The same dq_metrics operator backs
the pipeline's check gate (plans/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.queries._envproof import stable_round
from sandbox_data_pipeline_spark.catalog import table


def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    li_m = li.agg(
        F.lit("lineitem").alias("table_name"),
        F.count(F.lit(1)).alias("row_cnt"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).alias("null_keys"),
        F.countDistinct("l_orderkey").alias("distinct_keys"),
        F.round(F.min("l_extendedprice"), 4).alias("min_val"),
        F.round(F.max("l_extendedprice"), 4).alias("max_val"),
    )
    o_m = o.agg(
        F.lit("orders").alias("table_name"),
        F.count(F.lit(1)).alias("row_cnt"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_keys"),
        F.countDistinct("o_orderkey").alias("distinct_keys"),
        F.round(F.min("o_totalprice"), 4).alias("min_val"),
        F.round(F.max("o_totalprice"), 4).alias("max_val"),
    )
    return li_m.unionAll(o_m)


QUERIES = {"q_dq_report": q_dq_report}

ORACLE = {
    "q_dq_report": """
    SELECT 'lineitem' AS table_name,
           count(*) AS row_cnt,
           CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_keys,
           count(DISTINCT l_orderkey) AS distinct_keys,
           round(min(l_extendedprice), 4) AS min_val,
           round(max(l_extendedprice), 4) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'orders', count(*),
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderkey),
           round(min(o_totalprice), 4), round(max(o_totalprice), 4)
    FROM orders
    """,
}


def q_dq_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative rule suite over lineitem — one aggregation pass for
    all rules (operators/dq.py: check_suite)."""
    from sandbox_data_pipeline_spark.operators.dq import check_suite

    li = table(spark, sf_dir, "lineitem")
    checks = [
        ("quantity_in_range", ~F.col("l_quantity").between(1, 50)),
        ("positive_price", F.col("l_extendedprice") <= 0),
        ("discount_bounds", ~F.col("l_discount").between(0.0, 1.0)),
        ("tax_nonnegative", F.col("l_tax") < 0),
        ("orderkey_not_null", F.col("l_orderkey").isNull()),
    ]
    return check_suite(li, checks)


_DQ_SUITE_ORACLE = """
WITH m AS (
  SELECT count(*) AS total,
         sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END) AS c0,
         sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 1.0) THEN 1 ELSE 0 END) AS c2,
         sum(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END) AS c3,
         sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS c4
  FROM lineitem
)
SELECT 'quantity_in_range' AS check_name, CAST(c0 AS BIGINT) AS violations, total AS total_rows, c0 = 0 AS passed FROM m
UNION ALL SELECT 'positive_price', CAST(c1 AS BIGINT), total, c1 = 0 FROM m
UNION ALL SELECT 'discount_bounds', CAST(c2 AS BIGINT), total, c2 = 0 FROM m
UNION ALL SELECT 'tax_nonnegative', CAST(c3 AS BIGINT), total, c3 = 0 FROM m
UNION ALL SELECT 'orderkey_not_null', CAST(c4 AS BIGINT), total, c4 = 0 FROM m
"""

QUERIES["q_dq_suite"] = q_dq_suite
ORACLE["q_dq_suite"] = _DQ_SUITE_ORACLE


def q_dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness check: per event_type, latest event and its lag behind
    the table-wide watermark (the check that catches a stalled source
    branch). One partial-combined aggregate + a broadcast scalar max."""
    e = table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.max("ts").alias("latest_ts"), F.count(F.lit(1)).alias("n_rows")
    )
    overall = e.agg(F.max("ts").alias("_watermark"))
    return per_type.crossJoin(F.broadcast(overall)).select(
        "event_type",
        "n_rows",
        "latest_ts",
        (
            F.unix_timestamp("_watermark") - F.unix_timestamp("latest_ts")
        ).alias("lag_seconds"),
    )


_DQ_FRESHNESS_ORACLE = """
WITH per_type AS (
  SELECT event_type, max(ts) AS latest_ts, count(*) AS n_rows
  FROM events GROUP BY event_type
),
overall AS (SELECT max(ts) AS watermark FROM events)
SELECT event_type, n_rows, latest_ts,
       CAST(date_diff('second', latest_ts, watermark) AS BIGINT) AS lag_seconds
FROM per_type, overall
"""

QUERIES["q_dq_freshness"] = q_dq_freshness
ORACLE["q_dq_freshness"] = _DQ_FRESHNESS_ORACLE


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics on events.event_type: hottest keys
    with share-of-table and ratio-to-median-key — the pre-flight check
    before shipping a join/groupBy on a candidate key at 100 TB."""
    from sandbox_data_pipeline_spark.operators.dq import skew_report

    return skew_report(table(spark, sf_dir, "events"), key_col="event_type", top_n=10)


_SKEW_ORACLE = """
WITH counts AS (
  SELECT CAST(event_type AS VARCHAR) AS key_value, count(*) AS cnt
  FROM events GROUP BY 1
),
tot AS (SELECT sum(cnt) AS total, count(*) AS nkeys FROM counts),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt, key_value) AS rn FROM counts
),
med AS (
  SELECT avg(cnt) AS median_cnt FROM ranked, tot
  WHERE rn = CAST(floor((nkeys + 1) / 2.0) AS BIGINT)
     OR rn = CAST(floor((nkeys + 2) / 2.0) AS BIGINT)
)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, key_value) AS INTEGER) AS rank,
       key_value, cnt,
       (floor((cnt / tot.total) * 1000000.0 + 0.5) / 1000000.0) AS share,
       (floor((cnt / med.median_cnt) * 10000.0 + 0.5) / 10000.0) AS vs_median
FROM counts, tot, med
ORDER BY rank LIMIT 10
"""

QUERIES["q_skew_report"] = q_skew_report
ORACLE["q_skew_report"] = _SKEW_ORACLE


K_ANON = 5


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier set (lang, source):
    the privacy pre-flight before releasing a derived dataset — how
    many equivalence classes fall below k, and what fraction of rows
    they cover. One partial-combined groupBy on the QI columns, then a
    |classes|-row aggregate."""
    d = table(spark, sf_dir, "documents")
    classes = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("cls_n"))
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("cls_n").alias("k_min"),
        F.sum(F.when(F.col("cls_n") < K_ANON, 1).otherwise(0)).alias("n_below_k"),
        stable_round(
            F.sum(F.when(F.col("cls_n") < K_ANON, F.col("cls_n")).otherwise(0))
            / F.sum("cls_n"),
            6,
        ).alias("rows_below_k_frac"),
    )


_K_ANON_ORACLE = f"""
WITH classes AS (
  SELECT lang, source, count(*) AS cls_n FROM documents GROUP BY 1, 2
)
SELECT count(*) AS n_classes,
       min(cls_n) AS k_min,
       CAST(sum(CASE WHEN cls_n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT) AS n_below_k,
       (floor((sum(CASE WHEN cls_n < {K_ANON} THEN cls_n ELSE 0 END) / sum(cls_n)) * 1000000.0 + 0.5) / 1000000.0)
         AS rows_below_k_frac
FROM classes
"""

QUERIES["q_k_anonymity"] = q_k_anonymity
ORACLE["q_k_anonymity"] = _K_ANON_ORACLE


def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-over-snapshot profile drift: compare week 1 vs week 2
    of the events stream per event_type — volumes, distinct actors,
    and value means — plus a relative volume-drift percentage. This is
    the D1 metric suite turned longitudinal: the check a pipeline runs
    before trusting a new ingest window ("did checkout volume drop
    40%?", "did the value distribution shift?").

    Scale: ONE scan with conditional aggregates (map-side partials for
    everything except the two distinct counts, which AQE shuffles on
    event_type — ~tens of groups); the time predicate prunes the scan
    to two weeks before any aggregation. Means are summed in decimal
    so the comparison is exact across engines."""
    ev = table(spark, sf_dir, "events")
    wk1 = F.col("ts") < F.lit("2024-01-08").cast("timestamp")
    v = F.col("value").cast("decimal(18,4)")
    return (
        ev.where(F.col("ts") < F.lit("2024-01-15").cast("timestamp"))
        .groupBy("event_type")
        .agg(
            F.count(F.when(wk1, 1)).alias("n_wk1"),
            F.count(F.when(~wk1, 1)).alias("n_wk2"),
            F.countDistinct(F.when(wk1, F.col("user_id"))).alias("users_wk1"),
            F.countDistinct(F.when(~wk1, F.col("user_id"))).alias("users_wk2"),
            (F.sum(F.when(wk1, v)) / F.count(F.when(wk1, 1)))
            .cast("decimal(18,4)")
            .alias("avg_val_wk1"),
            (F.sum(F.when(~wk1, v)) / F.count(F.when(~wk1, 1)))
            .cast("decimal(18,4)")
            .alias("avg_val_wk2"),
        )
        .withColumn(
            "vol_drift_pct",
            ((F.col("n_wk2") - F.col("n_wk1")) * F.lit(10000) / F.col("n_wk1"))
            .cast("decimal(18,2)"),
        )
    )


ORACLE["q_profile_drift"] = """
SELECT event_type,
       count(*) FILTER (WHERE wk1) AS n_wk1,
       count(*) FILTER (WHERE NOT wk1) AS n_wk2,
       count(DISTINCT user_id) FILTER (WHERE wk1) AS users_wk1,
       count(DISTINCT user_id) FILTER (WHERE NOT wk1) AS users_wk2,
       CAST(sum(CAST(value AS DECIMAL(18,4))) FILTER (WHERE wk1)
            / count(*) FILTER (WHERE wk1) AS DECIMAL(18,4)) AS avg_val_wk1,
       CAST(sum(CAST(value AS DECIMAL(18,4))) FILTER (WHERE NOT wk1)
            / count(*) FILTER (WHERE NOT wk1) AS DECIMAL(18,4)) AS avg_val_wk2,
       CAST((count(*) FILTER (WHERE NOT wk1) - count(*) FILTER (WHERE wk1))
            * 10000 / count(*) FILTER (WHERE wk1) AS DECIMAL(18,2)) AS vol_drift_pct
FROM (
  SELECT event_type, user_id, value,
         ts < TIMESTAMP '2024-01-08' AS wk1
  FROM events
  WHERE ts < TIMESTAMP '2024-01-15'
)
GROUP BY event_type
"""
QUERIES["q_profile_drift"] = q_profile_drift


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    forensic DQ check: natural multi-scale amounts follow
    P(d) = log10(1+1/d); fabricated or truncated feeds don't. Emits
    per-digit observed vs expected shares and the chi-square
    contribution, all from ONE map-side digit extraction + 9-group
    aggregate (decimal-exact shares; only the final log is floating
    point, rounded on both engines)."""
    o = table(spark, sf_dir, "orders")
    d = o.select(
        F.substring(F.col("o_totalprice").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    ).where(F.col("digit") >= 1)
    n = F.sum("n_obs").over(Window.partitionBy())
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .withColumn("share_obs", (F.col("n_obs") * 10000 / n).cast("decimal(18,4)"))
        .withColumn(
            "share_benford",
            F.round(F.log10(1 + 1 / F.col("digit")) * 10000, 4).cast(
                "decimal(18,4)"
            ),
        )
        .withColumn(
            "chi2_x1000",
            F.round(
                F.pow(
                    F.col("share_obs").cast("double")
                    - F.col("share_benford").cast("double"),
                    2,
                )
                / F.col("share_benford").cast("double")
                * 1000,
                2,
            ).cast("decimal(18,2)"),
        )
    )


ORACLE["q_benford_audit"] = """
WITH d AS (
  SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders
), f AS (SELECT digit FROM d WHERE digit >= 1),
g AS (
  SELECT digit, count(*) AS n_obs, sum(count(*)) OVER () AS n
  FROM f GROUP BY digit
)
SELECT digit, n_obs,
       CAST(n_obs * 10000 / n AS DECIMAL(18,4)) AS share_obs,
       CAST(round(log10(1 + 1.0 / digit) * 10000, 4) AS DECIMAL(18,4)) AS share_benford,
       CAST(round(pow(CAST(CAST(n_obs * 10000 / n AS DECIMAL(18,4)) AS DOUBLE)
                      - CAST(CAST(round(log10(1 + 1.0 / digit) * 10000, 4) AS DECIMAL(18,4)) AS DOUBLE), 2)
                  / CAST(CAST(round(log10(1 + 1.0 / digit) * 10000, 4) AS DECIMAL(18,4)) AS DOUBLE) * 1000, 2) AS DECIMAL(18,2)) AS chi2_x1000
FROM g
"""
QUERIES["q_benford_audit"] = q_benford_audit


# --- Governed export: masking / pseudonymization -----------------------------

_MASK_SALT = "exp2024"
_MASK_MAXK = 2000  # export slice bound (custkey)


def q_masked_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-masking policy applied at export time — the governance
    twin of q_pii_scrub (which regex-scrubs free text): direct
    identifiers are PSEUDONYMIZED with a salted-hash token (stable
    joins across exports without exposing the key — sha2 is identical
    hex on both engines), the display name is dropped to a token, and
    the quasi-identifier account balance is GENERALIZED to $1000 bands
    so the export composes with the k-anonymity audit
    (q_k_anonymity). Pure built-in expressions — the masking is one
    narrow projection, no shuffle at any scale."""
    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") < _MASK_MAXK)
    return c.select(
        F.substring(
            F.sha2(F.concat(F.lit(_MASK_SALT), F.col("c_custkey").cast("string")), 256),
            1,
            16,
        ).alias("cust_token"),
        F.substring(
            F.sha2(F.concat(F.lit(_MASK_SALT), F.col("c_name")), 256), 1, 16
        ).alias("name_token"),
        F.col("c_nationkey").cast("int").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal").cast("double") / 1000.0)
        .cast("long")
        .alias("bal_band_k"),
    )


ORACLE["q_masked_export"] = f"""
SELECT substr(sha256('{_MASK_SALT}' || CAST(c_custkey AS VARCHAR)), 1, 16)
         AS cust_token,
       substr(sha256('{_MASK_SALT}' || c_name), 1, 16) AS name_token,
       c_nationkey AS nation,
       c_mktsegment AS segment,
       CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000.0) AS BIGINT) AS bal_band_k
FROM customer WHERE c_custkey < {_MASK_MAXK}
"""
QUERIES["q_masked_export"] = q_masked_export


L_DIVERSITY = 3
L_DIV_BUCKET = 200


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit extending q_k_anonymity: within each
    quasi-identifier class (lang, source), how many DISTINCT values
    of the sensitive attribute (doc-length bucket, width 200) exist —
    a class that is k-anonymous but 1-diverse still leaks the
    sensitive value. Per-class report with a below-l flag.

    One partial-combined groupBy on (QI, sensitive bucket), then a
    class-level count — both shrink monotonically; no window."""
    d = table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.floor(F.col("n_chars") / L_DIV_BUCKET).alias("sens"),
    )
    per_sens = d.groupBy("lang", "source", "sens").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        per_sens.groupBy("lang", "source")
        .agg(
            F.sum("n").alias("cls_n"),
            F.count(F.lit(1)).alias("l_distinct"),
        )
        .select(
            "lang",
            "source",
            "cls_n",
            "l_distinct",
            F.when(F.col("l_distinct") < L_DIVERSITY, 1)
            .otherwise(0)
            .cast("int")
            .alias("below_l"),
        )
    )


_L_DIV_ORACLE = f"""
WITH per_sens AS (
  SELECT lang, source, CAST(floor(n_chars / {L_DIV_BUCKET}) AS BIGINT) AS sens,
         count(*) AS n
  FROM documents GROUP BY 1, 2, 3
)
SELECT lang, source,
       CAST(sum(n) AS BIGINT) AS cls_n,
       count(*) AS l_distinct,
       CAST(CASE WHEN count(*) < {L_DIVERSITY} THEN 1 ELSE 0 END AS INTEGER) AS below_l
FROM per_sens GROUP BY 1, 2
"""

QUERIES["q_l_diversity"] = q_l_diversity
ORACLE["q_l_diversity"] = _L_DIV_ORACLE


# --- t-closeness (completes the k-anon / l-div / t-close triad) -------------

T_CLOSE_X10000 = 3000  # flag classes with TV distance > 0.30


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit completing the privacy triad: per
    quasi-identifier class (lang, source), the total-variation
    distance between the class's sensitive-attribute distribution
    (doc-length bucket, as in q_l_diversity) and the GLOBAL
    distribution — a class can be k-anonymous and l-diverse while its
    sensitive distribution still leaks (all its lengths in one tail).

    Exact arithmetic by clearing denominators: TV = (1/2)·Σ_s
    |n_cs/n_c − N_s/N| = Σ_s |n_cs·N − N_s·n_c| / (2·n_c·N), an
    integer numerator summed over the full sensitive domain (absent
    buckets contribute N_s·n_c) and ONE dec_ratio. Scale: one
    partial-combined groupBy onto (QI, bucket); the global bucket
    distribution is a broadcast (|buckets| rows); the class×bucket
    completion is a broadcast cross join bounded by |classes|×
    |buckets|, never corpus-sized."""
    from sandbox_data_pipeline_spark.queries._envproof import dec_ratio

    d = table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.floor(F.col("n_chars") / L_DIV_BUCKET).alias("sens"),
    )
    per = d.groupBy("lang", "source", "sens").agg(
        F.count(F.lit(1)).alias("n_cs")
    )
    cls = per.groupBy("lang", "source").agg(F.sum("n_cs").alias("n_c"))
    glob = per.groupBy("sens").agg(F.sum("n_cs").alias("n_s"))
    n_tot = per.agg(F.sum("n_cs").alias("n_tot"))
    full = (
        cls.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(n_tot))
        .join(per, ["lang", "source", "sens"], "left")
        .select(
            "lang",
            "source",
            "n_c",
            "n_tot",
            F.abs(
                F.coalesce(F.col("n_cs"), F.lit(0)) * F.col("n_tot")
                - F.col("n_s") * F.col("n_c")
            ).alias("dev"),
        )
    )
    agg = full.groupBy("lang", "source").agg(
        F.max("n_c").alias("cls_n"),
        F.sum("dev").alias("num"),
        F.max("n_tot").alias("n_tot"),
    )
    t = dec_ratio(
        F.col("num"),
        F.lit(2) * F.col("cls_n").cast("decimal(38,0)") * F.col("n_tot"),
        0,
        4,
    )
    return agg.select(
        "lang",
        "source",
        "cls_n",
        t.alias("t_close"),
        F.when(t * 10000 > T_CLOSE_X10000, 1).otherwise(0).cast("int").alias("above_t"),
    )


def _oracle_t_closeness() -> str:
    from sandbox_data_pipeline_spark.queries._envproof import dec_ratio_sql

    t = dec_ratio_sql("num", "2 * cls_n * n_tot", 0, 4)
    return f"""
WITH per AS (
  SELECT lang, source, CAST(floor(n_chars / {L_DIV_BUCKET}) AS BIGINT) AS sens,
         count(*) AS n_cs
  FROM documents GROUP BY 1, 2, 3
),
cls AS (SELECT lang, source, sum(n_cs) AS n_c FROM per GROUP BY 1, 2),
gl AS (SELECT sens, sum(n_cs) AS n_s FROM per GROUP BY 1),
nt AS (SELECT sum(n_cs) AS n_tot FROM per),
full_ AS (
  SELECT cls.lang, cls.source, n_c, n_tot,
         abs(COALESCE(per.n_cs, 0) * n_tot - gl.n_s * n_c) AS dev
  FROM cls CROSS JOIN gl CROSS JOIN nt
  LEFT JOIN per ON per.lang = cls.lang AND per.source = cls.source
               AND per.sens = gl.sens
),
agg AS (
  SELECT lang, source, CAST(max(n_c) AS BIGINT) AS cls_n,
         CAST(sum(dev) AS BIGINT) AS num,
         CAST(max(n_tot) AS BIGINT) AS n_tot
  FROM full_ GROUP BY 1, 2
)
SELECT lang, source, cls_n,
       {t} AS t_close,
       CAST(CASE WHEN {t} * 10000 > {T_CLOSE_X10000} THEN 1 ELSE 0 END
            AS INTEGER) AS above_t
FROM agg
"""


QUERIES["q_t_closeness"] = q_t_closeness
ORACLE["q_t_closeness"] = _oracle_t_closeness()
