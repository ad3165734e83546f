"""General relational query surface (SURVEY.md §2.11 gap-fillers).

The reference's tables form a star schema its consumers query through
the warehouse; these are the table-stakes operators re-expressed as
Catalyst logical plans. Every query here is pure DataFrame API — no
UDFs, no collects — so predicate pushdown, column pruning, partial
aggregation, broadcast/SMJ selection, and AQE all apply unmodified at
any scale factor.

Floating-point aggregates are rounded to 4 decimals on BOTH the Spark
and oracle side: cross-engine double accumulation order differs at the
ulp level and would otherwise break the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.queries._envproof import dec_ratio, dec_ratio_sql, stable_round
from sandbox_data_pipeline_spark.operators.sketch import kmv_estimate_sql
from sandbox_data_pipeline_spark.catalog import table


# --- scans + filters -------------------------------------------------------

def q_filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row filter + narrow projection; predicate and columns reach the
    parquet scan (PushedFilters / 4-column ReadSchema in .explain)."""
    return (
        table(spark, sf_dir, "lineitem")
        .where((F.col("l_quantity") >= 5) & (F.col("l_quantity") <= 30) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


def q_delete_run_hr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's partition-scoped delete (F1: `delete from t where
    run_hr = X`, write_weather_to_bigquery.sql:51-53) expressed as the
    complementary filter — rows that survive the delete — aggregated to
    keep the compared result compact."""
    hr = "2024-01-03 00:00:00"
    return (
        table(spark, sf_dir, "events")
        .where(F.date_trunc("hour", F.col("ts")) != F.to_timestamp(F.lit(hr)))
        .groupBy("event_type")
        .agg(F.count("*").alias("surviving_rows"))
    )


# --- joins (J-series + §2.11 q_join_*) -------------------------------------

def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name", "o_totalprice", "c_mktsegment")
    )


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select("c_custkey", "c_name", "o_orderkey")
    )


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having at least one order > 300 (LEFT SEMI — EXISTS)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders at all (LEFT ANTI — NOT EXISTS)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dim join with an explicit broadcast hint: `part` is a dim
    table; at 100 TB the fact side never shuffles for this join."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").alias("line_cnt"),
        )
    )


def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted equi-join (operators/skew.py): row-identical to
    the plain join — verified by sharing the plain-join oracle — while
    spreading each hot key over salt_factor shuffle partitions."""
    from sandbox_data_pipeline_spark.operators.skew import salted_join

    l = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    return (
        salted_join(l, o, on="orderkey", salt_factor=8)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way snowflake join customer→nation→region with tiny dims
    broadcast; Catalyst collapses this into two broadcast-hash joins on
    an unshuffled probe side."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("cust_cnt"),
            dec_ratio(F.sum("c_acctbal"), F.count("*"), 2, 4).alias("avg_bal"),
        )
    )


# --- aggregations (§2.6) ---------------------------------------------------

def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: two-phase HashAggregate with
    map-side partial combine; shuffles only |groups| rows per task."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.to_timestamp(F.lit("2024-12-01 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            dec_ratio(F.sum("l_quantity"), F.count("*"), 2, 4).alias("avg_qty"),
            dec_ratio(F.sum("l_discount"), F.count("*"), 2, 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("distinct_custs"),
        F.count("*").alias("order_cnt"),
        F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
    )


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — subtotal + grand-total rows."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count("*").alias("line_cnt"),
    )


def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via the KMV sketch —
    the oracle-replayable estimator (k smallest portable 60-bit hashes;
    every step integer arithmetic, so DuckDB replays the IDENTICAL
    sketch). HLL++'s registers are engine-internal and ungradeable;
    KMV serves the same role at 100 TB: fixed k·8-byte state per group,
    mergeable map-side, no exact-distinct shuffle of raw user ids."""
    from sandbox_data_pipeline_spark.operators.sketch import (
        kmv_estimate_col,
        kmv_sketch,
    )

    e = table(spark, sf_dir, "events")
    sk = kmv_sketch(e, "event_type", "user_id")
    cnt = e.groupBy("event_type").agg(F.count("*").alias("event_cnt"))
    return (
        sk.withColumnRenamed("grp", "event_type")
        .join(cnt, "event_type")
        .select(
            "event_type",
            kmv_estimate_col(F.col("n_kept"), F.col("kth_value")).alias(
                "approx_users"
            ),
            "event_cnt",
        )
    )


# --- windows / sorts / top-k (§2.7) ---------------------------------------

def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 top-K per group via row_number; the rank filter prunes before
    any downstream op, and only one shuffle (by segment) is needed."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rank_in_seg", F.row_number().over(w))
        .where(F.col("rank_in_seg") <= 3)
        .select("c_mktsegment", "rank_in_seg", "c_custkey", "c_name", "c_acctbal")
    )


def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (ROWS UNBOUNDED PRECEDING..CURRENT)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_total"),
    )


def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 'most recent per key' (anomalo_datahub_integration.py:63 picks
    the latest check run) — row_number desc over event time."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", F.round("value", 4).alias("value"))
    )


def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT → TakeOrderedAndProject: per-partition
    top-K then a K-row merge on the driver, never a full sort."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(20)
    )


def q_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: the reference's 'top 5 cities' is computed upstream by a
    Lambda (dags/sandbox_data_pipeline.py:84-91); natively it's an
    order-limit."""
    c = table(spark, sf_dir, "customer")
    return (
        c.orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .select("c_custkey", "c_name", "c_acctbal")
        .limit(5)
    )


# --- set operations (§2.7 U1 + gap-fillers) --------------------------------

def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 (dags/test.py:131-133): UNION ALL of two heterogeneous selects
    normalized to one schema."""
    c = table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"), F.col("c_name").alias("name"), F.col("c_acctbal").alias("acctbal")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"), F.col("s_name").alias("name"), F.col("s_acctbal").alias("acctbal")
    )
    return c.unionAll(s)


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping-set combos."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count(F.lit(1)).alias("line_cnt"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch session windows (30-minute gap) per user over events —
    Spark's native session_window; the oracle reproduces the semantics
    with gaps-and-islands SQL (new session when the gap since the
    previous event is >= 30 min; session end = last event + gap)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


_SESSIONIZE_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM sess
GROUP BY user_id, sid
"""


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (operators/asof.py): each click event joined
    to the user's latest purchase at-or-before it. The oracle is
    DuckDB's native ASOF LEFT JOIN; the purchase side is pre-aggregated
    per (user, ts) so ties are deterministic on both engines."""
    from sandbox_data_pipeline_spark.operators.asof import asof_join

    e = table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.round("value", 4).alias("click_value")
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 4).alias("purchase_value"))
    )
    return asof_join(clicks, purchases, by="user_id", ts_col="ts")


_ASOF_ORACLE = """
WITH clicks AS (
  SELECT user_id, ts, event_id, round(value, 4) AS click_value
  FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, ts, round(max(value), 4) AS purchase_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
)
SELECT c.user_id, c.ts, c.event_id, c.click_value,
       p.ts AS ts_asof, p.purchase_value AS purchase_value_asof
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join (operators/range_join.py): errors within 24 h
    after each signup, aggregated per signup. The oracle is the naive
    inequality join — identical pairs, different (scalable) plan."""
    from sandbox_data_pipeline_spark.operators.range_join import range_join

    e = table(spark, sf_dir, "events")
    signups = e.where(F.col("event_type") == "signup").select("user_id", "ts", "event_id")
    errors = e.where(F.col("event_type") == "error").select("user_id", "ts", "value")
    pairs = range_join(signups, errors, by="user_id", lower_s=0, upper_s=86400)
    return pairs.groupBy("user_id", F.col("l_event_id").alias("signup_id")).agg(
        F.count(F.lit(1)).alias("errors_24h"),
        F.round(F.sum("r_value"), 4).alias("error_value_sum"),
    )


_RANGE_ORACLE = """
WITH s AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup'),
r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'error')
SELECT s.user_id, s.event_id AS signup_id,
       count(*) AS errors_24h,
       round(sum(r.value), 4) AS error_value_sum
FROM s JOIN r ON s.user_id = r.user_id
 AND r.ts >= s.ts AND r.ts <= s.ts + INTERVAL 24 HOUR
GROUP BY s.user_id, s.event_id
"""


def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate (operators/rollup.py):
    daily tier computed FROM the hourly tier (sums of sums), never from
    raw events. The oracle aggregates events directly to daily — the
    check proves cascaded re-aggregation is exact."""
    from sandbox_data_pipeline_spark.operators.rollup import (
        cascade,
        hourly_aggregate,
        present,
    )

    e = table(spark, sf_dir, "events")
    return present(cascade(hourly_aggregate(e), "day"))


_ROLLUP_CASCADE_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
       event_type,
       count(*) AS event_cnt,
       CAST(round(sum(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE) AS sum_value,
       CAST(round(sum(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE) / count(*) AS avg_value,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value
FROM events
GROUP BY 1, 2
"""


# --- SQL entry point: subquery forms ---------------------------------------
# Declared through spark.sql over registered views — the engine's SQL
# surface (the reference's query semantics all live in SQL files;
# SURVEY §0). Catalyst rewrites these to the same physical joins as the
# DataFrame API: IN → left-semi, EXISTS → left-semi with correlated
# predicate pulled up, scalar subquery → broadcast one-row relation.

_SUBQ_IN = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""

_SCALAR_SUBQ = """
SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
"""

_EXISTS_CORR = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
)
"""


def _register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> None:
    for t in names:
        table(spark, sf_dir, t).createOrReplaceTempView(t)


def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_SUBQ_IN)


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_views(spark, sf_dir, ("orders",))
    return spark.sql(_SCALAR_SUBQ)


def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_EXISTS_CORR)


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT (distinct set semantics) over nation keys."""
    cn = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    sn = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    inter = cn.intersect(sn).select(F.lit("intersect").alias("op"), "nationkey")
    exc = cn.subtract(sn).select(F.lit("except").alias("op"), "nationkey")
    return inter.unionAll(exc)


# --- scalar function families (P-series) -----------------------------------

def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 normalization (lower + space→underscore,
    dags/sandbox_data_pipeline.py:113) plus concat/length."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower(F.col("c_name")).alias("name_lower"),
        F.regexp_replace(F.lower(F.col("c_name")), " ", "_").alias("name_key"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("seg_name"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
    )


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 date_trunc + P12 run_hr-style date_format over order dates."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        F.date_format("o_orderdate", "yyyyMMddHH00").alias("run_hr"),
        F.year("o_orderdate").alias("order_year"),
        F.hour("o_orderdate").alias("order_hour"),
    )


def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 variant path extraction (json_data:location:name ↔
    get_json_object) + P4 cast, aggregated per event type."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count("*").alias("cnt"),
        )
    )


def q_run_hr_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12/T1: floor event time to the hour and format as the
    reference's run_hr key YYYYMMDDHH00
    (dags/sandbox_data_pipeline.py:75-81)."""
    e = table(spark, sf_dir, "events")
    return (
        e.select(F.date_format("ts", "yyyyMMddHH00").alias("run_hr"))
        .groupBy("run_hr")
        .agg(F.count("*").alias("event_cnt"))
    )


def q_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 hourly tumbling window as a batch query; the streaming module
    runs the identical aggregation via F.window + watermark."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("event_cnt"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "event_cnt", "sum_value")
    )


def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 CROSS JOIN UNNEST (write_cocktails_to_bigquery.sql:175-176):
    array→rows via explode, here over tokenized document text."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("token_cnt"))
    )


def q_nested_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2 struct build + nested-field access
    (write_weather_to_bigquery.sql:58-96 rebuilds `location` /
    `current.condition.text`): construct a struct, then project leaves
    back out."""
    c = table(spark, sf_dir, "customer")
    built = c.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
            F.struct(F.col("c_acctbal").alias("bal"), F.col("c_nationkey").alias("nat")).alias("account"),
        ).alias("info"),
    )
    return built.select(
        "c_custkey",
        F.col("info.name").alias("info_name"),
        F.col("info.segment").alias("info_segment"),
        F.col("info.account.bal").alias("info_bal"),
        F.col("info.account.nat").alias("info_nat"),
    )


QUERIES = {
    "q_filter_basic": q_filter_basic,
    "q_delete_run_hr": q_delete_run_hr,
    "q_join_inner": q_join_inner,
    "q_join_left": q_join_left,
    "q_join_semi": q_join_semi,
    "q_join_anti": q_join_anti,
    "q_join_broadcast": q_join_broadcast,
    "q_join_multi": q_join_multi,
    "q_join_salted": q_join_salted,
    "q_join_asof": q_join_asof,
    "q_join_range": q_join_range,
    "q_agg_basic": q_agg_basic,
    "q_agg_distinct": q_agg_distinct,
    "q_agg_rollup": q_agg_rollup,
    "q_agg_cube": q_agg_cube,
    "q_sessionize": q_sessionize,
    "q_rollup_cascade": q_rollup_cascade,
    "q_agg_approx": q_agg_approx,
    "q_window_rank": q_window_rank,
    "q_window_frame": q_window_frame,
    "q_latest_per_key": q_latest_per_key,
    "q_sort_limit": q_sort_limit,
    "q_top5": q_top5,
    "q_union_all": q_union_all,
    "q_subquery_in": q_subquery_in,
    "q_scalar_subquery": q_scalar_subquery,
    "q_exists_correlated": q_exists_correlated,
    "q_set_ops": q_set_ops,
    "q_string_funcs": q_string_funcs,
    "q_date_funcs": q_date_funcs,
    "q_json_funcs": q_json_funcs,
    "q_run_hr_derive": q_run_hr_derive,
    "q_window_hourly": q_window_hourly,
    "q_explode": q_explode,
    "q_nested_struct": q_nested_struct,
}

ORACLE = {
    "q_filter_basic": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity >= 5 AND l_quantity <= 30 AND l_returnflag = 'R'
    """,
    "q_delete_run_hr": """
        SELECT event_type, count(*) AS surviving_rows
        FROM events
        WHERE date_trunc('hour', ts) <> TIMESTAMP '2024-01-03 00:00:00'
        GROUP BY event_type
    """,
    "q_agg_cube": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               count(*) AS line_cnt
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q_sessionize": _SESSIONIZE_ORACLE,
    "q_rollup_cascade": _ROLLUP_CASCADE_ORACLE,
    "q_join_asof": _ASOF_ORACLE,
    "q_join_range": _RANGE_ORACLE,
    "q_subquery_in": _SUBQ_IN,
    "q_scalar_subquery": _SCALAR_SUBQ,
    "q_exists_correlated": _EXISTS_CORR,
    "q_join_salted": """
        SELECT o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               count(*) AS line_cnt
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    "q_join_inner": """
        SELECT o_orderkey, c_name, o_totalprice, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "q_join_left": """
        SELECT c_custkey, c_name, o_orderkey
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
    "q_join_semi": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300)
    """,
    "q_join_anti": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "q_join_broadcast": """
        SELECT p_brand,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               count(*) AS line_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "q_join_multi": f"""
        SELECT r_name, n_name, count(*) AS cust_cnt, {dec_ratio_sql('sum(c_acctbal)', 'count(*)', 2, 4)} AS avg_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "q_agg_basic": f"""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
               {dec_ratio_sql("sum(l_quantity)", "count(*)", 2, 4)} AS avg_qty,
               {dec_ratio_sql("sum(l_discount)", "count(*)", 2, 4)} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_agg_distinct": """
        SELECT o_orderpriority,
               count(DISTINCT o_custkey) AS distinct_custs,
               count(*) AS order_cnt,
               round(sum(o_totalprice), 4) AS sum_price
        FROM orders GROUP BY o_orderpriority
    """,
    "q_agg_rollup": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               count(*) AS line_cnt
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "q_window_rank": """
        SELECT c_mktsegment, rank_in_seg, c_custkey, c_name, c_acctbal FROM (
            SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
                   row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rank_in_seg
            FROM customer
        ) WHERE rank_in_seg <= 3
    """,
    "q_window_frame": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total
        FROM orders
    """,
    "q_latest_per_key": """
        SELECT user_id, event_id, ts, event_type, round(value, 4) AS value FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "q_sort_limit": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 20
    """,
    "q_top5": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 5
    """,
    "q_union_all": """
        SELECT 'customer' AS side, c_name AS name, c_acctbal AS acctbal FROM customer
        UNION ALL
        SELECT 'supplier' AS side, s_name AS name, s_acctbal AS acctbal FROM supplier
    """,
    "q_set_ops": """
        SELECT 'intersect' AS op, nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT
            SELECT s_nationkey AS nationkey FROM supplier
        )
        UNION ALL
        SELECT 'except' AS op, nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT
            SELECT s_nationkey AS nationkey FROM supplier
        )
    """,
    "q_string_funcs": """
        SELECT c_custkey,
               lower(c_name) AS name_lower,
               replace(lower(c_name), ' ', '_') AS name_key,
               c_mktsegment || ':' || c_name AS seg_name,
               length(c_name) AS name_len,
               substr(c_name, 1, 8) AS name_prefix
        FROM customer
    """,
    "q_date_funcs": """
        SELECT o_orderkey,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
               strftime(o_orderdate, '%Y%m%d%H00') AS run_hr,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(hour(o_orderdate) AS INTEGER) AS order_hour
        FROM orders
    """,
    "q_json_funcs": """
        SELECT event_type,
               round(avg(k), 4) AS avg_k,
               max(k) AS max_k,
               count(*) AS cnt
        FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events)
        GROUP BY event_type
    """,
    "q_run_hr_derive": """
        SELECT strftime(ts, '%Y%m%d%H00') AS run_hr, count(*) AS event_cnt
        FROM events GROUP BY 1
    """,
    "q_window_hourly": """
        SELECT date_trunc('hour', ts) AS hour_start, event_type,
               count(*) AS event_cnt, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q_explode": """
        SELECT token, count(*) AS token_cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ) WHERE token <> '' GROUP BY token
    """,
    "q_nested_struct": """
        SELECT c_custkey,
               info.name AS info_name,
               info.segment AS info_segment,
               info.account.bal AS info_bal,
               info.account.nat AS info_nat
        FROM (
            SELECT c_custkey,
                   struct_pack(name := c_name, segment := c_mktsegment,
                               account := struct_pack(bal := c_acctbal, nat := c_nationkey)) AS info
            FROM customer
        )
    """,
    "q_agg_approx": f"""
        WITH hashed AS (
          SELECT DISTINCT event_type AS grp,
                 CAST('0x' || substr(md5('kmv' || user_id), 1, 15) AS BIGINT) AS hv
          FROM events
        ),
        ranked AS (
          SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
          FROM hashed
        ),
        sk AS (
          SELECT grp, max(hv) AS kth, count(*) AS n_kept
          FROM ranked WHERE rn <= 256 GROUP BY grp
        ),
        cnt AS (SELECT event_type AS grp, count(*) AS event_cnt FROM events GROUP BY 1)
        SELECT sk.grp AS event_type,
               {kmv_estimate_sql("sk.n_kept", "sk.kth")} AS approx_users,
               cnt.event_cnt
        FROM sk JOIN cnt ON cnt.grp = sk.grp
    """,
}


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with DECLARED pivot values — the scale-correct form: an
    undeclared pivot runs an extra distinct-values job over the fact
    table before planning; declaring them keeps it one pass."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 4))
        .withColumnsRenamed({"A": "qty_a", "N": "qty_n", "R": "qty_r"})
    )


_PIVOT_ORACLE = """
SELECT l_linestatus,
       round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 4) AS qty_a,
       round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 4) AS qty_n,
       round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 4) AS qty_r
FROM lineitem
GROUP BY l_linestatus
"""

QUERIES["q_pivot"] = q_pivot
ORACLE["q_pivot"] = _PIVOT_ORACLE


def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining analytic window family: ntile quartiles, percent_rank,
    cume_dist over customer balance per nation, plus lag-based delta.
    All one window pass; shuffle key is the partition column."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round("c_acctbal", 4).alias("acctbal"),
        F.ntile(4).over(w).alias("quartile"),
        stable_round(F.percent_rank().over(w), 6).alias("pct_rank"),
        stable_round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.col("c_acctbal") - F.lag("c_acctbal", 1).over(w), 4).alias("delta_prev"),
    )


_WINDOW_ANALYTICS_ORACLE = """
SELECT c_custkey,
       c_nationkey,
       round(c_acctbal, 4) AS acctbal,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       (floor((percent_rank() OVER w) * 1000000.0 + 0.5) / 1000000.0) AS pct_rank,
       (floor((cume_dist() OVER w) * 1000000.0 + 0.5) / 1000000.0) AS cume,
       round(c_acctbal - lag(c_acctbal, 1) OVER w, 4) AS delta_prev
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
"""


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over embeddings: filter+size,
    transform+aggregate (L1/L2 norms), array_max — all JVM-side lambda
    expressions inside codegen, the idiomatic replacement for per-row
    Python over array columns."""
    emb = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + F.abs(x)), 6).alias("l1_norm"),
        F.round(
            F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)), 6
        ).alias("l2_norm"),
        F.round(F.array_max(v), 6).alias("max_val"),
    )


_ARRAY_FUNCS_ORACLE = """
SELECT vec_id,
       CAST(len(list_filter(v, x -> x > 0)) AS INTEGER) AS n_positive,
       round(list_sum(list_transform(v, x -> abs(x))), 6) AS l1_norm,
       round(sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS l2_norm,
       round(list_max(v), 6) AS max_val
FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
"""

QUERIES["q_window_analytics"] = q_window_analytics
ORACLE["q_window_analytics"] = _WINDOW_ANALYTICS_ORACLE
QUERIES["q_array_funcs"] = q_array_funcs
ORACLE["q_array_funcs"] = _ARRAY_FUNCS_ORACLE


def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: props JSON parsed to map<string,int> (schema-on-
    read like P3 but into a map, not a struct — right when keys are
    dynamic), exploded to entries, aggregated per (event_type, key)."""
    e = table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    return (
        e.select("event_type", F.explode(m).alias("key", "val"))
        .groupBy("event_type", "key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("val"), 4).alias("avg_val"),
            F.max("val").alias("max_val"),
        )
    )


_MAP_FUNCS_ORACLE = """
WITH kv AS (
  SELECT event_type, k AS key,
         CAST(json_extract(props, '$.' || k) AS INTEGER) AS val
  FROM events, unnest(json_keys(props)) AS t(k)
)
SELECT event_type, key, count(*) AS n,
       round(avg(val), 4) AS avg_val,
       max(val) AS max_val
FROM kv
GROUP BY event_type, key
"""

QUERIES["q_map_funcs"] = q_map_funcs
ORACLE["q_map_funcs"] = _MAP_FUNCS_ORACLE


def q_agg_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by selector aggregates: the single-pass 'row with the
    extreme value' form that otherwise costs a window + filter."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )


_MAXBY_ORACLE = """
SELECT o_orderpriority,
       max_by(o_orderkey, o_totalprice) AS priciest_order,
       min_by(o_orderkey, o_totalprice) AS cheapest_order,
       round(max(o_totalprice), 4) AS max_price
FROM orders
GROUP BY o_orderpriority
"""


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: nation names per region as one
    sorted comma-joined string (deterministic — collect then sort
    array, never rely on aggregation order)."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


_STRING_AGG_ORACLE = """
SELECT r_name,
       array_to_string(list_sort(list(n_name)), ',') AS nations,
       count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction family: first word, first number-like token,
    and a boolean rlike flag over document text."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.regexp_extract("text", r"(\d+)", 1).alias("first_number"),
        F.col("text").rlike(r"\d").alias("has_digit"),
    )


_REGEX_ORACLE = r"""
SELECT doc_id,
       coalesce(regexp_extract(text, '^(\w+)', 1), '') AS first_word,
       coalesce(regexp_extract(text, '(\d+)', 1), '') AS first_number,
       regexp_matches(text, '\d') AS has_digit
FROM documents
"""

QUERIES["q_agg_maxby"] = q_agg_maxby
ORACLE["q_agg_maxby"] = _MAXBY_ORACLE
QUERIES["q_string_agg"] = q_string_agg
ORACLE["q_string_agg"] = _STRING_AGG_ORACLE
QUERIES["q_regex_extract"] = q_regex_extract
ORACLE["q_regex_extract"] = _REGEX_ORACLE


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bucket histogram via width_bucket — the single-pass
    distribution profile (vs exact percentiles' full sort)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(12)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# width_bucket semantics spelled out (this DuckDB build lacks the
# builtin): 0 below range, n_buckets+1 at/above high, else
# floor((x-low)/width)+1.
_HISTOGRAM_ORACLE = """
SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
            WHEN o_totalprice >= 600000.0 THEN 13
            ELSE CAST(floor(o_totalprice / 50000.0) AS INTEGER) + 1 END AS BIGINT) AS bucket,
       count(*) AS n
FROM orders
GROUP BY bucket
"""

QUERIES["q_histogram"] = q_histogram
ORACLE["q_histogram"] = _HISTOGRAM_ORACLE


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel: users who signed up, then clicked AFTER the
    signup, then purchased AFTER that click. Three chained min-ts
    aggregations, each joined to the previous stage — stage frames are
    per-user (small relative to events) so the joins broadcast under
    AQE; the events table is scanned once per stage with the
    event_type filter pushed down."""
    e = table(spark, sf_dir, "events")

    def stage(event_type: str, prev, prev_ts: str, out_ts: str):
        ev = e.where(F.col("event_type") == event_type).select("user_id", "ts")
        if prev is not None:
            ev = ev.join(prev, "user_id").where(F.col("ts") > F.col(prev_ts))
        return ev.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    s = stage("signup", None, "", "s_ts")
    c = stage("click", s, "s_ts", "c_ts")
    p = stage("purchase", c, "c_ts", "p_ts")
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )


_FUNNEL_ORACLE = """
WITH s AS (SELECT user_id, min(ts) AS s_ts FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e
      JOIN s ON e.user_id = s.user_id AND e.ts > s.s_ts
      WHERE e.event_type = 'click' GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
      JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT (SELECT count(*) FROM s) AS n_signup,
       (SELECT count(*) FROM c) AS n_click_after,
       (SELECT count(*) FROM p) AS n_purchase_after
"""

QUERIES["q_funnel"] = q_funnel
ORACLE["q_funnel"] = _FUNNEL_ORACLE


def q_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event_type (|z| > 3). Moments are
    accumulated as DECIMAL sums — exact and associative, so mean and
    variance are bit-identical regardless of partitioning or engine;
    every derived scalar (mean, std, z) is then the same IEEE
    arithmetic on the same inputs, needing no rounding at all. One
    partial-combined aggregate + a broadcast join back to the rows."""
    e = table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(28,8)")
    dec2 = (F.col("value") * F.col("value")).cast("decimal(28,8)")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec).alias("_s"),
        F.sum(dec2).alias("_s2"),
    )
    mean = F.col("_s").cast("double") / F.col("_n")
    var = F.col("_s2").cast("double") / F.col("_n") - mean * mean
    stats = stats.select(
        "event_type", mean.alias("_mean"), F.sqrt(var).alias("_std")
    )
    z = (F.col("value") - F.col("_mean")) / F.col("_std")
    return (
        e.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > 3)
        .select("event_id", "event_type", "value", z.alias("z_score"))
    )


_OUTLIER_ORACLE = """
WITH stats AS (
  SELECT event_type,
         CAST(sum(CAST(value AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS mean,
         sqrt(CAST(sum(CAST(value * value AS DECIMAL(28,8))) AS DOUBLE) / count(*)
              - (CAST(sum(CAST(value AS DECIMAL(28,8))) AS DOUBLE) / count(*))
                * (CAST(sum(CAST(value AS DECIMAL(28,8))) AS DOUBLE) / count(*)))
           AS std
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, value, (value - mean) / std AS z_score
FROM events e JOIN stats USING (event_type)
WHERE abs((value - mean) / std) > 3
"""


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap fill: a dense hourly spine
    (sequence + explode over the observed range, crossed with the tiny
    event_type dimension) left-joined to hourly counts, missing hours
    zero-filled. The spine is |hours| x |types| rows — broadcastable at
    any corpus scale; the fact side aggregates before the join, so the
    join input is already one row per (hour, type)."""
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("hour_start")
    )
    types = e.select("event_type").distinct()
    counts = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        spine.crossJoin(types)
        .join(counts, ["hour_start", "event_type"], "left")
        .select(
            "hour_start",
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


_GAP_FILL_ORACLE = """
WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
           FROM events),
spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_start FROM b),
types AS (SELECT DISTINCT event_type FROM events),
c AS (SELECT date_trunc('hour', ts) AS hour_start, event_type, count(*) AS n
      FROM events GROUP BY 1, 2)
SELECT s.hour_start, t.event_type, coalesce(c.n, 0) AS n_events
FROM spine s
CROSS JOIN types t
LEFT JOIN c ON c.hour_start = s.hour_start AND c.event_type = t.event_type
"""

QUERIES["q_outliers"] = q_outliers
ORACLE["q_outliers"] = _OUTLIER_ORACLE
QUERIES["q_gap_fill"] = q_gap_fill
ORACLE["q_gap_fill"] = _GAP_FILL_ORACLE


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization report: p01/p99 clamp bounds per event_type and how
    many rows each tail would clamp. Bounds are exact *order statistics*
    (the actual data value at rank ceil(q*n)), not interpolated
    percentiles — interpolation is ulp-fragile across engines (the one
    round-1 driver hash fail), while a selected data value is
    bit-identical everywhere, so no rounding is needed. The rank pass is
    one sort per event_type (at 100 TB swap for approx_percentile, whose
    t-digest partials merge); bounds then broadcast back onto the rows,
    so the clamp scan itself never shuffles."""
    e = table(spark, sf_dir, "events").select("event_type", "value")
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = e.withColumn("_rn", F.row_number().over(w))
    n = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("_n"))
    lo = F.greatest(F.lit(1).cast("bigint"), F.ceil(F.col("_n") * 0.01))
    hi = F.ceil(F.col("_n") * 0.99)
    stats = (
        ranked.join(F.broadcast(n), "event_type")
        .where((F.col("_rn") == lo) | (F.col("_rn") == hi))
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("_rn") == lo, F.col("value"))).alias("_p01"),
            F.max(F.when(F.col("_rn") == hi, F.col("value"))).alias("_p99"),
        )
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("value") < F.col("_p01"), 1).otherwise(0)).alias("n_clamped_low"),
            F.sum(F.when(F.col("value") > F.col("_p99"), 1).otherwise(0)).alias("n_clamped_high"),
            F.min("_p01").alias("p01"),
            F.min("_p99").alias("p99"),
        )
    )


_WINSORIZE_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
stats AS (
  SELECT event_type,
         min(CASE WHEN rn = greatest(1, CAST(ceil(n * 0.01) AS BIGINT))
                  THEN value END) AS p01,
         max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT)
                  THEN value END) AS p99
  FROM ranked GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n_total,
       sum(CASE WHEN value < p01 THEN 1 ELSE 0 END) AS n_clamped_low,
       sum(CASE WHEN value > p99 THEN 1 ELSE 0 END) AS n_clamped_high,
       min(p01) AS p01,
       min(p99) AS p99
FROM events e JOIN stats USING (event_type)
GROUP BY e.event_type
"""

QUERIES["q_winsorize"] = q_winsorize
ORACLE["q_winsorize"] = _WINSORIZE_ORACLE
