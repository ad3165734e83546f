"""Reference-parity queries: the ingest→publish transforms of the
reference pipeline, differentially tested against DuckDB on the SAME
fixture documents (embedded as VALUES literals in the generated oracle
SQL — no filesystem or network dependency).

Spark side: declared-schema parse (S3) / variant extraction (S4) +
the publish transforms in operators/ingest.py.
DuckDB side: json_extract over identical literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark import fixtures
from sandbox_data_pipeline_spark.functions.core import clean_json_udf, normalize_city
from sandbox_data_pipeline_spark.operators.ingest import (
    cocktails_publish,
    cocktails_variant_publish,
    weather_flatten,
    weather_publish,
    weather_variant_publish,
    weather_variant_publish_native,
)
from sandbox_data_pipeline_spark.schemas import COCKTAIL_RENAME, COCKTAILS_SCHEMA, WEATHER_SCHEMA
from sandbox_data_pipeline_spark.sources.json_source import (
    VARIANT_COL,
    docs_to_df,
    parse_declared,
)


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _weather_values() -> str:
    rows = ",\n".join(
        f"({_q(body)}, {run_hr})" for _, run_hr, body in fixtures.weather_json_docs()
    )
    return f"(VALUES\n{rows}\n) AS t(j, run_hr)"


# --- q_weather_stage / q_cocktails_stage / q_weather_variant_stage (S3/S4) -
# The stage discipline itself, independent of the publish transforms:
# declared-schema parse lands the typed nested frame (BigQuery LOAD DATA
# OVERWRITE, write_weather_to_bigquery_stage.sql:5-51), variant lands raw
# bytes (Snowflake COPY INTO json_data variant,
# write_weather_to_snowflake_stage.sql:10-12). Stage rows keep nested
# structs in the engine; leaves are projected here only because the
# cross-engine hash cannot compare struct values.


def q_weather_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: declared nested parse, fields untouched (localtime stays a
    raw string, no run_hr-literal injection, no struct rebuild)."""
    docs = docs_to_df(spark, fixtures.weather_json_docs())
    stage = parse_declared(docs.select("run_hr", "body"), WEATHER_SCHEMA)
    loc_str = ("name", "region", "country", "tz_id")
    cur_dbl = (
        "temp_c", "temp_f", "wind_mph", "wind_kph", "pressure_mb", "pressure_in",
        "precip_mm", "precip_in", "feelslike_c", "feelslike_f", "vis_km",
        "vis_miles", "uv", "gust_mph", "gust_kph",
    )
    cur_big = ("last_updated_epoch", "is_day", "wind_degree", "humidity", "cloud")
    sel = [F.col("run_hr")]
    sel += [F.col(f"location.{f}").alias(f"loc_{f}") for f in loc_str]
    sel += [F.col(f"location.{f}").alias(f"loc_{f}") for f in ("lat", "lon")]
    sel += [
        F.col("location.localtime_epoch").alias("loc_localtime_epoch"),
        F.col("location.localtime").alias("loc_localtime"),
    ]
    sel += [F.col(f"current.{f}").alias(f"cur_{f}") for f in cur_big]
    sel += [F.col("current.last_updated").alias("cur_last_updated")]
    sel += [F.col(f"current.{f}").alias(f"cur_{f}") for f in cur_dbl]
    sel += [
        F.col("current.wind_dir").alias("cur_wind_dir"),
        F.col("current.condition.text").alias("cond_text"),
        F.col("current.condition.icon").alias("cond_icon"),
        F.col("current.condition.code").alias("cond_code"),
    ]
    return stage.select(*sel)


def _weather_stage_oracle() -> str:
    loc_str = ("name", "region", "country", "tz_id")
    cur_dbl = (
        "temp_c", "temp_f", "wind_mph", "wind_kph", "pressure_mb", "pressure_in",
        "precip_mm", "precip_in", "feelslike_c", "feelslike_f", "vis_km",
        "vis_miles", "uv", "gust_mph", "gust_kph",
    )
    cur_big = ("last_updated_epoch", "is_day", "wind_degree", "humidity", "cloud")
    sel = ["run_hr"]
    sel += [f"json_extract_string(j, '$.location.{f}') AS loc_{f}" for f in loc_str]
    sel += [f"CAST(json_extract(j, '$.location.{f}') AS DOUBLE) AS loc_{f}" for f in ("lat", "lon")]
    sel += [
        "CAST(json_extract(j, '$.location.localtime_epoch') AS BIGINT) AS loc_localtime_epoch",
        "json_extract_string(j, '$.location.localtime') AS loc_localtime",
    ]
    sel += [f"CAST(json_extract(j, '$.current.{f}') AS BIGINT) AS cur_{f}" for f in cur_big]
    sel += ["json_extract_string(j, '$.current.last_updated') AS cur_last_updated"]
    sel += [f"CAST(json_extract(j, '$.current.{f}') AS DOUBLE) AS cur_{f}" for f in cur_dbl]
    sel += [
        "json_extract_string(j, '$.current.wind_dir') AS cur_wind_dir",
        "json_extract_string(j, '$.current.condition.text') AS cond_text",
        "json_extract_string(j, '$.current.condition.icon') AS cond_icon",
        "CAST(json_extract(j, '$.current.condition.code') AS BIGINT) AS cond_code",
    ]
    return "SELECT\n  " + ",\n  ".join(sel) + f"\nFROM {_weather_values()}"


def q_cocktails_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 (array discipline): declared ARRAY<STRUCT> parse; doc-level
    array metrics + element indexing prove the typed landing without
    the J1 explode (that is q_cocktails_insert's job)."""
    doc = spark.createDataFrame([(fixtures.cocktails_json(),)], "body string")
    stage = parse_declared(doc, COCKTAILS_SCHEMA)
    return stage.select(
        F.size("drinks").alias("n_drinks"),
        F.col("drinks")[0]["strDrink"].alias("first_drink"),
        F.col("drinks")[0]["idDrink"].alias("first_drink_id"),
        F.element_at("drinks", -1)["strDrink"].alias("last_drink"),
    )


def _cocktails_stage_oracle() -> str:
    last = len(fixtures.cocktails_doc()["drinks"]) - 1
    return (
        "SELECT\n"
        "  CAST(json_array_length(j, '$.drinks') AS INTEGER) AS n_drinks,\n"
        "  json_extract_string(j, '$.drinks[0].\"strDrink\"') AS first_drink,\n"
        "  CAST(json_extract(j, '$.drinks[0].\"idDrink\"') AS DOUBLE) AS first_drink_id,\n"
        f"  json_extract_string(j, '$.drinks[{last}].\"strDrink\"') AS last_drink\n"
        f"FROM (SELECT {_q(fixtures.cocktails_json())} AS j)"
    )


def q_weather_variant_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: variant stage — raw document bytes as one string column,
    run-hour as the partition key; all typing deferred to query time
    (q_weather_variant_insert)."""
    docs = docs_to_df(spark, fixtures.weather_json_docs())
    return docs.select("run_hr", F.col("body").alias(VARIANT_COL))


def _weather_variant_stage_oracle() -> str:
    return f"SELECT run_hr, j AS json_data FROM {_weather_values()}"


def q_cocktails_variant_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 (cocktails): variant stage — the raw document lands as one
    variant column per COPY INTO, run-hour keying the staged load
    (write_cocktails_to_snowflake_stage.sql:10-12); typing deferred to
    q_cocktails_variant_insert. Symmetric to q_weather_variant_stage."""
    docs = docs_to_df(
        spark, [("cocktails", fixtures.RUN_HRS[0], fixtures.cocktails_json())]
    )
    return docs.select("run_hr", F.col("body").alias(VARIANT_COL))


def _cocktails_variant_stage_oracle() -> str:
    return (
        "SELECT run_hr, j AS json_data FROM (VALUES\n"
        f"({_q(fixtures.cocktails_json())}, {fixtures.RUN_HRS[0]})\n"
        ") AS t(j, run_hr)"
    )


# --- q_weather_insert (S3 + P1/P2/P5/P8 → flattened BQ prod shape) ---------

def q_weather_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = docs_to_df(spark, fixtures.weather_json_docs())
    out: DataFrame | None = None
    for run_hr in fixtures.RUN_HRS:
        stage = parse_declared(
            docs.where(F.col("run_hr") == run_hr).select("body"), WEATHER_SCHEMA
        )
        pub = weather_flatten(weather_publish(stage, run_hr))
        out = pub if out is None else out.unionAll(pub)
    assert out is not None
    return out


def _weather_insert_oracle() -> str:
    loc_str = ("name", "region", "country", "tz_id")
    cur_dbl = (
        "temp_c", "temp_f", "wind_mph", "wind_kph", "pressure_mb", "pressure_in",
        "precip_mm", "precip_in", "feelslike_c", "feelslike_f", "vis_km",
        "vis_miles", "uv", "gust_mph", "gust_kph",
    )
    cur_big = ("last_updated_epoch", "is_day", "wind_degree", "humidity", "cloud")
    sel = []
    for f in loc_str:
        sel.append(f"json_extract_string(j, '$.location.{f}') AS loc_{f}")
    for f in ("lat", "lon"):
        sel.append(f"CAST(json_extract(j, '$.location.{f}') AS DOUBLE) AS loc_{f}")
    sel.append("CAST(json_extract(j, '$.location.localtime_epoch') AS BIGINT) AS loc_localtime_epoch")
    sel.append("CAST(json_extract_string(j, '$.location.localtime') || ':00' AS TIMESTAMP) AS loc_localtime")
    for f in cur_big:
        sel.append(f"CAST(json_extract(j, '$.current.{f}') AS BIGINT) AS cur_{f}")
    sel.append("CAST(json_extract_string(j, '$.current.last_updated') || ':00' AS TIMESTAMP) AS cur_last_updated")
    for f in cur_dbl:
        sel.append(f"CAST(json_extract(j, '$.current.{f}') AS DOUBLE) AS cur_{f}")
    sel.append("json_extract_string(j, '$.current.wind_dir') AS cur_wind_dir")
    sel.append("json_extract_string(j, '$.current.condition.text') AS cond_text")
    sel.append("json_extract_string(j, '$.current.condition.icon') AS cond_icon")
    sel.append("CAST(json_extract(j, '$.current.condition.code') AS BIGINT) AS cond_code")
    sel.append("run_hr")
    return "SELECT\n  " + ",\n  ".join(sel) + f"\nFROM {_weather_values()}"


# --- q_weather_variant_insert (S4 + P3/P4/P6 → Snowflake narrow shape) -----

def q_weather_variant_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = docs_to_df(spark, fixtures.weather_json_docs())
    out: DataFrame | None = None
    for run_hr in fixtures.RUN_HRS:
        stage = docs.where(F.col("run_hr") == run_hr).select(F.col("body").alias("json_data"))
        pub = weather_variant_publish(stage, run_hr)
        out = pub if out is None else out.unionAll(pub)
    assert out is not None
    return out


def _weather_variant_oracle() -> str:
    def vint(path: str, alias: str) -> str:
        return (
            f"CAST(round(CAST(json_extract_string(j, '{path}') AS DOUBLE), 0) AS INTEGER) AS {alias}"
        )

    sel = [
        "CAST(run_hr AS BIGINT) AS run_hr",
        "json_extract_string(j, '$.location.name') AS location_name",
        # DuckDB needs the seconds suffix to parse minute-precision
        # strings (Spark/Snowflake tolerate them bare)
        "date_trunc('hour', CAST(json_extract_string(j, '$.location.localtime') || ':00' AS TIMESTAMP)) AS local_time",
        vint("$.current.temp_c", "temp_c"),
        vint("$.current.temp_f", "temp_f"),
        "CAST(CAST(json_extract_string(j, '$.current.is_day') AS INTEGER) AS BOOLEAN) AS is_day",
        "CAST(json_extract(j, '$.current.condition') AS VARCHAR) AS condition",
        "CAST(json_extract(j, '$.current.wind_kph') AS DOUBLE) AS wind_kph",
        "CAST(json_extract(j, '$.current.wind_mph') AS DOUBLE) AS wind_mph",
        "CAST(json_extract(j, '$.current.gust_kph') AS DOUBLE) AS gust_kph",
        "CAST(json_extract(j, '$.current.gust_mph') AS DOUBLE) AS gust_mph",
        vint("$.current.pressure_mb", "pressure_mb"),
        vint("$.current.pressure_in", "pressure_in"),
        vint("$.current.humidity", "humidity"),
        vint("$.current.cloud", "cloud"),
        vint("$.current.feelslike_c", "feelslike_c"),
        vint("$.current.feelslike_f", "feelslike_f"),
        vint("$.current.vis_km", "vis_km"),
        vint("$.current.vis_miles", "vis_miles"),
        vint("$.current.uv", "uv"),
    ]
    return "SELECT\n  " + ",\n  ".join(sel) + f"\nFROM {_weather_values()}"


def q_weather_variant_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 on Spark 4 native VariantType (parse_json + try_variant_get):
    same output contract as q_weather_variant_insert, checked against
    the same oracle."""
    docs = docs_to_df(spark, fixtures.weather_json_docs())
    out: DataFrame | None = None
    for run_hr in fixtures.RUN_HRS:
        stage = docs.where(F.col("run_hr") == run_hr).select(F.col("body").alias("json_data"))
        pub = weather_variant_publish_native(stage, run_hr)
        out = pub if out is None else out.unionAll(pub)
    assert out is not None
    return out


# --- q_cocktails_insert / q_cocktails_variant_insert (J1/J2 + P9) ----------

def q_cocktails_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = spark.createDataFrame([(fixtures.cocktails_json(),)], "body string")
    stage = parse_declared(doc, COCKTAILS_SCHEMA)
    return cocktails_publish(stage, fixtures.RUN_HRS[0])


def _cocktail_field_sql(camel: str, snake: str) -> str:
    path = f'$."{camel}"'
    if camel == "dateModified":
        return f"CAST(json_extract_string(drink, '{path}') AS TIMESTAMP) AS {snake}"
    if camel == "idDrink":
        return f"CAST(json_extract(drink, '{path}') AS DOUBLE) AS {snake}"
    return f"json_extract_string(drink, '{path}') AS {snake}"


def _cocktails_oracle(variant: bool) -> str:
    sel = []
    for camel, snake in COCKTAIL_RENAME.items():
        if variant and camel == "idDrink":
            sel.append(
                'CAST(round(CAST(json_extract(drink, \'$."idDrink"\') AS DOUBLE), 0) AS INTEGER) AS drink_id'
            )
        else:
            sel.append(_cocktail_field_sql(camel, snake))
    run_hr = fixtures.RUN_HRS[0]
    cast = "BIGINT"
    sel.append(f"CAST({run_hr} AS {cast}) AS run_hr")
    return (
        "WITH doc AS (SELECT " + _q(fixtures.cocktails_json()) + " AS j),\n"
        "drinks AS (SELECT unnest(CAST(json_extract(j, '$.drinks') AS JSON[])) AS drink FROM doc)\n"
        "SELECT\n  " + ",\n  ".join(sel) + "\nFROM drinks"
    )


def q_cocktails_variant_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = spark.createDataFrame(
        [(fixtures.cocktails_json(),)], "json_data string"
    )
    return cocktails_variant_publish(doc, fixtures.RUN_HRS[0])


# --- small parity queries --------------------------------------------------

def q_cities_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: the REST city-list source, materialized as a one-column
    frame (driver-side fetch in production; fixture list here)."""
    return spark.createDataFrame([(c,) for c in fixtures.CITIES], "city string")


def q_city_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: city → S3-key normalization (lower + space→underscore)."""
    cities = q_cities_source(spark, sf_dir)
    return cities.select(
        F.col("city"), normalize_city(F.col("city")).alias("city_key")
    )


def q_clean_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/P11: python-repr repair UDF over raw fixture docs. Oracle-
    backed since round 5 (_clean_json_oracle precomputes the repaired
    strings driver-side, so DuckDB checks the full output); the scalar
    behavior is also pinned by the reference's golden test in
    tests/test_ingest.py."""
    raw = [(f"weather:{k}:{hr}", hr, body) for k, hr, body in fixtures.weather_raw_docs()]
    raw.append(("cocktails", fixtures.RUN_HRS[0], fixtures.cocktails_raw()))
    docs = docs_to_df(spark, raw)
    return docs.select("entity_key", clean_json_udf(F.col("body")).alias("clean_body"))


QUERIES = {
    "q_weather_stage": q_weather_stage,
    "q_cocktails_stage": q_cocktails_stage,
    "q_weather_variant_stage": q_weather_variant_stage,
    "q_cocktails_variant_stage": q_cocktails_variant_stage,
    "q_weather_insert": q_weather_insert,
    "q_weather_variant_insert": q_weather_variant_insert,
    "q_weather_variant_native": q_weather_variant_native,
    "q_cocktails_insert": q_cocktails_insert,
    "q_cocktails_variant_insert": q_cocktails_variant_insert,
    "q_cities_source": q_cities_source,
    "q_city_normalize": q_city_normalize,
    "q_clean_json": q_clean_json,
}

ORACLE = {
    "q_weather_stage": _weather_stage_oracle(),
    "q_cocktails_stage": _cocktails_stage_oracle(),
    "q_weather_variant_stage": _weather_variant_stage_oracle(),
    "q_cocktails_variant_stage": _cocktails_variant_stage_oracle(),
    "q_weather_insert": _weather_insert_oracle(),
    "q_weather_variant_insert": _weather_variant_oracle(),
    "q_weather_variant_native": _weather_variant_oracle(),
    "q_cocktails_insert": _cocktails_oracle(variant=False),
    "q_cocktails_variant_insert": _cocktails_oracle(variant=True),
    "q_cities_source": "SELECT * FROM (VALUES "
    + ", ".join(f"({_q(c)})" for c in fixtures.CITIES)
    + ") AS t(city)",
    "q_city_normalize": "SELECT city, replace(lower(city), ' ', '_') AS city_key FROM (VALUES "
    + ", ".join(f"({_q(c)})" for c in fixtures.CITIES)
    + ") AS t(city)",
}


def _clean_json_oracle() -> str:
    """Golden-twin oracle for the repr-repair UDF: the repair is pure
    deterministic Python over fixture docs, so the oracle states the
    expected output computed INDEPENDENTLY of Spark (plain function
    call at registry-build time, no UDF, no session) as VALUES rows.
    The scalar behavior itself is additionally pinned by the
    reference's golden test (tests/test_ingest.py)."""
    from sandbox_data_pipeline_spark.functions.core import clean_cocktail_json

    rows = [
        (f"weather:{k}:{hr}", body)
        for k, hr, body in fixtures.weather_raw_docs()
    ]
    rows.append(("cocktails", fixtures.cocktails_raw()))
    vals = ", ".join(
        f"({_q(key)}, {_q(clean_cocktail_json(body))})" for key, body in rows
    )
    return f"SELECT * FROM (VALUES {vals}) AS t(entity_key, clean_body)"


ORACLE["q_clean_json"] = _clean_json_oracle()
