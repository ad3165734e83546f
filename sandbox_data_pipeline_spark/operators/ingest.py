"""Publish transforms: stage → production table shapes.

Each function re-expresses one of the reference's insert-select
statements as a Catalyst plan over a staged DataFrame. All are pure
built-in column expressions — the entire weather/cocktails transform
surface is UDF-free (only the repr-repair at ingest needs Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.schemas import COCKTAIL_RENAME
from sandbox_data_pipeline_spark.sources.json_source import VARIANT_COL


def _mm_ts(col: Column) -> Column:
    """P5: `timestamp(x || ':00')` — minute-precision string plus
    seconds suffix (write_weather_to_bigquery.sql:66,70)."""
    return F.to_timestamp(F.concat(col, F.lit(":00")))


def weather_publish(stage: DataFrame, run_hr: int) -> DataFrame:
    """BigQuery-discipline publish (write_weather_to_bigquery.sql:58-97):
    rebuild both structs with localtime/last_updated parsed to
    timestamps (P1/P2/P5), inject the run-hour literal (P8). The
    `current` struct is rebuilt field-by-field with `condition` as a
    nested struct — same shape as the reference DDL."""
    cur = F.col("current")
    loc = F.col("location")
    location = F.struct(
        loc["name"].alias("name"),
        loc["region"].alias("region"),
        loc["country"].alias("country"),
        loc["lat"].alias("lat"),
        loc["lon"].alias("lon"),
        loc["tz_id"].alias("tz_id"),
        loc["localtime_epoch"].alias("localtime_epoch"),
        _mm_ts(loc["localtime"]).alias("localtime"),
    ).alias("location")
    current = F.struct(
        cur["last_updated_epoch"].alias("last_updated_epoch"),
        _mm_ts(cur["last_updated"]).alias("last_updated"),
        cur["temp_c"].alias("temp_c"),
        cur["temp_f"].alias("temp_f"),
        cur["is_day"].alias("is_day"),
        F.struct(
            cur["condition"]["text"].alias("text"),
            cur["condition"]["icon"].alias("icon"),
            cur["condition"]["code"].alias("code"),
        ).alias("condition"),
        cur["wind_mph"].alias("wind_mph"),
        cur["wind_kph"].alias("wind_kph"),
        cur["wind_degree"].alias("wind_degree"),
        cur["wind_dir"].alias("wind_dir"),
        cur["pressure_mb"].alias("pressure_mb"),
        cur["pressure_in"].alias("pressure_in"),
        cur["precip_mm"].alias("precip_mm"),
        cur["precip_in"].alias("precip_in"),
        cur["humidity"].alias("humidity"),
        cur["cloud"].alias("cloud"),
        cur["feelslike_c"].alias("feelslike_c"),
        cur["feelslike_f"].alias("feelslike_f"),
        cur["vis_km"].alias("vis_km"),
        cur["vis_miles"].alias("vis_miles"),
        cur["uv"].alias("uv"),
        cur["gust_mph"].alias("gust_mph"),
        cur["gust_kph"].alias("gust_kph"),
    ).alias("current")
    return stage.select(
        location,
        current,
        F.lit(run_hr).cast("long").alias("run_hr"),
        # K5 audit column (nondeterministic — excluded from oracle output)
        F.current_timestamp().alias("created_at_ts"),
    )


def weather_flatten(prod: DataFrame) -> DataFrame:
    """Flatten the nested prod shape to hash-comparable leaves
    (loc_* / cur_* / cond_* prefixes), dropping the K5 audit column."""
    cols = []
    for leaf in ("name", "region", "country", "lat", "lon", "tz_id", "localtime_epoch", "localtime"):
        cols.append(F.col(f"location.{leaf}").alias(f"loc_{leaf}"))
    for leaf in (
        "last_updated_epoch", "last_updated", "temp_c", "temp_f", "is_day",
        "wind_mph", "wind_kph", "wind_degree", "wind_dir", "pressure_mb",
        "pressure_in", "precip_mm", "precip_in", "humidity", "cloud",
        "feelslike_c", "feelslike_f", "vis_km", "vis_miles", "uv",
        "gust_mph", "gust_kph",
    ):
        cols.append(F.col(f"current.{leaf}").alias(f"cur_{leaf}"))
    for leaf in ("text", "icon", "code"):
        cols.append(F.col(f"current.condition.{leaf}").alias(f"cond_{leaf}"))
    cols.append(F.col("run_hr"))
    return prod.select(*cols)


def _vstr(path: str) -> Column:
    return F.get_json_object(F.col(VARIANT_COL), path)


def _vdouble(path: str) -> Column:
    return _vstr(path).cast("double")


def _vint(path: str) -> Column:
    """Snowflake `variant::int` rounds (13.6 → 14); Spark's double→int
    cast truncates, so round explicitly — also what the DuckDB oracle
    does, keeping all three semantics aligned."""
    return F.round(_vstr(path).cast("double"), 0).cast("int")


def weather_variant_publish(stage: DataFrame, run_hr: int) -> DataFrame:
    """Snowflake-discipline publish (write_weather_to_snowflake.sql:31-52):
    schema-on-read path extraction (P3) + casts (P4) + date_trunc (P6)
    from a single variant column; `condition` stays untyped JSON text.
    Narrower than the BigQuery table by design (20 columns, int-coarsened
    metrics — write_weather_to_snowflake.sql:3-25)."""
    return stage.select(
        F.lit(run_hr).cast("long").alias("run_hr"),
        _vstr("$.location.name").alias("location_name"),
        F.date_trunc("hour", _vstr("$.location.localtime").cast("timestamp")).alias("local_time"),
        _vint("$.current.temp_c").alias("temp_c"),
        _vint("$.current.temp_f").alias("temp_f"),
        _vstr("$.current.is_day").cast("int").cast("boolean").alias("is_day"),
        _vstr("$.current.condition").alias("condition"),
        _vdouble("$.current.wind_kph").alias("wind_kph"),
        _vdouble("$.current.wind_mph").alias("wind_mph"),
        _vdouble("$.current.gust_kph").alias("gust_kph"),
        _vdouble("$.current.gust_mph").alias("gust_mph"),
        _vint("$.current.pressure_mb").alias("pressure_mb"),
        _vint("$.current.pressure_in").alias("pressure_in"),
        _vint("$.current.humidity").alias("humidity"),
        _vint("$.current.cloud").alias("cloud"),
        _vint("$.current.feelslike_c").alias("feelslike_c"),
        _vint("$.current.feelslike_f").alias("feelslike_f"),
        _vint("$.current.vis_km").alias("vis_km"),
        _vint("$.current.vis_miles").alias("vis_miles"),
        _vint("$.current.uv").alias("uv"),
    )


def weather_variant_publish_native(stage: DataFrame, run_hr: int) -> DataFrame:
    """The same Snowflake-discipline publish as ``weather_variant_publish``
    but on Spark 4's native VariantType: ``parse_json`` once, then typed
    ``try_variant_get`` path extraction (the literal equivalent of
    Snowflake's ``json_data:path::type`` — SURVEY §1.2). Identical
    output schema/values; at scale the binary variant avoids re-parsing
    the JSON text per extracted path, which is what get_json_object does.

    ``condition`` is re-serialized from an ordered struct because variant
    binary form sorts object keys and the reference keeps the original
    field order in its untyped prod column."""
    v = stage.select(F.parse_json(F.col(VARIANT_COL)).alias("_v"))

    def vstr(path: str) -> Column:
        return F.try_variant_get("_v", path, "string")

    def vdouble(path: str) -> Column:
        return F.try_variant_get("_v", path, "double")

    def vint(path: str) -> Column:
        return F.round(F.try_variant_get("_v", path, "double"), 0).cast("int")

    condition = F.to_json(
        F.struct(
            vstr("$.current.condition.text").alias("text"),
            vstr("$.current.condition.icon").alias("icon"),
            F.try_variant_get("_v", "$.current.condition.code", "long").alias("code"),
        )
    )
    return v.select(
        F.lit(run_hr).cast("long").alias("run_hr"),
        vstr("$.location.name").alias("location_name"),
        F.date_trunc("hour", vstr("$.location.localtime").cast("timestamp")).alias("local_time"),
        vint("$.current.temp_c").alias("temp_c"),
        vint("$.current.temp_f").alias("temp_f"),
        F.try_variant_get("_v", "$.current.is_day", "int").cast("boolean").alias("is_day"),
        condition.alias("condition"),
        vdouble("$.current.wind_kph").alias("wind_kph"),
        vdouble("$.current.wind_mph").alias("wind_mph"),
        vdouble("$.current.gust_kph").alias("gust_kph"),
        vdouble("$.current.gust_mph").alias("gust_mph"),
        vint("$.current.pressure_mb").alias("pressure_mb"),
        vint("$.current.pressure_in").alias("pressure_in"),
        vint("$.current.humidity").alias("humidity"),
        vint("$.current.cloud").alias("cloud"),
        vint("$.current.feelslike_c").alias("feelslike_c"),
        vint("$.current.feelslike_f").alias("feelslike_f"),
        vint("$.current.vis_km").alias("vis_km"),
        vint("$.current.vis_miles").alias("vis_miles"),
        vint("$.current.uv").alias("uv"),
    )


def cocktails_publish(stage: DataFrame, run_hr: int) -> DataFrame:
    """BigQuery-discipline publish (write_cocktails_to_bigquery.sql:63-176):
    CROSS JOIN UNNEST (J1 → explode) then the 51-column camelCase →
    snake_case rename (P9), dateModified parsed to timestamp, idDrink
    numeric."""
    drink = F.col("drink")
    cols = []
    for camel, snake in COCKTAIL_RENAME.items():
        c = drink[camel]
        if camel == "dateModified":
            c = c.cast("timestamp")
        cols.append(c.alias(snake))
    cols.append(F.lit(run_hr).cast("long").alias("run_hr"))
    return stage.select(F.explode("drinks").alias("drink")).select(*cols)


def cocktails_variant_publish(stage: DataFrame, run_hr: int) -> DataFrame:
    """Snowflake-discipline publish (write_cocktails_to_snowflake.sql:
    59-117): LATERAL FLATTEN over the variant's drinks array (J2) —
    expressed as from_json with the declared element schema, then
    explode + per-field variant extraction. drink_id is int there
    (vs numeric in BigQuery)."""
    from sandbox_data_pipeline_spark.schemas import COCKTAILS_SCHEMA

    parsed = stage.select(F.from_json(F.col(VARIANT_COL), COCKTAILS_SCHEMA).alias("doc"))
    drink = F.col("drink")
    cols = []
    for camel, snake in COCKTAIL_RENAME.items():
        c = drink[camel]
        if camel == "dateModified":
            c = c.cast("timestamp")
            snake = "date_modified"
        elif camel == "idDrink":
            c = F.round(c, 0).cast("int")
            snake = "drink_id"
        cols.append(c.alias(snake))
    cols.append(F.lit(run_hr).cast("long").alias("run_hr"))
    return parsed.select(F.explode("doc.drinks").alias("drink")).select(*cols)
