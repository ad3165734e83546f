"""Scalar function surface: the reference's Python callables (X-series)
plus run-hour / normalization helpers, each in two forms where it
matters — a plain-Python form (driver-side, unit-testable against the
reference's golden strings) and a Column form (JVM-side built-ins on
the hot path; Python UDF only where semantics genuinely require the
Python runtime, per SURVEY §2.10).
"""

from __future__ import annotations

import ast
import json
import re
from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


# --- X2/P11: python-repr → JSON repair ------------------------------------

def clean_cocktail_json(cocktail_json: str) -> str:
    """Repair a python-repr'd API payload into valid JSON: strip real
    newline/CR chars, literal_eval (tolerates trailing commas, single
    quotes, None), re-serialize. Same contract as the reference's
    clean_cocktail_json (dags/sandbox_data_pipeline.py:123-126),
    pinned by its golden test (tests/test_sandbox_data_pipeline.py:45-48).
    """
    cocktail_json = re.sub(r"[\n\r]", "", cocktail_json)
    return json.dumps(ast.literal_eval(cocktail_json))


# Column form: repr-repair is genuinely non-SQL (ast.literal_eval), so
# this is one of the engine's few scalar Python UDFs — acceptable
# because it runs once per *document* at ingest, never in the
# relational hot path.
clean_json_udf = F.udf(clean_cocktail_json, StringType())


# --- P12/T1: run-hour derivation ------------------------------------------

def run_hr_from_ts(ts: Column) -> Column:
    """Floor a timestamp to the hour, formatted as the reference's
    YYYYMMDDHH00 partition key (dags/sandbox_data_pipeline.py:75-81),
    typed long to match the warehouse DDL (`run_hr int64`)."""
    return F.date_format(ts, "yyyyMMddHH00").cast("long")


def run_hr_literal(dt: datetime) -> int:
    """Driver-side form, for the run-loop's Jinja-constant equivalent
    (P8: `{{ run_hr }} as run_hr`)."""
    return int(dt.strftime("%Y%m%d%H00"))


# --- P10: key normalization ------------------------------------------------

def normalize_city(city: Column) -> Column:
    """lower + space→underscore (dags/sandbox_data_pipeline.py:113)."""
    return F.regexp_replace(F.lower(city), " ", "_")


def normalize_city_py(city: str) -> str:
    return city.lower().replace(" ", "_")
