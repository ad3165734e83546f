"""Deterministic fixture documents reproducing the reference's raw data.

Shapes per FIXTURES.md: weather JSON is landed as a Python ``str()``
repr (single quotes — dags/sandbox_data_pipeline.py:64), cocktails JSON
arrives with embedded newlines and python-repr quoting and is repaired
by ``clean_cocktail_json`` (:123-126). The same literals feed the Spark
queries and the generated DuckDB oracle SQL, so the ingest transforms
are differentially testable without network I/O.
"""

from __future__ import annotations

import json

CITIES: list[str] = ["Seattle", "New York", "Los Angeles", "San Jose", "Fort Worth"]

RUN_HRS: list[int] = [202401150000, 202401150100]


def _weather_doc(city: str, i: int) -> dict:
    cond = [("Sunny", "s.png", 1000), ("Partly cloudy", "pc.png", 1003), ("Rain", "r.png", 1189)][i % 3]
    return {
        "location": {
            "name": city,
            "region": f"Region {i}",
            "country": "United States of America",
            "lat": round(30.0 + i * 1.25, 4),
            "lon": round(-120.0 + i * 2.5, 4),
            "tz_id": "America/Los_Angeles",
            "localtime_epoch": 1705305600 + i * 3600,
            "localtime": f"2024-01-15 {i:02d}:05",
        },
        "current": {
            "last_updated_epoch": 1705305000 + i * 3600,
            "last_updated": f"2024-01-15 {i:02d}:00",
            "temp_c": 5.5 + i,
            "temp_f": 41.9 + i * 1.8,
            "is_day": i % 2,
            "condition": {"text": cond[0], "icon": cond[1], "code": cond[2]},
            "wind_mph": 5.6 + i,
            "wind_kph": 9.0 + i,
            "wind_degree": 200 + i,
            "wind_dir": "SSW",
            "pressure_mb": 1020.0 + i,
            "pressure_in": 30.12,
            "precip_mm": 0.1 * i,
            "precip_in": 0.0,
            "humidity": 86 - i,
            "cloud": 25 * (i % 4),
            "feelslike_c": 4.3 + i,
            "feelslike_f": 39.7 + i,
            "vis_km": 16.0,
            "vis_miles": 9.0,
            "uv": 1.0 + (i % 3),
            "gust_mph": 9.8 + i,
            "gust_kph": 15.8 + i,
        },
    }


def weather_raw_docs() -> list[tuple[str, int, str]]:
    """(city, run_hr, python-repr doc) — the exact at-rest quirk."""
    out = []
    for h, run_hr in enumerate(RUN_HRS):
        for c, city in enumerate(CITIES):
            out.append((city, run_hr, str(_weather_doc(city, h * len(CITIES) + c))))
    return out


def weather_json_docs() -> list[tuple[str, int, str]]:
    """(city, run_hr, valid compact JSON) — post-repair form."""
    out = []
    for h, run_hr in enumerate(RUN_HRS):
        for c, city in enumerate(CITIES):
            doc = _weather_doc(city, h * len(CITIES) + c)
            out.append((city, run_hr, json.dumps(doc, separators=(",", ":"))))
    return out


_DRINKS = [
    {
        "dateModified": "2017-09-02 18:37:52",
        "idDrink": 17222.0,
        "strAlcoholic": "Alcoholic",
        "strCategory": "Cocktail",
        "strCreativeCommonsConfirmed": "No",
        "strDrink": "A1",
        "strDrinkAlternate": None,
        "strDrinkThumb": "https://example.invalid/a1.jpg",
        "strGlass": "Cocktail glass",
        "strIBA": None,
        "strImageAttribution": None,
        "strImageSource": None,
        "strIngredient1": "Gin",
        "strIngredient2": "Grand Marnier",
        "strIngredient3": "Lemon Juice",
        "strIngredient4": "Grenadine",
        "strInstructions": "Pour all ingredients into a cocktail\nshaker, mix and serve over ice into a chilled glass.",
        "strInstructionsDE": "Alle Zutaten in einen Cocktailshaker geben.",
        "strInstructionsES": "Vierta todos los ingredientes.",
        "strInstructionsFR": None,
        "strInstructionsIT": "Versare tutti gli ingredienti.",
        "strInstructionsZH-HANS": None,
        "strInstructionsZH-HANT": None,
        "strMeasure1": "1 3/4 shot ",
        "strMeasure2": "1 Shot ",
        "strMeasure3": "1/4 Shot",
        "strMeasure4": "1/8 Shot",
        "strTags": "IBA,Classic",
        "strVideo": None,
    },
    {
        "dateModified": "2016-11-04 09:17:09",
        "idDrink": 13501.0,
        "strAlcoholic": "Alcoholic",
        "strCategory": "Shot",
        "strCreativeCommonsConfirmed": "No",
        "strDrink": "ABC",
        "strDrinkAlternate": None,
        "strDrinkThumb": "https://example.invalid/abc.jpg",
        "strGlass": "Shot glass",
        "strIBA": None,
        "strImageAttribution": None,
        "strImageSource": None,
        "strIngredient1": "Amaretto",
        "strIngredient2": "Baileys irish cream",
        "strIngredient3": "Cognac",
        "strInstructions": "Layered in a shot glass.",
        "strInstructionsDE": "In einem Schnapsglas\rschichten.",
        "strInstructionsES": None,
        "strInstructionsFR": None,
        "strInstructionsIT": "Stratificato in un bicchierino.",
        "strInstructionsZH-HANS": None,
        "strInstructionsZH-HANT": None,
        "strMeasure1": "1/3 ",
        "strMeasure2": "1/3 ",
        "strMeasure3": "1/3 ",
        "strTags": None,
        "strVideo": None,
    },
    {
        "dateModified": "2016-08-31 19:32:08",
        "idDrink": 17225.0,
        "strAlcoholic": "Alcoholic",
        "strCategory": "Cocktail",
        "strCreativeCommonsConfirmed": "Yes",
        "strDrink": "Ace",
        "strDrinkAlternate": None,
        "strDrinkThumb": "https://example.invalid/ace.jpg",
        "strGlass": "Martini Glass",
        "strIBA": None,
        "strImageAttribution": None,
        "strImageSource": None,
        "strIngredient1": "Gin",
        "strIngredient2": "Grenadine",
        "strIngredient3": "Heavy cream",
        "strIngredient4": "Milk",
        "strIngredient5": "Egg White",
        "strInstructions": "Shake all the ingredients in a cocktail shaker and ice then strain in a cold glass.",
        "strInstructionsDE": None,
        "strInstructionsES": None,
        "strInstructionsFR": None,
        "strInstructionsIT": "Shakerare tutti gli ingredienti.",
        "strInstructionsZH-HANS": None,
        "strInstructionsZH-HANT": None,
        "strMeasure1": "2 shots ",
        "strMeasure2": "1/2 shot ",
        "strMeasure3": "1/2 shot ",
        "strMeasure4": "1/2 shot",
        "strMeasure5": "1/2 Fresh",
        "strTags": None,
        "strVideo": None,
    },
]


def _full_drink(d: dict) -> dict:
    """Every declared field present (missing → None), declaration order."""
    from sandbox_data_pipeline_spark.schemas import COCKTAIL_RENAME

    return {k: d.get(k) for k in COCKTAIL_RENAME}


def cocktails_doc() -> dict:
    return {"drinks": [_full_drink(d) for d in _DRINKS]}


def cocktails_raw() -> str:
    """The at-rest quirk: python repr (None, single quotes) with real
    embedded control characters — exactly the shape the reference's
    golden test feeds clean_cocktail_json
    (tests/test_sandbox_data_pipeline.py:45-48)."""
    return str(cocktails_doc()).replace("\\n", "\n").replace("\\r", "\r")


def cocktails_json() -> str:
    """Post-repair JSON, produced by the engine's own repair transform
    (strip \\n\\r → literal_eval → json.dumps). The repair itself is
    pinned against the reference's golden string in tests."""
    from sandbox_data_pipeline_spark.functions.core import clean_cocktail_json

    return clean_cocktail_json(cocktails_raw())


def anomalo_check_result(table_name: str, ok: bool = True) -> dict:
    """DQ report document shape (dags/sandbox_data_pipeline.py:188-201,
    include/utils/anomalo_datahub.py:276-279)."""
    return {
        "check_runs": [
            {
                "results_pending": False,
                "check_run_url": f"https://dq.example.invalid/{table_name}/runs/1",
                "run_config": {"_metadata": {"check_message": f"checks for {table_name}"}},
                "results": {
                    "success": ok,
                    "evaluated_message": "all checks passed" if ok else "checks failed",
                },
            }
        ]
    }
