from __future__ import annotations

import pytest

from sandbox_data_pipeline_spark.functions.core import clean_cocktail_json
from sandbox_data_pipeline_spark.sources.rest import fetch_city_list, fetch_document


def test_fetch_document_with_transform_and_headers():
    seen = {}

    def transport(url, headers, params):
        seen.update(url=url, headers=headers, params=params)
        return "{'a': 1,}"  # python-repr payload, like the real API landing

    out = fetch_document(
        "https://api.example.invalid/doc",
        key="k",
        host="h",
        querystring={"q": "Seattle"},
        transform_callback=clean_cocktail_json,
        transport=transport,
    )
    assert out == '{"a": 1}'
    assert seen["headers"] == {"X-RapidAPI-Key": "k", "X-RapidAPI-Host": "h"}
    assert seen["params"] == {"q": "Seattle"}


def test_fetch_document_skips_when_landed():
    def transport(url, headers, params):  # pragma: no cover
        raise AssertionError("must not fetch")

    assert fetch_document("u", "k", "h", exists=lambda: True, transport=transport) is None


def test_fetch_document_retries_then_raises():
    calls = []

    def transport(url, headers, params):
        calls.append(1)
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        fetch_document("u", "k", "h", transport=transport, retries=3, backoff_s=0.0)
    assert len(calls) == 3


def test_fetch_city_list():
    assert fetch_city_list("u", transport=lambda *a: '["Seattle", "New York"]') == [
        "Seattle",
        "New York",
    ]
