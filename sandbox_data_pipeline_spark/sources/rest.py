"""REST document source (S1/S2) — driver-side I/O shell.

The reference fetches KB-scale API documents per run
(fetch_rapid_api_data, dags/sandbox_data_pipeline.py:38-72) and lands
them as files; the engine treats the landed files as the real source.
This shell reproduces the fetch contract: header auth, optional
querystring, skip-if-landed idempotency (F2), an optional
transform_callback (X1), and linear-backoff retry (T3,
dags/sandbox_data_pipeline.py:182-198).

Transport is injectable: tests (and this offline environment) pass a
callable; production passes an HTTP getter. Fetching stays on the
driver BY DESIGN — per-run volume is a handful of documents; the
cluster's job starts at the landed files.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable

Transport = Callable[[str, dict[str, str], dict[str, str] | None], str]


def http_transport(url: str, headers: dict[str, str], params: dict[str, str] | None) -> str:
    """Default production transport (stdlib only)."""
    import urllib.parse
    import urllib.request

    if params:
        url = f"{url}?{urllib.parse.urlencode(params)}"
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        return resp.read().decode("utf-8")


def fetch_document(
    url: str,
    key: str,
    host: str,
    exists: Callable[[], bool] | None = None,
    querystring: dict[str, str] | None = None,
    transform_callback: Callable[[str], str] | None = None,
    transport: Transport = http_transport,
    retries: int = 3,
    backoff_s: float = 10.0,
) -> str | None:
    """Fetch one document. Returns None when the F2 exists-guard says
    the output is already landed (the AirflowSkipException analogue).
    Retry waits grow linearly (attempt * backoff_s), like the
    reference's DQ poll loop."""
    if exists is not None and exists():
        return None
    headers = {"X-RapidAPI-Key": key, "X-RapidAPI-Host": host}
    last_err: Exception | None = None
    for attempt in range(1, retries + 1):
        try:
            body = transport(url, headers, querystring)
            break
        except Exception as e:  # noqa: BLE001 — retry any transport error
            last_err = e
            if attempt == retries:
                raise
            time.sleep(attempt * backoff_s)
    if transform_callback:
        body = transform_callback(body)
    return body


def fetch_city_list(
    url: str,
    transport: Transport = http_transport,
) -> list[str]:
    """S1: the top-N city list endpoint returns a JSON array of names
    (get_top_5_cities, dags/sandbox_data_pipeline.py:84-91)."""
    return list(json.loads(transport(url, {}, None)))
