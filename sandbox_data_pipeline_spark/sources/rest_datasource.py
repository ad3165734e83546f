"""REST documents as a first-class Spark data source (Python Data
Source API, Spark 4).

The reference fans one fetch task out per city via Airflow dynamic
task mapping (fetch_weather.expand(city=…),
dags/sandbox_data_pipeline.py:247). This module is the Spark-native
form of that fan-out: each endpoint becomes an InputPartition, so the
fetches run ON EXECUTORS, in parallel, inside a normal scan —

    spark.dataSource.register(RestDocsDataSource)
    spark.read.format("rest_docs")
         .option("endpoints", json.dumps(urls))
         .load()                       # endpoint string, body string

and the result composes with everything downstream (parse, stage,
publish) as an ordinary DataFrame.

Transports (option "transport"): "http" (stdlib urllib, production)
or "file" (endpoint = local path — the landed-file contract, and what
the offline tests use). Header auth rides option "headers" as JSON,
matching the reference's X-RapidAPI-* scheme. Options are strings by
API contract, hence the JSON envelopes.

Scale note: per-partition fetch keeps the driver out of the data path
entirely; a 10k-endpoint crawl is 10k scan tasks with normal Spark
scheduling/retry semantics (spark.task.maxFailures replaces the
reference's retry loop). The driver-side shell in sources/rest.py
remains for the KB-scale single-document case where an executor
round-trip buys nothing.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _EndpointPartition(InputPartition):
    def __init__(self, idx: int, endpoint: str):
        self.idx = idx
        self.endpoint = endpoint


class RestDocsReader(DataSourceReader):
    def __init__(self, options):
        self.transport = options.get("transport", "http")
        self.headers = json.loads(options.get("headers", "{}"))
        self.endpoints = json.loads(options.get("endpoints", "[]"))
        if not isinstance(self.endpoints, list):
            raise ValueError("option 'endpoints' must be a JSON array of strings")

    def partitions(self):
        return [_EndpointPartition(i, e) for i, e in enumerate(self.endpoints)]

    def read(self, partition):
        endpoint = partition.endpoint
        if self.transport == "file":
            with open(endpoint, encoding="utf-8") as f:
                body = f.read()
        elif self.transport == "http":
            from sandbox_data_pipeline_spark.sources.rest import http_transport

            body = http_transport(endpoint, self.headers, None)
        else:
            raise ValueError(f"unknown transport {self.transport!r}")
        yield (endpoint, body)


class RestDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_docs"

    def schema(self) -> str:
        return "endpoint string, body string"

    def reader(self, schema):
        return RestDocsReader(self.options)


# --- Streaming: REST poll source --------------------------------------------


class _PollPartition(InputPartition):
    def __init__(self, poll: int, endpoint: str):
        self.poll = poll
        self.endpoint = endpoint


class RestPollStreamReader(DataSourceStreamReader):
    """Offset-tracked polling: each micro-batch is ONE poll round over
    every endpoint (offset = poll counter), fetched on executors with
    one InputPartition per endpoint — the Structured-Streaming form of
    the reference's poll sensor (T3/T4 check_* loops,
    /root/reference/dags/sandbox_data_pipeline.py:182-198): instead of
    a blocking DAG task re-checking a status URL, the poll is a SOURCE
    whose rows downstream operators (parse → window → publish) consume
    incrementally with checkpointed exactly-once offsets.

    Restart contract: offsets live in the checkpoint; a fresh reader
    instance may lag the checkpoint (its counter restarts at 0 while
    the checkpoint is at N). A monotonic high-water mark over every
    offset this instance has SEEN — not just the ones it generated —
    makes ``partitions`` emit only rounds above it, so the
    first-after-restart batch (N → 1) is empty AND the follow-up batch
    (1 → N+1) cannot re-emit rounds 2..N: history is never re-polled
    (a poll is a point-in-time observation with no history to replay).

    Two at-least-once windows remain without further state: (a)
    Spark's own WAL replay of a planned-but-uncommitted batch, where
    the re-fetch is correct behavior; (b) a SECOND restart landing
    between the empty fast-forward batch committing its regressed
    offset ({poll: 1}) and the catch-up batch committing — a fresh
    in-memory mark would then trust the regressed checkpoint and
    replay rounds 2..N. Option "state_path" closes (b) with a
    one-integer sidecar file (atomic rename), making the poll-id
    uniqueness durable across any number of restarts; without it,
    the idempotent publish downstream absorbs the rare replay."""

    def __init__(self, options):
        self.transport = options.get("transport", "http")
        self.headers = json.loads(options.get("headers", "{}"))
        self.endpoints = json.loads(options.get("endpoints", "[]"))
        if not isinstance(self.endpoints, list) or not self.endpoints:
            raise ValueError("option 'endpoints' must be a non-empty JSON array")
        # Optional durable high-water mark (option "state_path"): the
        # in-memory mark alone cannot survive a DOUBLE restart — the
        # first post-restart batch commits a regressed offset (N -> 1),
        # and if the process dies before the catch-up batch commits, a
        # fresh reader would trust the regressed checkpoint and replay
        # rounds 2..N. A one-int sidecar (written atomically) closes
        # that window; without it the guarantee degrades to
        # at-least-once across double restarts, absorbed downstream by
        # the idempotent publish.
        self._state_path = options.get("state_path")
        self._poll = 0
        self._hwm = self._load_hwm()

    def _load_hwm(self) -> int:
        if not self._state_path:
            return 0
        import os

        if not os.path.exists(self._state_path):
            return 0
        try:
            with open(self._state_path, encoding="utf-8") as f:
                return int(json.load(f)["hwm"])
        except (ValueError, KeyError, json.JSONDecodeError):
            return 0

    def _save_hwm(self) -> None:
        if not self._state_path:
            return
        import os

        tmp = f"{self._state_path}.tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"hwm": self._hwm}, f)
        os.replace(tmp, self._state_path)

    def initialOffset(self):
        return {"poll": 0}

    def latestOffset(self):
        self._poll += 1
        return {"poll": self._poll}

    def partitions(self, start, end):
        lo, hi = start["poll"], end["poll"]
        # Emit only rounds above everything already seen: `lo` alone is
        # wrong after a restart, where the committed offset can regress
        # below the checkpointed high water (see class docstring).
        base = max(lo, self._hwm)
        if max(self._hwm, lo, hi) > self._hwm:
            self._hwm = max(self._hwm, lo, hi)
            self._save_hwm()
        self._poll = max(self._poll, self._hwm)
        if hi <= base:
            return []
        return [
            _PollPartition(p, e)
            for p in range(base + 1, hi + 1)
            for e in self.endpoints
        ]

    def read(self, partition):
        endpoint = partition.endpoint
        if self.transport == "file":
            with open(endpoint, encoding="utf-8") as f:
                body = f.read()
        elif self.transport == "http":
            from sandbox_data_pipeline_spark.sources.rest import http_transport

            body = http_transport(endpoint, self.headers, None)
        else:
            raise ValueError(f"unknown transport {self.transport!r}")
        yield (partition.poll, endpoint, body)

    def commit(self, end):
        pass


class RestPollStreamDataSource(DataSource):
    """spark.readStream.format("rest_poll") — see RestPollStreamReader."""

    @classmethod
    def name(cls) -> str:
        return "rest_poll"

    def schema(self) -> str:
        return "poll long, endpoint string, body string"

    def streamReader(self, schema):
        return RestPollStreamReader(self.options)
