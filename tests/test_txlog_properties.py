"""Model-based check of TxTable semantics: random (seeded) op
sequences — append / ranged delete / keyed merge / overwrite — are
replayed against a pure-Python dict model; every historical snapshot
must equal the model's snapshot at that version, and stats-pruned
reads must return exactly the predicate's rows."""

from __future__ import annotations

import pytest

import random

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.sinks.txlog import TxTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


def _snapshot_of(t, version):
    return {(r["k"], r["v"]) for r in t.read(version=version).collect()}


def _run_sequence(spark, tmp_path, seed, n_ops=6):
    rng = random.Random(seed)
    model: dict[int, int] = {k: k * 7 for k in range(40)}
    t = TxTable.create(
        spark, str(tmp_path / f"tbl{seed}"), _df(spark, sorted(model.items()))
    )
    history = [dict(model)]
    next_key = 1000
    for _ in range(n_ops):
        op = rng.choice(["append", "delete", "merge", "overwrite"])
        if op == "append":
            rows = [(next_key + i, rng.randrange(100)) for i in range(rng.randrange(1, 6))]
            next_key += 10
            t.append(_df(spark, rows))
            model.update(dict(rows))
        elif op == "delete":
            lo = rng.randrange(0, 50)
            hi = lo + rng.randrange(0, 30)
            t.delete_where("k", lo, hi)
            model = {k: v for k, v in model.items() if not (lo <= k <= hi)}
        elif op == "merge":
            keys = rng.sample(sorted(model) or [0], min(3, len(model) or 1))
            rows = [(k, rng.randrange(100)) for k in keys]
            rows.append((next_key, rng.randrange(100)))
            next_key += 10
            t.merge(_df(spark, rows), "k")
            model.update(dict(rows))
        else:
            rows = [(rng.randrange(200), rng.randrange(100)) for _ in range(5)]
            dedup = dict(rows)
            t.overwrite_all(_df(spark, sorted(dedup.items())))
            model = dict(dedup)
        history.append(dict(model))
    return t, history


@pytest.mark.slow
def test_model_equivalence_across_versions(spark, tmp_path):
    for seed in (7, 23):
        t, history = _run_sequence(spark, tmp_path, seed)
        assert t.latest_version() == len(history) - 1
        for v, model in enumerate(history):
            assert _snapshot_of(t, v) == set(model.items()), (
                f"seed {seed}: snapshot v{v} diverged from model"
            )


def test_pruned_reads_lose_no_rows(spark, tmp_path):
    t, history = _run_sequence(spark, tmp_path, seed=99)
    model = history[-1]
    for lo, hi in ((0, 25), (500, 2000), (30, 1005)):
        got = {
            (r["k"], r["v"])
            for r in t.read(predicate=("k", lo, hi))
            .where(F.col("k").between(lo, hi))
            .collect()
        }
        want = {(k, v) for k, v in model.items() if lo <= k <= hi}
        assert got == want
