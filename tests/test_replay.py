"""Third-implementation replay gate (tools/replays.py).

The Spark-vs-DuckDB hash gate proves the two engines agree; it cannot
catch a bug in a SHARED expression (both engines running the same
wrong algorithm — the round-9 Hodges-Lehmann lower-median case). Every
test here re-derives the expected output from the algorithm's
published definition in pandas/numpy — importing nothing from the
engine package — and compares it to the live Spark query.

Runs the FULL replay registry at sf0.001 (a few seconds per query);
`python tools/replay_check.py` runs the same comparisons standalone at
any SF (recorded green registry-wide at sf0.001 and sf0.01 in round
11)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from replays import REPLAYS, Tables  # noqa: E402

# r13: the full 235-entry replay sweep measured 257 s — the single
# biggest block of the 32m45s suite that kept the driver's verify from
# finishing. It is the canonical "slow replay suite" the round-12
# verdict told us to tier: excluded from the default driver-budget run
# (pytest.ini), still run in full via `-m slow` in the closing gate
# and standalone via tools/replay_check.py.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tables(sf_dir):
    return Tables(sf_dir)


def test_replay_constants_match_production():
    """Replays redeclare production constants literally; drift must
    fail loudly, not silently diverge the comparison."""
    import replay_check

    assert replay_check.check_constants() == []


def test_codec_golden_vectors(spark):
    """Bit-exact golden vectors: spec-constructed payloads (hand-
    derived JPEG Huffman scans, hand-packed GIF LZW including the
    code-width bump and the KwKwK case, hand-filtered PNG scanlines)
    against the production decoders — the one gate where decoder and
    encoder cannot share a bug."""
    import replay_check

    assert replay_check.check_goldens(spark) == []


@pytest.mark.parametrize("name", sorted(REPLAYS))
def test_replay(name, spark, sf_dir, tables):
    import replay_check

    from sandbox_data_pipeline_spark.queries import registry

    qs, _ = registry()
    spark_pd = qs[name](spark, sf_dir).toPandas()
    rep_pd = REPLAYS[name](tables)
    errs = replay_check.compare(name, spark_pd, rep_pd)
    assert not errs, f"{name}: " + "; ".join(errs)
