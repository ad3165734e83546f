"""Property-based tests (hypothesis) for the cross-engine invariants
the oracle gate relies on, and for operator algebraic laws."""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from sandbox_data_pipeline_spark.functions.core import clean_cocktail_json

# JSON-safe scalar leaves; repr() of the dict is the python-repr form
# the reference's API payloads arrive in.
_leaf = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.text(
        alphabet=st.characters(blacklist_characters="'\"\\\n\r", min_codepoint=32),
        max_size=20,
    ),
)
_doc = st.dictionaries(
    st.text(alphabet="abcdefghij_", min_size=1, max_size=8),
    st.one_of(_leaf, st.lists(_leaf, max_size=4)),
    max_size=6,
)


@given(_doc)
@settings(max_examples=200, deadline=None)
def test_clean_json_roundtrips_python_repr(doc):
    """repr(dict) → clean_cocktail_json → json.loads recovers the doc
    (the X2/P11 contract for arbitrary payload shapes, not just the
    golden fixture)."""
    assert json.loads(clean_cocktail_json(repr(doc))) == doc


@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=50, unique=True))
@settings(max_examples=5, deadline=None)
def test_portable_hash_matches_duckdb(strings):
    """portable_hash (Spark conv/substring/md5) must equal DuckDB's
    ('0x'||substr(md5(s),1,15))::BIGINT for arbitrary strings — the
    invariant every dedup oracle is built on. Batched: one Spark job
    per example set."""
    import duckdb

    from sandbox_data_pipeline_spark.operators.dedup import portable_hash
    from sandbox_data_pipeline_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("pytest", shuffle_partitions=8)
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r.s: r.h for r in df.select("s", portable_hash(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    for s in strings:
        (expect,) = con.execute(
            "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)", [s]
        ).fetchone()
        assert got[s] == expect, s
