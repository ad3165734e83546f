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


@given(
    st.lists(
        st.decimals(
            min_value="-9999999999.99",
            max_value="9999999999.99",
            places=2,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=10, deadline=None)
def test_decimal_sum_matches_duckdb_exactly(values):
    """The TPC-H numeric discipline: SUM over decimal(12,2) inputs is
    bit-identical between DuckDB's aggregation and exact Python Decimal
    arithmetic, regardless of input order — the invariant that lets the
    oracle hash decimal aggregates without rounding tolerance."""
    import duckdb
    from decimal import Decimal

    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DECIMAL(12,2))")
    con.executemany("INSERT INTO t VALUES (?)", [(str(v),) for v in values])
    (got,) = con.execute("SELECT SUM(v) FROM t").fetchone()
    assert Decimal(str(got)) == sum(Decimal(str(v)) for v in values)


@given(
    st.integers(min_value=1, max_value=65535),
    st.integers(min_value=1, max_value=65535),
    st.sampled_from(["png", "jpeg", "gif"]),
)
@settings(max_examples=50, deadline=None)
def test_probe_header_roundtrips_dimensions(w, h, fmt):
    """Header probing recovers exactly the dimensions encoded in the
    container header for any legal size."""
    from sandbox_data_pipeline_spark.operators.multimodal import probe_header

    if fmt == "png":
        blob = (
            b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x02\x00\x00\x00"
        )
    elif fmt == "jpeg":
        sof0 = (
            b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x11\x00"
        )
        blob = b"\xff\xd8" + sof0
    else:
        blob = b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    assert probe_header(blob) == (fmt, w, h)


def test_url_canonicalization_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) for the synthesized URL
    family — the property that makes the canonical form a valid dedup
    key (re-canonicalizing stored keys never splits groups)."""
    from pyspark.sql import functions as F

    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.operators.text import canonicalize_urls
    from sandbox_data_pipeline_spark.queries.text import _synth_url

    d = table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "source", _synth_url().alias("url")
    )
    once = canonicalize_urls(d).select("doc_id", F.col("canonical_url").alias("url"))
    twice = canonicalize_urls(once).select("doc_id", "canonical_url")
    m1 = {r.doc_id: r.url for r in once.collect()}
    m2 = {r.doc_id: r.canonical_url for r in twice.collect()}
    assert m1 == m2
