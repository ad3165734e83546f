"""Unigram-LM tokenizer: driver-EM trainer, pure-Python Viterbi
reference, the JVM aggregate DP, and the Arrow encode path — all
pinned against each other."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.operators.unigram import (
    train_unigram,
    unigram_encode,
    unigram_train_from_docs,
    viterbi_cost,
    viterbi_py,
)

COSTS = {
    **{c: 3.0 for c in "abcdefghijklmnopqrstuvwxyz "},
    "ab": 4.5,
    "bc": 4.5,
    "abc": 5.5,
}


def test_viterbi_py_prefers_cheapest_then_fewest():
    cost, pieces = viterbi_py("abc", COSTS)
    assert pieces == ["abc"] and cost == 5.5
    cost2, pieces2 = viterbi_py("abab", COSTS)
    assert pieces2 == ["ab", "ab"] and cost2 == 9.0
    # unknown single char takes the UNK cost, never crashes
    cost3, pieces3 = viterbi_py("aZ", COSTS)
    assert pieces3 == ["a", "Z"] and cost3 == 23.0
    assert viterbi_py("", COSTS) == (0.0, [])


def test_jvm_viterbi_matches_python(spark):
    texts = [
        "abcabc",
        "the quick abc",
        "zzz",
        "a",
        "ababab bcbc",
        "",  # sequence(1,0) yields [1,0] — the guarded base case
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    v = viterbi_cost("text", COSTS, max_piece=3)
    got = {
        r["doc_id"]: (r["c"], r["n"])
        for r in df.select("doc_id", v.alias("v")).select(
            "doc_id", "v.c", "v.n"
        ).collect()
    }
    for i, t in enumerate(texts):
        c, pieces = viterbi_py(t, COSTS)
        assert got[i] == (c, len(pieces)), (t, got[i], c, pieces)


def test_unigram_encode_roundtrip_and_cost(spark):
    texts = ["abc ab bc", "the table"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in unigram_encode(df, COSTS).collect()}
    for i, t in enumerate(texts):
        c, pieces = viterbi_py(t, COSTS)
        assert "".join(rows[i]["pieces"]) == t  # lossless
        assert rows[i]["pieces"] == pieces
        assert rows[i]["cost"] == c and rows[i]["n_pieces"] == len(pieces)


def test_trainer_learns_planted_piece():
    wc = [("abab", 50), ("ab", 30), ("cd", 5), ("abcd", 10)]
    costs = train_unigram(wc, vocab_size=8, iterations=3, max_piece=3)
    # the dominant 'ab' piece must survive pruning and beat spelling
    # it out char by char
    assert "ab" in costs
    assert costs["ab"] < costs["a"] + costs["b"]
    # coverage invariant: every seen character keeps a cost
    for ch in "abcd":
        assert ch in costs
    # determinism: identical input -> identical table
    assert costs == train_unigram(wc, vocab_size=8, iterations=3, max_piece=3)


def test_train_from_docs_bounded_guard(spark):
    df = spark.createDataFrame(
        [(1, "ab ab ab cd"), (2, "ab cd cd")], "doc_id long, text string"
    )
    costs = unigram_train_from_docs(df, vocab_size=8)
    assert "ab" in costs
    with pytest.raises(ValueError, match="exceeds"):
        unigram_train_from_docs(df, vocab_size=8, max_types=1)


def test_registry_query_matches_python_reference(spark):
    from sandbox_data_pipeline_spark.queries.text import (
        UNIGRAM_VOCAB,
        q_unigram_segment_cost,
    )

    got = {
        r["doc_id"]: (r["n_chars"], r["seg_cost"], r["n_pieces"])
        for r in q_unigram_segment_cost(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    from sandbox_data_pipeline_spark.catalog import table as _table

    docs = {
        r["doc_id"]: r["text"]
        for r in _table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .collect()
    }
    import random

    for did in random.Random(8).sample(sorted(docs), 20):
        c, pieces = viterbi_py(docs[did], UNIGRAM_VOCAB)
        assert got[did] == (len(docs[did]), round(c, 2), len(pieces))


def test_batch_viterbi_matches_python_and_jvm(spark):
    from sandbox_data_pipeline_spark.operators.unigram import viterbi_batch

    texts = ["abcabc", "the quick abc", "zzz", "a", "", "ababab bcbc"]
    c, n = viterbi_batch(texts, COSTS)
    for i, t in enumerate(texts):
        rc, pieces = viterbi_py(t, COSTS)
        assert (c[i], n[i]) == (rc, len(pieces)), t


def test_batch_viterbi_dense_equals_pandas_fallback():
    """r12: the dense codepoint-matrix fast path and the pandas-slice
    fallback (above VITERBI_DENSE_CELL_CAP) must be bit-identical —
    same cost floats, same piece counts — on mixed ascii / non-ascii /
    empty / unknown-char inputs, and both must match viterbi_py."""
    import random

    import numpy as np

    import sandbox_data_pipeline_spark.operators.unigram as U

    rng = random.Random(31)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789 XYä€\U0001d11e"
    texts = ["", "abc ab bc", "älpha"]
    texts += [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 70)))
        for _ in range(120)
    ]
    dense_c, dense_n = U.viterbi_batch(texts, COSTS)
    cap = U.VITERBI_DENSE_CELL_CAP
    U.VITERBI_DENSE_CELL_CAP = 0  # force the pandas fallback
    try:
        fb_c, fb_n = U.viterbi_batch(texts, COSTS)
    finally:
        U.VITERBI_DENSE_CELL_CAP = cap
    assert (dense_c == fb_c).all() and (dense_n == fb_n).all()
    for i, t in enumerate(texts):
        rc, pieces = viterbi_py(t, COSTS)
        assert (dense_c[i], dense_n[i]) == (rc, len(pieces)), t
    assert np.asarray(dense_c).dtype == np.float64


def test_batch_viterbi_max_piece_over_3_routes_to_pandas():
    """r13 (r12 ADVICE): the dense path packs pieces at 21 bits per
    codepoint into int64, which only fits max_piece <= 3. max_piece=4
    with a 4-char vocab piece must neither raise nor wrap — it routes
    to the pandas fallback and matches it exactly."""
    import sandbox_data_pipeline_spark.operators.unigram as U

    costs = {"abcd": 1.0, "ab": 3.0, "cd": 3.0, "a": 5.0, "b": 5.0,
             "c": 5.0, "d": 5.0}
    texts = ["abcd", "abcdabcd", "dcba", ""]
    c4, n4 = U.viterbi_batch(texts, costs, max_piece=4)
    cap = U.VITERBI_DENSE_CELL_CAP
    U.VITERBI_DENSE_CELL_CAP = 0
    try:
        fb_c, fb_n = U.viterbi_batch(texts, costs, max_piece=4)
    finally:
        U.VITERBI_DENSE_CELL_CAP = cap
    assert (c4 == fb_c).all() and (n4 == fb_n).all()
    # the 4-char piece must actually win where it applies
    assert c4[0] == 1.0 and n4[0] == 1


def test_batch_viterbi_nan_cost_is_a_miss_on_both_paths():
    """r13 (r12 ADVICE): a NaN vocab cost must act as a MISS (UNK/INF
    default) on the dense path exactly as the pandas dict-map path
    treats it — not propagate NaN through the DP."""
    import math

    import sandbox_data_pipeline_spark.operators.unigram as U

    costs = {"ab": float("nan"), "a": 2.0, "b": 2.0}
    texts = ["ab", "aab"]
    dense_c, dense_n = U.viterbi_batch(texts, costs)
    cap = U.VITERBI_DENSE_CELL_CAP
    U.VITERBI_DENSE_CELL_CAP = 0
    try:
        fb_c, fb_n = U.viterbi_batch(texts, costs)
    finally:
        U.VITERBI_DENSE_CELL_CAP = cap
    assert (dense_c == fb_c).all() and (dense_n == fb_n).all()
    assert not any(math.isnan(x) for x in dense_c)
    # 'ab' decomposes as a+b (4.0), never the NaN bigram
    assert dense_c[0] == 4.0 and dense_n[0] == 2


def test_viterbi_cost_df_matches_reference(spark):
    from sandbox_data_pipeline_spark.operators.unigram import viterbi_cost_df

    texts = ["abc ab bc", "the table", "x"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_chars"], r["seg_cost"], r["n_pieces"])
        for r in viterbi_cost_df(df, COSTS).collect()
    }
    for i, t in enumerate(texts):
        rc, pieces = viterbi_py(t, COSTS)
        assert got[i] == (len(t), round(rc, 2), len(pieces))
