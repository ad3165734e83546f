"""Text-analysis operator semantics on crafted strings."""

from __future__ import annotations

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.operators.text import (
    bpe_ish_token_count,
    fingerprints,
    language_id,
    quality_features,
    token_count,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_token_counts(spark):
    df = _df(spark, [(0, "hello world", "en"), (1, "", "en"), (2, "one", "en")])
    got = {r.doc_id: r for r in df.select(
        "doc_id", token_count().alias("n"), bpe_ish_token_count().alias("b")).collect()}
    assert got[0].n == 2 and got[1].n == 0 and got[2].n == 1
    assert got[0].b == 2


def test_bpe_ish_splits_punct_and_digits(spark):
    df = _df(spark, [(0, "don't stop2day!", "en")])
    # don | ' | t | stop | 2 | day | !  -> 7
    assert df.select(bpe_ish_token_count().alias("b")).first().b == 7


def test_quality_features_ranges(spark):
    df = _df(spark, [(0, "the cat sat on the mat, happily.", "en"),
                     (1, "1234 5678 9999", "en")])
    got = {r.doc_id: r for r in quality_features(df).collect()}
    good, bad = got[0], got[1]
    assert good.quality_score > bad.quality_score
    assert bad.digit_ratio > 0.5
    assert 0 <= good.punct_ratio < 0.2
    assert good.stopword_ratio > 0


def test_language_id_markers(spark):
    df = _df(spark, [(0, "the cat and the dog is here", "en"),
                     (1, "der hund und die katze ist hier", "de"),
                     (2, "zzz qqq www", "xx")])
    got = {r.doc_id: r.lang_guess for r in language_id(df).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "und"


def test_language_id_model_hook(spark):
    """The pandas_udf model hook: a stub model drives the vectorized
    path end-to-end, and the pandas reference model agrees with the
    column-expression heuristic on real data."""
    import pandas as pd

    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.operators.text import (
        heuristic_batch_model,
        language_id_model,
    )

    df = _df(spark, [(0, "the cat and the dog is here", "en"),
                     (1, "der hund und die katze ist hier", "de")])
    # arbitrary stub model: proves any batch callable plugs in
    stub = lambda texts: pd.Series(["xx"] * len(texts), index=texts.index)
    got = language_id_model(df, stub).collect()
    assert {r.lang_guess for r in got} == {"xx"}
    assert {r.lang_declared for r in got} == {"en", "de"}

    # the reference batch model reproduces the heuristic exactly
    docs = table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    heur = {r.doc_id: r.lang_guess for r in language_id(docs).collect()}
    modl = {r.doc_id: r.lang_guess
            for r in language_id_model(docs, heuristic_batch_model).collect()}
    assert modl == heur


def test_winnow_fingerprints_detect_embedded_copy(spark):
    """Winnowing guarantee: any copied passage of >= w+k-1 tokens shares
    at least one selected fingerprint with the original, regardless of
    position; unrelated docs share none."""
    from sandbox_data_pipeline_spark.operators.text import winnow_fingerprints

    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = _df(spark, [
        (0, f"{passage} tail words here now", "en"),
        (1, f"lead in words {passage}", "en"),          # shifted copy
        (2, "totally unrelated content words apple pear plum fig date", "en"),
    ])
    fps = winnow_fingerprints(df, k=4, w=5).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[0] & by_doc[1]          # overlap survives the shift
    assert not (by_doc[0] & by_doc[2])    # no spurious sharing
    # selection compresses: far fewer fingerprints than k-grams
    n_grams = len(df.where("doc_id = 0").first().text.split()) - 4 + 1
    assert len(by_doc[0]) < n_grams


def test_fingerprint_order_invariant(spark):
    df = _df(spark, [(0, "b a c a", "en"), (1, "a b c", "en"), (2, "a b d", "en")])
    got = {r.doc_id: r.fingerprint for r in fingerprints(df).collect()}
    assert got[0] == got[1]  # order + duplication invariant
    assert got[0] != got[2]


def test_hash_split_deterministic_and_leak_free(spark):
    from sandbox_data_pipeline_spark.operators.text import hash_split

    docs = spark.createDataFrame(
        [(1, "the same text"), (2, "the same text"), (3, "other text")]
        + [(i, f"doc number {i}") for i in range(10, 210)],
        "doc_id long, text string",
    )
    ratios = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = {r.doc_id: r.split for r in hash_split(docs, ratios).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs, ratios).collect()}
    assert a == b  # reproducible
    assert a[1] == a[2]  # exact duplicates cannot straddle splits
    train_frac = sum(1 for s in a.values() if s == "train") / len(a)
    assert 0.8 < train_frac < 1.0  # ratio holds approximately


def test_pii_scrub_redacts_and_counts(spark):
    from sandbox_data_pipeline_spark.operators.text import pii_scrub

    df = _df(spark, [
        (0, "mail me at jane.doe+x@corp.example.org or call 555-123-4567", "en"),
        (1, "no pii here", "en"),
        (2, "two mails a@b.io c@d.co and 111-222-3333 999-888-7777", "en"),
    ])
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert got[0].n_emails == 1 and got[0].n_phones == 1
    assert got[0].text == "mail me at <EMAIL> or call <PHONE>"
    assert got[1].n_emails == 0 and got[1].n_phones == 0
    assert got[1].text == "no pii here"
    assert got[2].n_emails == 2 and got[2].n_phones == 2


def test_repetition_features(spark):
    from sandbox_data_pipeline_spark.operators.text import repetition_features

    df = _df(spark, [
        (0, "a a a a", "en"),          # 1 distinct of 4
        (1, "w x y z", "en"),          # all distinct
        (2, "", "en"),                  # empty -> NULL ratios
    ])
    got = {r.doc_id: r for r in repetition_features(df).collect()}
    assert got[0].n_tokens == 4 and got[0].n_distinct == 1
    assert got[0].dup_ratio == 0.75 and got[0].top_token_ratio == 1.0
    assert got[1].dup_ratio == 0.0 and got[1].top_token_ratio == 0.25
    assert got[2].n_tokens == 0 and got[2].dup_ratio is None


def test_filter_cascade_monotone(spark):
    from sandbox_data_pipeline_spark.queries.text import q_filter_cascade

    rows = q_filter_cascade(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert (
            r.n_total >= r.after_length >= r.after_lang
            >= r.after_tokens >= r.after_dedup >= 0
        )


def test_mixture_weights_rebalance(spark):
    from sandbox_data_pipeline_spark.queries.text import q_mixture_weights

    rows = q_mixture_weights(spark, "/root/testdata/sf0.001").collect()
    # reweighted mass is uniform: actual_frac * weight == 1 / n_langs
    n = len(rows)
    for r in rows:
        assert abs(r.actual_frac * r.weight - 1.0 / n) < 1e-12


def test_inverted_index_postings_sorted(spark):
    from sandbox_data_pipeline_spark.queries.text import q_inverted_index

    rows = q_inverted_index(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.postings == sorted(r.postings)
        assert r.doc_freq == len(r.postings)


def test_pack_sequences_reconciles(spark):
    from sandbox_data_pipeline_spark.queries.text import PACK_BUDGET, q_pack_sequences

    rows = q_pack_sequences(spark, "/root/testdata/sf0.001").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, bins in by_lang.items():
        ids = sorted(b.bin_id for b in bins)
        assert ids == list(range(len(ids)))  # contiguous bins from 0
        # every bin except possibly the last crossed the budget boundary:
        # cumulative fill means a bin closes only once the budget is hit
        for b in bins:
            if b.bin_id < len(ids) - 1:
                assert b.bin_tokens >= 1


def test_pack_manifest_consistent_with_bins(spark):
    from sandbox_data_pipeline_spark.queries.text import (
        q_pack_manifest,
        q_pack_sequences,
    )

    sf = "/root/testdata/sf0.001"
    bins = {(r.lang, r.bin_id): (r.n_docs, r.bin_tokens)
            for r in q_pack_sequences(spark, sf).collect()}
    manifest = {(r.lang, r.bin_id): (r.n_docs, r.bin_tokens)
                for r in q_pack_manifest(spark, sf).collect()}
    assert bins == manifest


def test_lang_confusion_shares_sum_to_one(spark):
    from sandbox_data_pipeline_spark.queries.text import q_lang_confusion

    rows = q_lang_confusion(spark, "/root/testdata/sf0.001").collect()
    by_decl = {}
    for r in rows:
        by_decl[r.lang_declared] = by_decl.get(r.lang_declared, 0.0) + r.share_of_declared
    for share in by_decl.values():
        assert abs(share - 1.0) < 1e-12


def test_gopher_rules_flags(spark):
    from sandbox_data_pipeline_spark.operators.text import gopher_rules

    docs = spark.createDataFrame(
        [
            # 50+ English-ish words: passes everything
            (1, " ".join(["the", "quick", "brown", "fox", "and", "dog"] * 10)),
            # too short
            (2, "tiny doc"),
            # long enough but all digits: fails alpha + stopwords + word len
            (3, " ".join(["12345"] * 60)),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert got[1]["passes_gopher"]
    assert not got[2]["ok_word_count"] and not got[2]["passes_gopher"]
    assert not got[3]["ok_alpha_words"] and not got[3]["ok_stopwords"]
    assert got[3]["ok_word_count"]  # 60 words is in band

    # threshold override tightens the gate
    strict = {r["doc_id"]: r for r in gopher_rules(docs, min_words=100).collect()}
    assert not strict[1]["ok_word_count"]


def test_perplexity_model_hook(spark):
    from sandbox_data_pipeline_spark.operators.text import (
        heuristic_perplexity_batch,
        perplexity_model,
    )

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "w x y z"), (3, "")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["perplexity"]
        for r in perplexity_model(docs, heuristic_perplexity_batch).collect()
    }
    # repetitive doc scores higher (lower type/token ratio), empty → 0
    assert got[1] == 4.0  # mean_len 1 / ttr 0.25
    assert got[2] == 1.0  # mean_len 1 / ttr 1.0
    assert got[3] == 0.0
    assert got[1] > got[2]


def test_mixture_sample_uniform_per_lang(spark, sf_dir):
    from pyspark.sql import functions as F

    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.queries.text import q_mixture_sample

    sample = q_mixture_sample(spark, sf_dir)
    per_lang = {r.lang: r.n for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    source_langs = {
        r.lang for r in table(spark, sf_dir, "documents").select("lang").distinct().collect()
    }
    assert set(per_lang) == source_langs  # every language survives
    assert len(set(per_lang.values())) == 1  # exactly uniform mix
    # sample is a subset of the corpus
    assert sample.join(
        table(spark, sf_dir, "documents"), "doc_id", "left_anti"
    ).count() == 0


def test_source_quota_caps_and_is_deterministic(spark):
    from sandbox_data_pipeline_spark.operators.text import source_quota

    docs = spark.createDataFrame(
        [(i, "s" + str(i % 2), f"text {i}") for i in range(20)],
        "doc_id long, source string, text string",
    )
    got = source_quota(docs, quota=3).collect()
    assert len(got) == 6  # 3 per source
    assert all(r.quota_rank <= 3 for r in got)
    again = source_quota(docs, quota=3).collect()
    assert sorted((r.doc_id, r.quota_rank) for r in got) == sorted(
        (r.doc_id, r.quota_rank) for r in again
    )
    # survivors are hash-chosen, not just the lowest ids
    assert {r.doc_id for r in got} != set(range(6))


def test_canonicalize_urls_normalizations(spark):
    from sandbox_data_pipeline_spark.operators.text import canonicalize_urls

    cases = [
        (1, "HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&b=2&a=1"),
        (2, "https://ex.com/a/b?a=1&b=2"),
        (3, "http://ex.com:8080/a//"),
        (4, "http://EX.com:80/"),
        (5, "https://ex.com/a/b?gclid=z&fbclid=y"),
    ]
    df = spark.createDataFrame(cases, "doc_id long, url string")
    got = {r.doc_id: r for r in canonicalize_urls(df).collect()}
    # case, www, default port, trailing slash, utm strip, param sort
    assert got[1].canonical_url == "https://ex.com/a/b?a=1&b=2"
    assert got[1].canonical_url == got[2].canonical_url  # re-fetch collapses
    assert got[3].canonical_url == "http://ex.com:8080/a"  # non-default port kept
    assert got[4].canonical_url == "http://ex.com/"  # default port dropped, root path
    assert got[5].canonical_url == "https://ex.com/a/b"  # only tracking params → none
    assert got[1].host == "ex.com"


def test_budget_select_respects_budget_and_quality_order(spark):
    from sandbox_data_pipeline_spark.queries.text import TOKEN_BUDGET, q_budget_select

    rows = q_budget_select(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, docs in by_lang.items():
        assert max(d.cum_tokens for d in docs) <= TOKEN_BUDGET
        ordered = sorted(docs, key=lambda d: d.cum_tokens)
        scores = [d.score for d in ordered]
        assert scores == sorted(scores, reverse=True), lang


def test_weighted_sample_favors_heavy_weights_deterministically(spark):
    from pyspark.sql import functions as F

    from sandbox_data_pipeline_spark.operators.text import weighted_sample

    docs = spark.createDataFrame(
        [(i, "g", f"document body number {i}") for i in range(100)],
        "doc_id long, group string, text string",
    )
    # one dominant weight: u^(1/1000) ≈ 1 beats u^(100) for any u<1
    w = F.when(F.col("doc_id") == 37, F.lit(1000.0)).otherwise(F.lit(0.01))
    got = weighted_sample(docs, weight=w, k=5, group_col="group").collect()
    assert len(got) == 5
    assert 37 in {r.doc_id for r in got}
    again = weighted_sample(docs, weight=w, k=5, group_col="group").collect()
    assert sorted((r.doc_id, r.sample_rank) for r in got) == sorted(
        (r.doc_id, r.sample_rank) for r in again
    )
    # ungrouped path returns a global sample of k
    uni = weighted_sample(docs, weight=F.lit(1.0), k=7).collect()
    assert len(uni) == 7


def test_curation_pipeline_stage_invariants(spark):
    from sandbox_data_pipeline_spark.queries.dedup import EVAL_MOD
    from sandbox_data_pipeline_spark.queries.text import (
        QUALITY_CUT,
        SOURCE_QUOTA,
        TOKEN_BUDGET,
        q_curation_pipeline,
    )

    rows = q_curation_pipeline(spark, "/root/testdata/sf0.001").collect()
    assert rows
    from collections import Counter

    assert all(r.score >= QUALITY_CUT for r in rows)
    assert all(r.doc_id % EVAL_MOD != 0 for r in rows)  # eval slice excluded
    per_source = Counter(r.source for r in rows)
    assert max(per_source.values()) <= SOURCE_QUOTA
    per_lang_max = {}
    for r in rows:
        per_lang_max[r.lang] = max(per_lang_max.get(r.lang, 0), r.cum_tokens)
    assert all(v <= TOKEN_BUDGET for v in per_lang_max.values())


def test_unigram_cross_entropy_orders_rarity(spark):
    """A doc of only the corpus's commonest token scores fewer
    bits/token than a doc holding the rarest; counts conserve."""
    from sandbox_data_pipeline_spark.operators.text import unigram_cross_entropy

    docs = spark.createDataFrame(
        [
            (1, "the the the the"),
            (2, "the the the zyx"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in unigram_cross_entropy(docs).collect()}
    assert rows[1]["n_tokens"] == 4 and rows[2]["n_tokens"] == 4
    # p(the)=7/8 → doc1 bits = -log2(7/8); doc2 mixes in p(zyx)=1/8
    assert rows[1]["bits_per_token"] < rows[2]["bits_per_token"]
    import math

    assert abs(rows[1]["bits_per_token"] - (-math.log2(7 / 8))) < 1e-3


def test_quality_sweep_monotone(spark, sf_dir):
    from sandbox_data_pipeline_spark.queries.text import (
        SWEEP_THRESHOLDS,
        q_quality_sweep,
    )

    rows = sorted(
        q_quality_sweep(spark, sf_dir).collect(), key=lambda r: r["threshold"]
    )
    assert len(rows) == len(SWEEP_THRESHOLDS)
    assert rows[0]["docs_kept"] > 0
    for a, b in zip(rows, rows[1:]):
        assert b["docs_kept"] <= a["docs_kept"]
        assert b["tokens_kept"] <= a["tokens_kept"]


def test_bigram_cross_entropy_contract(spark):
    """A perfectly predictable sequence (every bigram deterministic
    given its context) scores 0 bits; injecting an alternative
    continuation for a context raises it above 0."""
    from sandbox_data_pipeline_spark.operators.text import bigram_cross_entropy

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b a c")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in bigram_cross_entropy(docs).collect()}
    # doc 2 makes context 'a' ambiguous (b or c), so even doc 1 pays
    # bits on its a->b transitions; b->a stays deterministic
    assert rows[1]["n_bigrams"] == 5 and rows[2]["n_bigrams"] == 3
    assert rows[2]["bits_per_bigram"] > rows[1]["bits_per_bigram"] > 0


def test_bm25_matches_pure_python(spark):
    """BM25 scores vs an independent pure-Python implementation on the
    same parquet (guards the formula beyond the SQL oracle)."""
    import math

    import pandas as pd

    from sandbox_data_pipeline_spark.queries.text import BM25_TERMS, q_bm25_topk

    sf = "/root/testdata/sf0.001"
    pdf = pd.read_parquet(f"{sf}/documents.parquet")
    docs = {r.doc_id: [w for w in r.text.split(" ") if w] for r in pdf.itertuples()}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    df = {
        t: sum(1 for v in docs.values() if t in v) for t in BM25_TERMS
    }
    k1, b = 1.2, 0.75

    def score(toks):
        s = 0.0
        for t in BM25_TERMS:
            tf = toks.count(t)
            if not tf or not df[t]:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        return s

    want = sorted(
        ((round(score(v), 6), d) for d, v in docs.items() if score(v) > 0),
        key=lambda x: (-x[0], x[1]),
    )[:20]
    got = q_bm25_topk(spark, sf).orderBy("rank").collect()
    assert len(got) == min(20, len(want))
    for row, (s, d) in zip(got, want):
        assert row["doc_id"] == d
        assert abs(row["bm25"] - s) < 1e-9
        assert row["n_terms_hit"] >= 1
