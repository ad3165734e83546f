"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristics, document fingerprinting.

All pure column expressions (split/regexp/array functions) — the whole
family runs inside whole-stage codegen with zero shuffles; at 100 TB
these are embarrassingly parallel scan-projections whose cost is the
parquet read itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.queries._envproof import stable_round

# Minimal per-language stopword markers for the heuristic language ID.
# (A real pipeline swaps in fastText or CLD3 via a pandas_udf; the
# heuristic keeps the operator dependency-free and oracle-checkable.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
}


def tokens(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count (empty string → 0 tokens)."""
    return F.when(F.col(text_col) == "", F.lit(0)).otherwise(
        F.size(F.filter(tokens(text_col), lambda t: t != F.lit("")))
    )


BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """BPE-ish proxy: counts the segments a GPT-2-style pre-tokenizer
    would split on — runs of letters, runs of digits, single
    punctuation. regexp_count keeps it a pure scan expression."""
    return F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN))


def quality_score(text_col: str = "text") -> Column:
    """Composite quality score in [0,1] as a single column expression:
    rewards stopword presence and lexical diversity, penalizes
    digit/punct noise. Usable standalone (streaming quality gates) or
    through quality_features."""
    n_chars = F.length(F.col(text_col))
    n_tok = token_count(text_col)
    n_digit = F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", ""))
    n_stop = F.size(F.filter(tokens(text_col), lambda t: t.isin(*LANG_MARKERS["en"])))
    n_distinct = F.size(F.array_distinct(tokens(text_col)))
    return stable_round(
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                0.5 * (n_stop / n_tok) + 0.5 * (n_distinct / n_tok) - n_digit / n_chars,
            ),
        ),
        4,
    )


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / repetition features + a
    composite quality score in one projection."""
    n_chars = F.length(F.col(text_col))
    n_tok = token_count(text_col)
    n_space = n_chars - F.length(F.regexp_replace(F.col(text_col), " ", ""))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,!?;:]", ""))
    n_digit = F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", ""))
    n_stop = F.size(
        F.filter(tokens(text_col), lambda t: t.isin(*LANG_MARKERS["en"]))
    )
    n_distinct = F.size(F.array_distinct(tokens(text_col)))
    avg_tok_len = (n_chars - n_space) / n_tok
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        stable_round(avg_tok_len, 4).alias("avg_token_len"),
        stable_round(n_punct / n_chars, 4).alias("punct_ratio"),
        stable_round(n_digit / n_chars, 4).alias("digit_ratio"),
        stable_round(n_stop / n_tok, 4).alias("stopword_ratio"),
        stable_round(n_distinct / n_tok, 4).alias("distinct_ratio"),
        quality_score(text_col).alias("quality_score"),
    )


def _in_set(markers: tuple[str, ...]):
    # closure (not a default arg: F.filter passes a Column per lambda
    # parameter, so extra params break)
    return lambda t: t.isin(*markers)


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    toks = tokens(text_col)
    return {
        lang: F.size(F.filter(toks, _in_set(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits
    (deterministic tie-break by language code order), 'und' if no
    marker hits at all."""
    scores = lang_scores(text_col)
    best = F.greatest(*scores.values())
    # deterministic argmax: first language (in sorted code order)
    # achieving the max hit count
    expr = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    expr = F.when(best == 0, F.lit("und")).otherwise(expr)
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        expr.alias("lang_guess"),
        *[scores[lang].alias(f"hits_{lang}") for lang in sorted(LANG_MARKERS)],
    )


def language_id_model(
    docs: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Model-backed language ID: plug a REAL detector (fastText, CLD3,
    lingua — any callable mapping a pandas Series of texts to a pandas
    Series of language codes) into the same output contract as the
    heuristic ``language_id``.

    The model rides an Arrow-batched pandas UDF — texts cross to Python
    in columnar batches, the model scores a whole batch per call
    (fastText's predict is batch-native), and the operator stays a pure
    map-side projection: no shuffle, embarrassingly parallel at 100 TB.
    The stopword heuristic remains the dependency-free, oracle-checkable
    default; this is the production hook it documents."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _lid_fn(texts):
        out = model(texts)
        if not isinstance(out, pd.Series):
            out = pd.Series(list(out), index=texts.index)
        return out.astype(str)

    # real (non-string) annotations: this module uses `from __future__
    # import annotations`, which would leave pandas_udf unable to infer
    # the Series->Series eval type from stringified hints
    _lid_fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _lid = pandas_udf(_lid_fn, "string")

    return docs.select(
        id_col,
        F.col("lang").alias("lang_declared"),
        _lid(F.col(text_col)).alias("lang_guess"),
    )


def heuristic_batch_model(texts):
    """Reference implementation of the ``language_id_model`` contract:
    the same stopword-marker argmax as ``language_id``, vectorized in
    pandas. Useful as a stub in tests and as the shape a fastText
    adapter should follow (load the model once per executor at module
    or closure scope, not per batch)."""
    import pandas as pd

    markers = {lang: set(ms) for lang, ms in LANG_MARKERS.items()}

    def one(text: str) -> str:
        toks = text.split(" ")
        hits = {lang: sum(t in ms for t in toks) for lang, ms in markers.items()}
        best = max(hits.values())
        if best == 0:
            return "und"
        return min(lang for lang, h in hits.items() if h == best)

    return pd.Series([one(t) for t in texts], index=texts.index)


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized document fingerprint: md5 over the sorted distinct
    token set — invariant to word order and duplication, the cheap
    first pass before shingle-level near-dup machinery."""
    sorted_toks = F.array_sort(F.array_distinct(tokens(text_col)))
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", sorted_toks)).alias("fingerprint"),
        F.size(sorted_toks).alias("vocab_size"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every k-token gram, slide a window of w hashes,
    keep each window's minimum — the selected set is position-robust
    (guaranteed to share fingerprints with any copy that overlaps by
    w+k-1 tokens) and ~1/w the size of the full gram set.

    Entirely row-local array expressions (transform/slice/array_min)
    inside whole-stage codegen — zero shuffle until the output
    explode/distinct, so at 100 TB the cost is the scan. Output:
    (doc_id, fp) one row per distinct selected fingerprint."""
    toks = F.split(F.col(text_col), " ")
    grams = F.expr(
        f"transform(sequence(0, size(_toks) - {k}), i -> cast("
        f"conv(substring(md5(concat_ws(' ', slice(_toks, i + 1, {k}))), 1, 15), 16, 10)"
        " as bigint))"
    )
    wins = F.expr(
        f"transform(sequence(0, size(_h) - {w}), j -> array_min(slice(_h, j + 1, {w})))"
    )
    return (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .where(F.size("_toks") >= k + w - 1)
        .select(id_col, grams.alias("_h"))
        .select(id_col, F.explode(F.array_distinct(wins)).alias("fp"))
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document (smooth idf:
    ln((N+1)/(df+1)) + 1). Three partial-combined aggregations — tf per
    (doc, token), df per token, N — then a token-keyed join and a
    per-doc top-k window. The df table is vocabulary-sized; at corpus
    scale it is the natural broadcast candidate and AQE will pick that
    up when it fits. Scores round to 6 decimals BEFORE ranking so rank
    order is identical across engines' libm ulp differences."""
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).where(F.col("token") != "")
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1), 6
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "token", F.col("tf").alias("tf"), F.round("score", 4).alias("score"))
    )


def hash_split(
    docs: DataFrame,
    ratios: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "split",
) -> DataFrame:
    """Deterministic dataset split (train/val/test) by CONTENT hash:
    bucket = portable 60-bit md5 hash of (salt || text) mod 10000,
    mapped to the named split by cumulative ratio. Reproducible across
    runs, engines, and partitionings — unlike randomSplit, whose
    assignment depends on partition layout — and keyed on content so
    exact duplicates always land in the same split (no train/test
    leakage through duplicated documents). Pure map-side; no shuffle."""
    from sandbox_data_pipeline_spark.operators.dedup import portable_hash

    assert abs(sum(ratios.values()) - 1.0) < 1e-9, "ratios must sum to 1"
    bucket = F.pmod(portable_hash(F.col(text_col), salt=salt), F.lit(10_000))
    # cumulative thresholds in a fixed order (largest ratio first,
    # name as tiebreak) — the order is part of the split contract
    cum = 0.0
    cases: list[tuple[int, str]] = []
    for name, frac in sorted(ratios.items(), key=lambda kv: (-kv[1], kv[0])):
        cum += frac
        cases.append((int(round(cum * 10_000)), name))
    split = F.lit(cases[-1][1])
    for threshold, name in reversed(cases[:-1]):
        split = F.when(bucket < threshold, F.lit(name)).otherwise(split)
    return docs.select(F.col(id_col), bucket.alias("bucket"), split.alias("split"))


# --- PII scrubbing ----------------------------------------------------------

# Patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): character classes + bounded repetition only.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails/phone numbers and count what was removed.

    Pure regexp expressions (regexp_count + regexp_replace) — map-side,
    codegen'd, zero shuffle; at 100 TB this is a scan-projection whose
    cost is the parquet read. A production pipeline extends the pattern
    table (SSNs, credit cards, IPs); the mechanism is unchanged.
    """
    t = F.col(text_col)
    return docs.withColumns(
        {
            "n_emails": F.regexp_count(t, F.lit(EMAIL_PATTERN)),
            "n_phones": F.regexp_count(t, F.lit(PHONE_PATTERN)),
            text_col: F.regexp_replace(
                F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>"),
                PHONE_PATTERN,
                "<PHONE>",
            ),
        }
    )


def repetition_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Intra-document repetition (Gopher-style boilerplate signals):
    duplicate-token fraction and most-frequent-token share. Computed
    entirely with nested higher-order array lambdas — row-local, no
    explode, no shuffle; per-row cost is O(vocab x tokens), bounded by
    document width, independent of corpus size."""
    toks = F.filter(tokens(text_col), lambda t: t != F.lit(""))
    n = F.size(toks)
    dist = F.array_distinct(toks)
    top = F.array_max(
        F.transform(dist, lambda d: F.size(F.filter(toks, lambda t: t == d)))
    )
    nonempty = n > 0
    return docs.select(
        id_col,
        n.alias("n_tokens"),
        F.size(dist).alias("n_distinct"),
        F.when(nonempty, stable_round(F.lit(1.0) - F.size(dist) / n, 4)).alias("dup_ratio"),
        F.when(nonempty, stable_round(top / n, 4)).alias("top_token_ratio"),
    )


# --- Gopher-style quality rules --------------------------------------------

# Doc-level repetition/quality thresholds from the public Gopher paper
# (Rae et al. 2021, §A1.1): word-count band, mean-word-length band,
# symbol-to-word ratio, alphabetic-word ratio, minimum stopword hits.
# (The paper's line-level rules need newline structure this corpus
# lacks; the doc-level subset is the portable core.)
GOPHER_DEFAULTS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,
    "min_alpha_word_ratio": 0.8,
    "min_stop_hits": 2,
}


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **overrides,
) -> DataFrame:
    """Gopher quality-rule bundle: per-document measurements, one flag
    per rule, and the conjunctive ``passes_gopher`` gate.

    Pure column expressions (no UDF, no shuffle) so the whole bundle is
    a codegen'd scan-projection — at 100 TB its cost is the parquet
    read, and Catalyst prunes the scan to (id, text). Thresholds are
    keyword overrides so a pipeline can tighten/loosen per source;
    flags are emitted individually so the curation funnel can report
    attrition per rule (q_filter_cascade-style) instead of one opaque
    boolean."""
    p = {**GOPHER_DEFAULTS, **overrides}
    t = F.col(text_col)
    toks = F.filter(tokens(text_col), lambda x: x != F.lit(""))
    n_words = F.size(toks)
    mean_wl = F.length(F.regexp_replace(t, " ", "")) / n_words
    n_symbols = F.regexp_count(t, F.lit(r"#|\.\.\.")) 
    symbol_ratio = n_symbols / n_words
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    alpha_ratio = n_alpha / n_words
    n_stop = F.size(F.filter(toks, _in_set(LANG_MARKERS["en"])))

    f_words = (n_words >= p["min_words"]) & (n_words <= p["max_words"])
    f_wl = (mean_wl >= p["min_mean_word_len"]) & (mean_wl <= p["max_mean_word_len"])
    f_sym = symbol_ratio <= p["max_symbol_ratio"]
    f_alpha = alpha_ratio >= p["min_alpha_word_ratio"]
    f_stop = n_stop >= p["min_stop_hits"]

    return docs.select(
        id_col,
        n_words.alias("n_words"),
        stable_round(mean_wl, 4).alias("mean_word_len"),
        stable_round(symbol_ratio, 4).alias("symbol_ratio"),
        stable_round(alpha_ratio, 4).alias("alpha_word_ratio"),
        n_stop.alias("stop_hits"),
        f_words.alias("ok_word_count"),
        f_wl.alias("ok_mean_word_len"),
        f_sym.alias("ok_symbol_ratio"),
        f_alpha.alias("ok_alpha_words"),
        f_stop.alias("ok_stopwords"),
        (f_words & f_wl & f_sym & f_alpha & f_stop).alias("passes_gopher"),
    )


def perplexity_model(
    docs: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Model-backed perplexity scoring — the CCNet/Gopher-style language
    -model filter signal — behind the same hook contract as
    ``language_id_model``: ``model`` maps a pandas Series of texts to a
    Series of float perplexities (a KenLM wrapper's batch score, or any
    LM). Arrow-batched pandas UDF, map-side only: no shuffle, and the
    model loads once per executor when bound at closure scope.

    No oracle by design (a model score has no SQL twin); tests pin the
    contract with a deterministic stub."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _ppl_fn(texts):
        out = model(texts)
        if not isinstance(out, pd.Series):
            out = pd.Series(list(out), index=texts.index)
        return out.astype("float64")

    _ppl_fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _ppl = pandas_udf(_ppl_fn, "double")

    return docs.select(id_col, _ppl(F.col(text_col)).alias("perplexity"))


def unigram_cross_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained unigram cross-entropy per document — the
    oracle-verifiable core of the CCNet/Gopher LM-filter stage (CCNet
    uses a 5-gram KenLM; ``perplexity_model`` is the hook for that —
    this is the n=1 member of the same family whose math a SQL engine
    can replay exactly). Score = mean over tokens of -log2 p(token),
    p estimated from the corpus itself; high bits/token = far from the
    corpus distribution (gibberish or rare-domain), the standard
    filter axis.

    Plan shape: explode → vocab groupBy (partial-agg'd, vocab ≪
    corpus) → join token→probability back onto the exploded stream →
    per-doc re-agg. Two shuffles total (vocab count, doc re-agg); the
    token join is left to AQE — at web scale the vocab is Zipf-skewed
    and AQE's skew-join split handles the 'the' bucket.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).where(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            (-F.log2(F.col("cnt") / F.col("total"))).alias("bits"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("bits"), 4).alias("bits_per_token"),
    )


def heuristic_perplexity_batch(texts):
    """Deterministic stand-in for a real LM scorer (KenLM et al.),
    shaped like the ``perplexity_model`` contract: a crude unigram
    surprise — mean token length divided by type/token ratio — that is
    reproducible everywhere and monotone in the repetitiveness a real
    perplexity filter keys on."""
    import pandas as pd

    def one(text: str) -> float:
        toks = [t for t in text.split(" ") if t]
        if not toks:
            return 0.0
        mean_len = sum(len(t) for t in toks) / len(toks)
        ttr = len(set(toks)) / len(toks)
        return round(mean_len / max(ttr, 1e-9), 6)

    return pd.Series([one(t) for t in texts], index=texts.index)


# --- Source quotas ----------------------------------------------------------


def source_quota(
    docs: DataFrame,
    quota: int,
    key_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "quota",
) -> DataFrame:
    """Per-source document cap — the C4/RefinedWeb-style guard against
    one domain dominating the training mix. Keeps at most ``quota``
    docs per key, chosen by deterministic content-hash order (portable
    md5, same mechanism as hash_split) with doc id as tiebreak, so the
    survivor set is reproducible across runs, engines, and partition
    layouts — unlike a per-key LIMIT, whose pick is arbitrary.

    One shuffle on the key column; Spark's WindowGroupLimit pushes the
    rank filter below the sort, so each partition retains only ``quota``
    rows before the exchange. Skew note: the window partitions by the
    quota key itself — a mega-domain bottlenecks its single partition;
    at 100 TB pre-filter obvious giants or raise shuffle partitions so
    the hot key's partition fits memory."""
    from sandbox_data_pipeline_spark.operators.dedup import portable_hash

    w = Window.partitionBy(key_col).orderBy(
        portable_hash(F.col(text_col), salt=salt), F.col(id_col)
    )
    return (
        docs.withColumn("quota_rank", F.row_number().over(w))
        .where(F.col("quota_rank") <= quota)
        .select(F.col(id_col), F.col(key_col), "quota_rank")
    )


# --- URL canonicalization ---------------------------------------------------


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL canonicalization for crawl dedup: lowercase scheme+host,
    strip a leading ``www.``, drop scheme-default ports (:80 http /
    :443 https), collapse trailing path slashes, drop tracking params
    (utm_*, fbclid, gclid), and sort the surviving query params.

    Regexp-only parsing, no UDFs — every step is a codegen'd column
    expression written to parse identically under Java regex (Spark)
    and RE2 (DuckDB): anchored groups, no lookaround, LIKE avoided
    (its ``_`` wildcard is an escape-dialect trap). Pure map-side.

    Adds: host, canonical_url."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    authority = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    host = F.regexp_replace(
        F.regexp_replace(authority, r":[0-9]+$", ""), r"^www\.", ""
    )
    keep_port = (port != "") & ~(
        ((scheme == "https") & (port == "443")) | ((scheme == "http") & (port == "80"))
    )
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    canon_path = F.when(
        F.regexp_replace(path, r"/+$", "") == "", F.lit("/")
    ).otherwise(F.regexp_replace(path, r"/+$", ""))
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & (F.substring(p, 1, 4) != "utm_")
        & (F.substring(p, 1, 7) != "fbclid=")
        & (F.substring(p, 1, 6) != "gclid="),
    )
    canon_query = F.array_join(F.array_sort(params), "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        canon_path,
        F.when(canon_query != "", F.concat(F.lit("?"), canon_query)).otherwise(F.lit("")),
    )
    return df.withColumn("host", host).withColumn("canonical_url", canonical)


def weighted_sample(
    docs: DataFrame,
    weight: Column,
    k: int,
    group_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling without replacement, deterministic: the
    Efraimidis–Spirakis A-ES scheme with the uniform draw replaced by a
    portable content hash — key = u^(1/w), keep the k largest keys
    (per group when ``group_col`` is set). Higher-weight docs win
    proportionally more often, every run/engine/partitioning picks the
    SAME sample, and the selection is one window pass (WindowGroupLimit
    keeps per-task state at k).

    u is (hash(salt||text) % 2^20 + 0.5) / 2^20 — strictly inside
    (0,1) so the power key is finite; the key is rounded to 6 decimals
    with doc id as tiebreak, the same cross-engine float-drift policy
    as the ANN rankings. Weights must be strictly positive."""
    from sandbox_data_pipeline_spark.operators.dedup import portable_hash

    u = (
        F.pmod(portable_hash(F.col(text_col), salt=salt), F.lit(1 << 20))
        + F.lit(0.5)
    ) / F.lit(float(1 << 20))
    key = F.round(F.pow(u, F.lit(1.0) / weight), 6)
    w = (
        Window.partitionBy(group_col)
        if group_col
        else Window.partitionBy(F.lit(1))
    ).orderBy(F.col("_es_key").desc(), F.col(id_col))
    out = (
        docs.withColumn("_es_key", key)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )
    cols = [F.col(id_col)] + ([F.col(group_col)] if group_col else []) + [
        F.col("_es_key").alias("es_key"),
        "sample_rank",
    ]
    return out.select(*cols)


def bigram_cross_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained BIGRAM conditional cross-entropy per document —
    the n=2 member of the same family as ``unigram_cross_entropy``
    (CCNet's production filter is a 5-gram KenLM; each added order is
    one more count-join of exactly this shape). Score = mean over
    adjacent token pairs of -log2 p(w2 | w1), with p estimated from
    the corpus itself: c(w1,w2) / c(w1 as a left-context). Trained and
    applied on the same corpus, so every observed bigram has positive
    probability — no smoothing needed for the oracle-checkable core
    (a held-out scorer plugs in via ``perplexity_model``).

    Plan shape: ONE explode producing the (w1, w2) pair stream via
    array zip (map-side), a bigram-count groupBy and a left-context
    groupBy (both partial-combined), then two joins back and a per-doc
    re-agg. At web scale both count tables are Zipf-skewed — AQE's
    skew-join split handles the hot 'the ·' context bucket.
    """
    pairs = (
        docs.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"filter(zip_with(split({text_col}, ' '), "
                    f"slice(split({text_col}, ' '), 2, 1000000), "
                    "(a, b) -> struct(a AS w1, b AS w2)), "
                    "p -> p.w1 <> '' AND p.w2 IS NOT NULL AND p.w2 <> '')"
                )
            ).alias("p"),
        )
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    ctx = pairs.groupBy("w1").agg(F.count("*").alias("c1"))
    scored = (
        pairs.join(big, ["w1", "w2"])
        .join(ctx, "w1")
        .select(
            F.col(id_col),
            (-F.log2(F.col("c2") / F.col("c1"))).alias("bits"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("bits"), 4).alias("bits_per_bigram"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG-prep chunk manifests: split each document into overlapping
    token windows (``chunk_tokens`` wide, ``stride`` apart) and emit
    one row per chunk with its token span and reassembled text.

    Pure scan + explode — zero shuffles; fan-out per document is
    ceil(n_tok / stride), so at 100 TB the output is a bounded
    constant factor (~chunk_tokens/stride× with the default 1.33×)
    of the input scan and parallelism follows the input splits.
    Token positions rather than char offsets make the manifest
    tokenizer-stable for downstream packing (see q_pack_sequences).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.filter(tokens(text_col), lambda t: t != F.lit(""))
    d = docs.select(F.col(id_col), toks.alias("_t"), F.size(toks).alias("_n"))
    starts = F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    d = d.where(F.col("_n") > 0).select(
        id_col, "_t", "_n", F.explode(starts).alias("tok_start")
    )
    tok_end = F.least(F.col("tok_start") + chunk_tokens, F.col("_n"))
    return d.select(
        F.col(id_col),
        (F.col("tok_start") / stride).cast("long").alias("chunk_idx"),
        F.col("tok_start").cast("long").alias("tok_start"),
        tok_end.cast("long").alias("tok_end"),
        (tok_end - F.col("tok_start")).cast("long").alias("n_chunk_toks"),
        F.array_join(
            F.slice(F.col("_t"), F.col("tok_start") + 1, tok_end - F.col("tok_start")),
            " ",
        ).alias("chunk_text"),
    )


def pmi_pairs(
    docs: DataFrame,
    vocab_size: int = 40,
    min_pair_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pointwise mutual information of token co-occurrence at the
    document level: PMI(a,b) = log2(P(a,b) / (P(a)·P(b))) with
    probabilities over documents (a token "occurs" once per doc).

    Scale design: the pair space is bounded up front by restricting
    to the top-``vocab_size`` tokens by document frequency (broadcast
    semi-join — the vocab is tiny by construction), so the within-doc
    self-join fans out at most C(vocab_size, 2) pairs per doc, not
    n_tok². Counts are integers; only the final PMI is floating,
    rounded to 4 dp for cross-engine hash stability.
    """
    tok = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.filter(tokens(text_col), lambda t: t != F.lit("")))
        ).alias("token"),
    )
    df_t = tok.groupBy("token").agg(F.count("*").alias("df"))
    # global top-k via sort+limit → TakeOrderedAndProject (map-side
    # partial top-k, no single-partition window even with a
    # billion-token vocabulary)
    vocab = df_t.orderBy(F.col("df").desc(), "token").limit(vocab_size)
    tok_v = tok.join(F.broadcast(vocab), "token").select(id_col, "token", "df")
    a = tok_v.select(
        F.col(id_col), F.col("token").alias("tok_a"), F.col("df").alias("df_a")
    )
    b = tok_v.select(
        F.col(id_col), F.col("token").alias("tok_b"), F.col("df").alias("df_b")
    )
    pair = (
        a.join(b, id_col)
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b", "df_a", "df_b")
        .agg(F.count("*").alias("n_docs_both"))
        .where(F.col("n_docs_both") >= min_pair_docs)
    )
    n_docs = docs.agg(F.count("*").alias("_n"))
    return (
        pair.crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            F.col("df_a").alias("n_docs_a"),
            F.col("df_b").alias("n_docs_b"),
            "n_docs_both",
            F.round(
                F.log2(
                    (F.col("n_docs_both") * F.col("_n"))
                    / (F.col("df_a") * F.col("df_b"))
                ),
                4,
            ).alias("pmi_bits"),
        )
    )


def source_kl_divergence(
    docs: DataFrame,
    vocab_size: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Distribution-drift monitor: KL(source ‖ corpus) in bits over
    the token distribution, restricted to the top-``vocab_size``
    corpus tokens with add-one smoothing (so every vocab token has
    nonzero mass in every source and the divergence is finite).

    This is the per-slice drift check a training-data pipeline runs
    before admitting a new crawl snapshot: token-frequency vectors
    per source are a groupBy over (source, token) — one shuffle whose
    key space is |sources|·|vocab|, independent of corpus size — and
    the corpus marginals broadcast. Integer counts all the way; the
    single floating log happens at the end, rounded to 4 dp.

    Self-baseline case of drift_kl: marginals come from ``docs``
    itself.
    """
    return drift_kl(
        docs,
        docs,
        vocab_size=vocab_size,
        text_col=text_col,
        source_col=source_col,
    )


def drift_kl(
    new_docs: DataFrame,
    baseline_docs: DataFrame,
    vocab_size: int = 40,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """KL(new-batch source ‖ baseline corpus) in bits: the vocabulary
    and reference marginals come from ``baseline_docs`` (a frozen,
    already-admitted snapshot); per-source counts come from
    ``new_docs`` (the candidate batch). Add-one smoothing over the
    ACTUAL baseline vocab cardinality keeps the divergence finite.
    NOTE the smoothing bias: a batch distributed exactly like the
    baseline scores exactly 0 only when its vocab counts EQUAL the
    baseline's (the self-baseline case) or the distribution is
    uniform; a smaller proportional sample scores a small positive
    O(|V|/n) bias — set alarm thresholds above that floor.

    This is the admission-gate form: the baseline's top-k vocab +
    counts are a tiny write-once artifact at 100 TB (recomputed here
    from the snapshot for the differential oracle), and the per-batch
    cost is one token count over the batch itself.
    """
    tok_base = baseline_docs.select(
        F.explode(F.filter(tokens(text_col), lambda t: t != F.lit(""))).alias("token")
    )
    corpus = tok_base.groupBy("token").agg(F.count("*").alias("c_corpus"))
    # global top-k via sort+limit → TakeOrderedAndProject (map-side
    # partial top-k, no single-partition window even with a
    # billion-token vocabulary)
    vocab = corpus.orderBy(F.col("c_corpus").desc(), "token").limit(vocab_size)
    tok_new = new_docs.select(
        F.col(source_col).alias("source"),
        F.explode(F.filter(tokens(text_col), lambda t: t != F.lit(""))).alias("token"),
    )
    per_src = (
        tok_new.join(F.broadcast(vocab.select("token")), "token")
        .groupBy("source", "token")
        .agg(F.count("*").alias("c_src"))
    )
    # Dense (source × vocab) grid so absent tokens still get smoothed
    # mass: sources is a tiny dim (distinct over one scan), vocab is
    # bounded — the crossJoin is broadcast × broadcast small.
    sources = new_docs.select(F.col(source_col).alias("source")).distinct()
    grid = sources.crossJoin(F.broadcast(vocab))
    cells = grid.join(per_src, ["source", "token"], "left").select(
        "source",
        "token",
        "c_corpus",
        F.coalesce(F.col("c_src"), F.lit(0)).alias("c_src"),
    )
    totals = cells.groupBy("source").agg(F.sum("c_src").alias("n_src"))
    # smoothing denominator uses the ACTUAL vocab cardinality (which
    # may be smaller than the cap), so identical distributions give
    # exactly KL = 0 — the smoothed masses then sum to 1 per slice
    corpus_total = vocab.agg(
        F.sum("c_corpus").alias("n_corpus"), F.count("*").alias("n_vocab")
    )
    return (
        cells.join(totals, "source")
        .crossJoin(F.broadcast(corpus_total))
        .select(
            "source",
            "n_src",
            (
                ((F.col("c_src") + 1) / (F.col("n_src") + F.col("n_vocab")))
                * F.log2(
                    ((F.col("c_src") + 1) / (F.col("n_src") + F.col("n_vocab")))
                    / ((F.col("c_corpus") + 1) / (F.col("n_corpus") + F.col("n_vocab")))
                )
            ).alias("_term"),
        )
        .groupBy("source", "n_src")
        .agg(F.round(F.sum("_term"), 4).alias("kl_bits"))
        .select("source", F.col("n_src").alias("n_vocab_tokens"), "kl_bits")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 retrieval scoring for a fixed query-term set; the
    ranking function behind lexical RAG retrieval (Robertson-Walker,
    probabilistic IDF ln((N-df+0.5)/(df+0.5)+1)).

    Scale shape: document length rides along map-side (size of the
    split array — no explode/groupBy over the corpus), so the ONLY
    corpus-sized work is the scan; everything that shuffles is
    postings-sized (docs containing a query term, filtered before the
    explode). The per-term df table and the (N, avgdl) scalar
    broadcast, and the final top-k is orderBy+limit (TakeOrdered — a
    per-partition heap then a driver merge of k*parts rows, no global
    sort shuffle). Scores round to 6 decimals BEFORE ranking so libm
    ulp differences can't reorder ranks across engines."""
    words = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    base = docs.select(
        F.col(id_col), F.size(words).alias("dl"), words.alias("_w")
    )
    hits = base.select(
        id_col,
        "dl",
        F.explode(
            F.filter(F.col("_w"), lambda t: t.isin(query_terms))
        ).alias("token"),
    )
    # dl is functionally dependent on doc_id; keying on it avoids a
    # separate doc-length join (the round-6 plan audit: 8 -> 4 exchanges)
    tf = hits.groupBy(id_col, "dl", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    scored = tf.join(F.broadcast(df_t), "token").crossJoin(F.broadcast(stats))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    denom = F.col("tf") + k1 * (
        1 - b + b * F.col("dl") * F.col("n_docs") / F.col("sum_dl")
    )
    scored = scored.withColumn(
        "part", idf * F.col("tf") * (k1 + 1) / denom
    )
    agg = scored.groupBy(id_col).agg(
        F.round(F.sum("part"), 6).alias("bm25"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
    top = agg.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", id_col, "bm25", "n_terms_hit"
    )
