"""Distributed BPE vocabulary learning (Sennrich et al. 2016) — the
tokenizer-training step of an LLM data platform, on DataFrames.

Word-level BPE: the corpus reduces ONCE to (distinct word, count) —
after that every merge round runs on the vocabulary frame, whose size
is the distinct-word count, not the corpus size. Per round:

1. adjacent-symbol pair counts weighted by word frequency — one
   zip_with explode + a partial-combined groupBy over the (tiny
   relative to corpus) vocab frame;
2. argmax pair via orderBy(count desc, pair asc).limit(1) — a bounded
   1-row collect (the same collect class as IVF centroids);
3. greedy left-to-right merge application as a JVM-side aggregate()
   fold over each word's symbol array — non-overlapping, so a run of
   k identical candidates merges at positions 0, 2, 4, … (this run
   parity is what the SQL oracle reproduces with gaps-and-islands);
4. localCheckpoint to keep the iterative lineage flat (the
   duplicate_clusters discipline).

At 100 TB the vocab frame is millions of rows — every step above
stays distributed; only the 1-row argmax touches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace tokens — the one corpus-sized pass."""
    return (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_symbols() -> Column:
    # split('') yields single characters (codepoints); drop empties
    return F.filter(F.split(F.col("word"), ""), lambda x: x != F.lit(""))


def _apply_merge(sym: Column, a: str, b: str) -> Column:
    """Greedy left-to-right, non-overlapping application of merge
    (a, b) → a||b to a symbol array, as one aggregate() fold: carry
    the previous unemitted symbol; when (prev, current) matches the
    pair, emit the merged symbol and clear the carry (so the merged
    token cannot immediately re-merge — run parity for a == b)."""
    ab = a + b
    empty_out = F.array().cast("array<string>")
    null_s = F.lit(None).cast("string")

    def step(acc: Column, s: Column) -> Column:
        merged = F.struct(
            F.concat(acc["out"], F.array(F.lit(ab))).alias("out"),
            null_s.alias("prev"),
        )
        carry_first = F.struct(acc["out"].alias("out"), s.alias("prev"))
        emit_prev = F.struct(
            F.concat(acc["out"], F.array(acc["prev"])).alias("out"),
            s.alias("prev"),
        )
        return (
            F.when((acc["prev"] == F.lit(a)) & (s == F.lit(b)), merged)
            .when(acc["prev"].isNull(), carry_first)
            .otherwise(emit_prev)
        )

    def finish(acc: Column) -> Column:
        return F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        )

    init = F.struct(empty_out.alias("out"), null_s.alias("prev"))
    return F.aggregate(sym, init, step, finish)


def _pair_counts(words: DataFrame) -> DataFrame:
    pairs = words.select(
        "cnt",
        F.explode(
            F.filter(
                F.zip_with(
                    F.col("sym"),
                    F.slice(F.col("sym"), 2, F.greatest(F.size("sym") - 1, F.lit(1))),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                ),
                lambda p: p["b"].isNotNull(),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("cnt").alias("c")
    )


def _learn_merges_local(
    vocab: list[tuple[str, int]], n_merges: int, min_count: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side merge learning over a collected (word, cnt) vocab —
    byte-for-byte the same procedure as the distributed loop: pair
    counts weighted by word frequency, argmax tie-broken on
    (count desc, sym_a asc, sym_b asc), greedy left-to-right
    non-overlapping application. Python string comparison (codepoint
    order) matches Spark's UTF-8 binary order, so tie-breaks agree."""
    words = [(list(w), c) for w, c in vocab]
    learned: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for sym, cnt in words:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        cands = [
            (-c, a, b) for (a, b), c in counts.items() if c >= min_count
        ]
        if not cands:
            break
        negc, a, b = min(cands)
        learned.append((rank, a, b, -negc))
        nxt = []
        for sym, cnt in words:
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt.append((out, cnt))
        words = nxt
    return learned


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 6,
    min_count: int = 2,
    text_col: str = "text",
    driver_vocab_max: int = 1_000_000,
) -> DataFrame:
    """Learn up to ``n_merges`` BPE merges from the corpus. Returns a
    DataFrame (merge_rank, sym_a, sym_b, pair_count) — the merge table
    a tokenizer ships. Deterministic: argmax ties break on (sym_a,
    sym_b) lexicographically, so the result is engine- and
    partitioning-independent (the differential-oracle requirement).

    Execution: the corpus reduces ONCE to (distinct word, count); the
    vocabulary is a BOUNDED aggregate (word types, not corpus rows —
    ~1M for natural language at any corpus size), so when it fits
    under ``driver_vocab_max`` the merge loop runs driver-side in
    plain Python after a single Spark job — the architecture every
    production BPE trainer uses (distributed counting, local
    learning), and ~6x faster here than scheduling 2 Spark jobs per
    merge round on a tiny vocab frame. Vocabularies over the bound
    fall back to the fully distributed per-round loop (argmax is a
    1-row collect; eager checkpoints keep each round's lineage flat),
    whose results are identical (tests pin the equivalence)."""
    spark = docs.sparkSession
    wc = word_counts(docs, text_col=text_col)
    if driver_vocab_max > 0:
        head = wc.limit(driver_vocab_max + 1).collect()
        if len(head) <= driver_vocab_max:
            learned = _learn_merges_local(
                [(r["word"], r["cnt"]) for r in head], n_merges, min_count
            )
            return spark.createDataFrame(
                learned,
                "merge_rank int, sym_a string, sym_b string, pair_count long",
            )
    words = (
        wc.select("word", "cnt", _initial_symbols().alias("sym"))
        # EAGER: each merge round collects a 1-row argmax; a lazy
        # checkpoint materializes nothing, so round k would re-execute
        # the full _apply_merge chain of rounds 1..k-1 first (the same
        # compounding-recompute mechanism the round-4 simhash flag had)
        .localCheckpoint(eager=True)
    )
    learned = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(words)
            .where(F.col("c") >= min_count)
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, c = best[0].a, best[0].b, best[0].c
        learned.append((rank, a, b, c))
        words = words.select(
            "word", "cnt", _apply_merge(F.col("sym"), a, b).alias("sym")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        learned, "merge_rank int, sym_a string, sym_b string, pair_count long"
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "expr",
) -> DataFrame:
    """Apply a learned merge list to a corpus: per document, the BPE
    segmentation of each word (merges applied in rank order — the
    standard inference-time procedure).

    ``impl="expr"`` (default): pure column expressions — the merge
    table compiles into a chain of aggregate() folds, so segmentation
    is a zero-shuffle codegen'd scan. Right up to a few hundred
    merges; the expression tree grows linearly with the table and the
    analyzer chokes long before production vocab sizes.

    ``impl="pandas"``: the production-size knob (k ≈ 50k merges) — an
    Arrow-batched pandas UDF holding the merge table as ONE broadcast
    rank dict; each word is encoded by the standard iterative
    lowest-rank-adjacent-pair loop (what every BPE tokenizer runtime
    does), whose cost is independent of the merge-table size. For a
    CONSISTENT learned table this is provably identical to sequential
    rank-order application: merging rank r can only create pairs
    containing the new symbol a||b, and any merge referencing a||b
    must have been learned after r — so no earlier-rank pair ever
    reappears (tests pin the equivalence on a learned vocabulary).
    Zero shuffle either way: one scan, Arrow batches in, rows out."""
    if impl == "pandas":
        return _bpe_segment_pandas(docs, merges, id_col, text_col)
    word_syms = F.transform(
        F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit("")),
        lambda w: F.filter(F.split(w, ""), lambda x: x != F.lit("")),
    )
    d = docs.select(F.col(id_col), word_syms.alias("_ws"))
    col = F.col("_ws")

    def _fold(a: str, b: str):
        # factory keeps the lambda unary — PySpark reads the signature
        return lambda s: _apply_merge(s, a, b)

    for a, b in merges:
        col = F.transform(col, _fold(a, b))
    return d.select(
        F.col(id_col),
        F.flatten(col).alias("bpe_tokens"),
        F.size(F.flatten(col)).alias("n_bpe_tokens"),
    )


def _bpe_segment_pandas(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str,
    text_col: str,
) -> DataFrame:
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    # invert once for O(1) best-pair resolution inside the loop
    by_rank = list(merges)

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, toks, ns = [], [], []
            for did, text in zip(b[id_col], b[text_col]):
                out: list[str] = []
                for w in str(text).split(" "):
                    if not w:
                        continue
                    sym = list(w)
                    while len(sym) > 1:
                        best = None
                        for i in range(len(sym) - 1):
                            r = ranks.get((sym[i], sym[i + 1]))
                            if r is not None and (best is None or r < best):
                                best = r
                        if best is None:
                            break
                        a, bb = by_rank[best]
                        nxt: list[str] = []
                        i = 0
                        while i < len(sym):
                            if (
                                i + 1 < len(sym)
                                and sym[i] == a
                                and sym[i + 1] == bb
                            ):
                                nxt.append(a + bb)
                                i += 2
                            else:
                                nxt.append(sym[i])
                                i += 1
                        sym = nxt
                    out.extend(sym)
                ids.append(did)
                toks.append(out)
                ns.append(len(out))
            yield pd.DataFrame(
                {id_col: ids, "bpe_tokens": toks, "n_bpe_tokens": ns}
            )

    id_type = dict(docs.select(id_col).dtypes)[id_col]
    schema = StructType(
        [
            StructField(
                id_col, LongType() if id_type == "bigint" else IntegerType()
            ),
            StructField("bpe_tokens", ArrayType(StringType())),
            StructField("n_bpe_tokens", IntegerType()),
        ]
    )
    return docs.select(id_col, text_col).mapInPandas(_encode, schema)


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE token/char counts WITHOUT materializing token
    arrays: the text is rewritten to bracket-delimited symbols
    (``⟨c⟩`` per char) and each merge is ONE literal replace — the
    same greedy leftmost non-overlapping pass as _apply_merge, but in
    codegen'd string ops instead of interpreted aggregate() folds
    (13.7 s -> ~1 s at sf0.1 for the counting query). Word boundaries
    need no special casing: space symbols ``⟨ ⟩`` never match a merge,
    and the token count subtracts them at the end.

    Returns docs plus (n_tok bigint, n_chr bigint)."""
    enc = F.regexp_replace(F.col(text_col), r"(.)", r"⟨$1⟩")
    for a, b in merges:
        enc = F.replace(enc, F.lit(f"⟨{a}⟩⟨{b}⟩"), F.lit(f"⟨{a}{b}⟩"))
    n_spaces = F.length(text_col) - F.length(
        F.replace(F.col(text_col), F.lit(" "), F.lit(""))
    )
    n_sym = F.length(enc) - F.length(F.replace(enc, F.lit("⟨"), F.lit("")))
    return docs.withColumns(
        {
            "n_tok": (n_sym - n_spaces).cast("long"),
            "n_chr": (F.length(text_col) - n_spaces).cast("long"),
        }
    )
