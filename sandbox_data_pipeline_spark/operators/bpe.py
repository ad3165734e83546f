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


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 6,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Learn up to ``n_merges`` BPE merges from the corpus. Returns a
    DataFrame (merge_rank, sym_a, sym_b, pair_count) — the merge table
    a tokenizer ships. Deterministic: argmax ties break on (sym_a,
    sym_b) lexicographically, so the result is engine- and
    partitioning-independent (the differential-oracle requirement)."""
    spark = docs.sparkSession
    words = (
        word_counts(docs, text_col=text_col)
        .select("word", "cnt", _initial_symbols().alias("sym"))
        .localCheckpoint(eager=False)
    )
    learned: list[tuple[int, str, str, int]] = []
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
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        learned, "merge_rank int, sym_a string, sym_b string, pair_count long"
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to a corpus: per document, the BPE
    segmentation of each word (merges applied in rank order — the
    standard inference-time procedure). Pure column expressions: the
    merge table compiles into a chain of aggregate() folds, so
    segmentation is a zero-shuffle scan at any corpus size."""
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
