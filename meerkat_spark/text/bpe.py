"""In-engine BPE merge training (byte-pair encoding, Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
the tokenizer-training algorithm behind GPT-2/RoBERTa-style vocabs).

The published algorithm never needs the corpus after one counting pass:
merges are learned from the WORD-FREQUENCY table (word -> count), and
each merge step only rewrites that table. That structure is exactly
right for a distributed engine at 100 TB:

- pass 1 (the only corpus scan): tokenize + groupBy(word) count —
  map-side partial combine does the heavy lifting; the result is the
  word-frequency table, bounded by |vocabulary|, not corpus size.
- merge loop (n_merges iterations): each step is ONE pair-explode +
  keyed count over the vocab table (weighted by word frequency), ONE
  bounded top-1 collect (a single row — the argmax pair), and ONE
  array-fold rewrite of the token arrays (JVM `aggregate` expression,
  no Python). Driver round-trips = n_merges, the same bounded-epoch
  shape as the in-engine LR trainer (text/classifier.py).
- ties break deterministically on (count desc, left asc, right asc),
  so the learned merge table is reproducible across partitionings.

Reference anchor: the reference repo has no tokenizer surface
(storage-only Rust); this is part of the LLM-data-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(text) -> Column:
    c = text if isinstance(text, Column) else F.col(text)
    return F.filter(F.split(F.lower(c), "\\W+"), lambda t: t != "")


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the single corpus pass BPE needs."""
    return (
        df.select(F.explode(_words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_tokens(tokens: Column, left: str, right: str) -> Column:
    """Fold a token array, fusing every adjacent (left, right) pair
    left-to-right (the BPE rewrite step) — a JVM aggregate expression,
    no UDF. Overlaps fuse greedily from the left: a,a,a with merge
    (a,a) -> [aa, a], exactly the reference implementation's behavior."""
    lit_l, lit_r = F.lit(left), F.lit(right)
    merged = F.lit(left + right)
    return F.aggregate(
        tokens,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lit_l)
            & (x == lit_r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 1,
) -> list[tuple[int, str, str, int]]:
    """Learn `n_merges` BPE merges from the corpus; returns
    [(rank, left, right, pair_count)] in merge order. Stops early when
    no pair reaches min_pair_count (vocabulary saturated)."""
    vocab = word_freqs(df, text_col).select(
        F.split("word", "").alias("tokens"), "freq"
    )
    # keep each intermediate vocab table small and materialized: the
    # merge loop re-reads it every step; localCheckpoint cuts the
    # per-step lineage exactly like the LR trainer's epochs
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, int(n_merges) + 1):
        pairs = vocab.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("tokens"), 1, F.size("tokens") - 1),
                    F.slice(F.col("tokens"), 2, F.size("tokens") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
            "freq",
        ).filter(F.col("p.l").isNotNull() & F.col("p.r").isNotNull())
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()  # bounded: exactly one row (the argmax pair)
        )
        if not top or top[0].c < min_pair_count:
            break
        l, r, c = top[0].l, top[0].r, int(top[0].c)
        merges.append((rank, l, r, c))
        vocab = vocab.select(
            _merge_tokens(F.col("tokens"), l, r).alias("tokens"), "freq"
        ).localCheckpoint(eager=True)
    return merges


def bpe_merge_table(
    spark, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a learned merge list: each word becomes its char
    sequence, then every merge is applied in rank order (the standard
    BPE encode). Pure JVM expressions — the merge chain compiles to one
    nested fold per merge, appropriate for the bounded merge counts the
    in-engine trainer targets (tokenizer-scale vocabs would move the
    loop into a broadcast-dict Pandas UDF; the merge TABLE broadcasts
    either way). Output: array<string> of subword tokens per row, words
    flattened in order."""
    def apply_one(col: Column, l: str, r: str) -> Column:
        # closure factory, NOT a default-arg lambda: pyspark counts a
        # lambda's total parameters (defaults included) when binding
        # higher-order functions, so `lambda t, _l=l: ...` mis-binds
        return F.transform(col, lambda t: _merge_tokens(t, l, r))

    per_word = F.transform(_words(text_col), lambda w: F.split(w, ""))
    for _, l, r, _ in sorted(merges):
        per_word = apply_one(per_word, l, r)
    return df.withColumn(out_col, F.flatten(per_word))
