"""Token-bloom full-text pre-filter — the Spark realization of the
reference's declared-but-unimplemented full-text index
(reference src/store/segment_metadata.proto:38-43 IndexType::FullText,
src/store/index/mod.rs:20-24).

Design: a per-document bloom bitmask over its lowercase tokens, stored
as array<long> (computed once at ingest/index time, persisted to
parquet next to the text). `has 'term'` then becomes

    bloom_might_contain(bloom, term)  AND  has_term(text, term)

— the bitwise membership probe is a cheap codegen conjunct evaluated
FIRST (Spark short-circuits conjuncts left to right), so the regex
word-boundary verify runs only on the bloom's survivors. No false
negatives (every token of the text is folded into the mask); false
positives only cost a wasted verify.

Everything is JVM higher-order functions — no UDF, no Arrow transfer:
tokens = split(lower(text)); the mask folds via aggregate/transform;
the query-side probe hashes a LITERAL term, so Catalyst constant-folds
it to one bitwiseAND per word.

Words carry 63 usable bits (shift amounts are computed columns, and
pow(2, b) is double-exact only through 2^62 — bit 63 would overflow
signed long anyway)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS_PER_WORD = 63
DEFAULT_WORDS = 8  # 504 effective bits

_TOKEN_SPLIT = "[^a-z0-9]+"


def _bit_mask(h: Column) -> tuple[Column, Column]:
    """(word index, single-bit mask) for a 64-bit hash column."""
    word = (h / BITS_PER_WORD).cast("int")
    bit = (h % BITS_PER_WORD).cast("double")
    # 2^b is exactly representable in double for b ≤ 62 → exact long
    mask = F.pow(F.lit(2.0), bit).cast("long")
    return word, mask


def token_bloom(text_col, words: int = DEFAULT_WORDS) -> Column:
    """array<long> bloom mask over the column's lowercase tokens."""
    n_bits = words * BITS_PER_WORD
    tokens = F.filter(
        F.split(F.lower(text_col), _TOKEN_SPLIT), lambda t: t != ""
    )
    init = F.array_repeat(F.lit(0).cast("long"), words)

    def step(acc: Column, tok: Column) -> Column:
        h = F.pmod(F.xxhash64(tok), F.lit(n_bits))
        word, mask = _bit_mask(h)
        return F.transform(
            acc,
            lambda x, i: F.when(i == word, x.bitwiseOR(mask)).otherwise(x),
        )

    return F.aggregate(tokens, init, step)


def bloom_might_contain(
    bloom_col, term: str, words: int = DEFAULT_WORDS
) -> Column:
    """Membership probe for a literal term — constant-folded hash, one
    element_at + bitwiseAND. False positives possible, negatives not."""
    n_bits = words * BITS_PER_WORD
    h = F.pmod(F.xxhash64(F.lower(F.lit(term))), F.lit(n_bits))
    word, mask = _bit_mask(h)
    return (F.element_at(bloom_col, word + 1).bitwiseAND(mask)) != 0


def with_text_index(df, text_col: str, out_col: str = "_tok_bloom", words: int = DEFAULT_WORDS):
    """Index-build step: attach the stored bloom column (ingest-time)."""
    return df.withColumn(out_col, token_bloom(F.col(text_col), words))


def has_indexed(
    df,
    text_col: str,
    term: str,
    bloom_col: str = "_tok_bloom",
    words: int = DEFAULT_WORDS,
):
    """`text has term` with the bloom pre-filter in front of the exact
    word-boundary verify. Identical result set to plain has_term."""
    from meerkat_spark.functions.scalar import has_term

    return df.filter(
        bloom_might_contain(F.col(bloom_col), term, words)
        & has_term(F.col(text_col), term)
    )
