"""Benchmark decontamination: find (and drop) corpus documents that
share ≥ `min_shared` distinct word k-grams with any benchmark document —
the standard pretraining hygiene step against eval-set leakage.

Inverted-index shape (never all-pairs): explode distinct k-grams on both
sides, equi-join on the gram, count distinct shared grams per
(corpus doc, benchmark doc). The benchmark side is small by definition —
its gram set broadcasts, so the corpus-side scan never shuffles on the
join. Cost: one narrow gram projection per side + one broadcast join +
one keyed aggregation.

Two gram representations:
- `hashed=True` (default, the 100TB path): 64-bit shingle hashes from
  the Arrow kernel in text/dedup.py — 8-byte join keys, no text moves.
- `hashed=False`: k-gram STRINGS built JVM-side (transform over
  sequence) — exactly reproducible in SQL, used for the DuckDB oracle
  twin. Same plan shape, wider keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_strings(text_col, k: int):
    """Distinct word k-grams as strings (JVM HOFs — oracle-reproducible).

    Zero-word documents yield an EMPTY gram array (not the '' gram —
    that would make every empty corpus doc 'share' a gram with every
    empty/short benchmark doc and be flagged as contaminated); docs with
    0 < n < k words fall back to their single full-text gram, matching
    the hashed path's shortened-shingle behavior."""
    words = F.filter(F.split(F.lower(text_col), r"\s+"), lambda w: w != "")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, k), " ")
    )
    short = F.when(n > 0, F.array(F.array_join(words, " "))).otherwise(
        F.array().cast("array<string>")
    )
    return F.array_distinct(F.when(n >= k, grams).otherwise(short))


def _grams(df: DataFrame, text_col: str, id_col: str, k: int, hashed: bool):
    if hashed:
        from meerkat_spark.text.dedup import _make_shingles_udf

        udf = _make_shingles_udf(k)
        return df.select(
            F.col(id_col).alias("__id"), F.explode(udf(F.col(text_col))).alias("g")
        )
    return df.select(
        F.col(id_col).alias("__id"),
        F.explode(_gram_strings(F.col(text_col), k)).alias("g"),
    )


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_shared: int = 1,
    hashed: bool = True,
) -> DataFrame:
    """(corpus_id, bench_id, n_shared) for pairs sharing ≥ min_shared
    distinct k-grams."""
    cg = _grams(corpus, text_col, id_col, k, hashed).withColumnRenamed(
        "__id", "corpus_id"
    )
    bg = _grams(benchmark, text_col, id_col, k, hashed).withColumnRenamed(
        "__id", "bench_id"
    )
    return (
        cg.join(F.broadcast(bg), "g")
        .groupBy("corpus_id", "bench_id")
        .agg(F.countDistinct("g").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_shared: int = 1,
    hashed: bool = True,
) -> DataFrame:
    """Corpus minus documents contaminated by the benchmark."""
    bad = (
        contamination_pairs(
            corpus, benchmark, text_col, id_col, k, min_shared, hashed
        )
        .select(F.col("corpus_id").alias(id_col))
        .distinct()
    )
    return corpus.join(bad, id_col, "left_anti")
