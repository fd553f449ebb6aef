"""Bigram language-model perplexity scoring — the CCNet-style LM
quality filter (Wenzek et al. 2020, "CCNet: Extracting high quality
monolingual datasets from web crawl data" — docs are ranked/filtered
by LM perplexity; the public pipeline uses KenLM). No model library
exists in this container, so the LM itself is trained IN-ENGINE: an
add-k-smoothed bigram model is nothing but token-pair counts, and
counting is what a distributed engine does best.

Scale shape (100 TB corpus):
- train: ONE pass builds (prev, word) bigram counts and prev-unigram
  counts — explode + two keyed aggregations, map-side partial combine
  does the heavy lifting; the model is a count table, not an opaque
  binary.
- score: explode each doc's bigrams, ONE co-keyed join against the
  bigram table (broadcast when the vocabulary is small, shuffle-hash
  otherwise — Catalyst/AQE picks), doc-key aggregate of log
  probabilities. No Python in the loop; everything is JVM expressions.
- P(w|v) = (c(v,w) + k) / (c(v) + k*V) with V = |vocab|+1 (unseen
  bucket); tokens/pairs absent from the model fall back to the same
  smoothed floor, exactly like an OOV in a KenLM-filtered pipeline.
- perplexity = exp(-avg log P) over the doc's bigrams; docs shorter
  than 2 tokens score NULL (no bigram evidence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# sentence-start marker: a token that the tokenizer can never emit
# (tokenization lowercases and splits on \W+, so '^' is unreachable)
BOS = "^"


def _tokens(text) -> Column:
    c = text if isinstance(text, Column) else F.col(text)
    return F.filter(F.split(F.lower(c), "\\W+"), lambda t: t != "")


def _bigrams(text) -> Column:
    """array<struct<v,w>> of (prev, word) pairs including (BOS, first).
    Empty docs yield an EMPTY array: zip_with pads to the longer side,
    so the lone BOS in `prevs` would otherwise fabricate a (BOS, null)
    pair — filter on w, which is never null for real tokens."""
    toks = _tokens(text)
    prevs = F.concat(
        F.array(F.lit(BOS)), F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    )
    zipped = F.zip_with(prevs, toks, lambda v, w: F.struct(v.alias("v"), w.alias("w")))
    return F.filter(zipped, lambda p: p["w"].isNotNull())


def train_bigram_lm(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """(bigram_counts(v, w, c_vw), context_counts(v, c_v), vocab_size).
    One explode + two keyed count aggregations over the corpus."""
    pairs = df.select(F.explode(_bigrams(text_col)).alias("p")).select(
        F.col("p.v").alias("v"), F.col("p.w").alias("w")
    )
    bi = pairs.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c_vw"))
    ctx = pairs.groupBy("v").agg(F.count(F.lit(1)).alias("c_v"))
    vocab = pairs.select("w").distinct().count()
    return bi, ctx, vocab


def perplexity_scores(
    df: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
) -> DataFrame:
    """(id, n_bigrams, avg_logp, perplexity) per document under the
    add-k-smoothed bigram model. Unseen context AND unseen pair both
    degrade to the smoothed floor k/(c_v + k*V) with c_vw (or c_v) = 0."""
    V = float(vocab_size) + 1.0  # +1 unseen bucket
    doc_pairs = df.select(
        F.col(id_col), F.explode(_bigrams(text_col)).alias("p")
    ).select(F.col(id_col), F.col("p.v").alias("v"), F.col("p.w").alias("w"))
    joined = (
        doc_pairs.join(bigrams, ["v", "w"], "left")
        .join(contexts, ["v"], "left")
        .select(
            F.col(id_col),
            (
                F.log(
                    (F.coalesce(F.col("c_vw"), F.lit(0)) + F.lit(float(k)))
                    / (F.coalesce(F.col("c_v"), F.lit(0)) + F.lit(float(k)) * F.lit(V))
                )
            ).alias("logp"),
        )
    )
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.avg("logp").alias("avg_logp"),
    )
    return agg.select(
        id_col,
        "n_bigrams",
        "avg_logp",
        F.exp(-F.col("avg_logp")).alias("perplexity"),
    )


def lm_quality_filter(
    df: DataFrame,
    max_perplexity: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
    model: tuple[DataFrame, DataFrame, int] | None = None,
) -> DataFrame:
    """CCNet-style gate: keep rows whose perplexity under the (given or
    corpus-trained) bigram LM is <= max_perplexity. One co-keyed
    left-semi join back on the id."""
    bi, ctx, vocab = model if model is not None else train_bigram_lm(df, text_col)
    scores = perplexity_scores(df, bi, ctx, vocab, text_col, id_col, k)
    keep = scores.filter(F.col("perplexity") <= float(max_perplexity)).select(id_col)
    return df.join(keep, id_col, "left_semi")
