"""Corpus vocabulary statistics and TF-IDF keyword extraction — the
vocab-building / keyword-scoring stage of a training-data pipeline
(tokenizer training corpora, keyword-based filtering, topic routing).

Scale shape (100 TB):
- token_frequencies is canonical distributed wordcount: explode the
  token array, ONE shuffle on the token key with map-side partial
  aggregation (Catalyst plans HashAggregate partial/final around the
  exchange automatically). No driver-side state; vocabulary size
  bounds the shuffle, not corpus size.
- top_vocab is TakeOrdered over the aggregate (per-partition top-N,
  no global sort).
- tf_idf_top_terms joins per-(doc, token) counts to per-token doc
  frequencies on the token key. The df side is the VOCABULARY —
  orders of magnitude smaller than the corpus — so it broadcasts
  below the threshold and otherwise shuffle-joins on token; the
  per-doc top-k is a window partitioned by doc_id (keyed, never
  global).

Tokenization here is the engine's BPE-ish word segmentation alphabet
([a-z0-9]+ runs of the lowercased text) so results are reproducible
in ANSI SQL; callers needing linguistic tokenization plug their own
token column in upstream.

Reference anchor: the reference repo's storage layer keeps per-segment
term statistics for pruning (src/store/segment_metadata.proto) but has
no corpus-level text analytics; this module is part of the
LLM-pipeline surface that is new functionality on the Spark side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _word_tokens(text_col) -> "F.Column":
    return F.filter(
        F.split(F.lower(text_col), "[^a-z0-9]+"), lambda t: t != ""
    )


def token_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(token, tf, df): total occurrences and document frequency of
    every distinct token in the corpus. df counts each doc once however
    often the token repeats inside it (count_distinct over the doc id
    — the same single shuffle; no second pass over the text)."""
    exploded = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(_word_tokens(F.col(text_col))).alias("token"),
    )
    return exploded.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("__doc").alias("df"),
    )


def top_vocab(
    df: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-n vocabulary by corpus frequency, deterministic tiebreak
    (tf desc, token asc) — the candidate list a tokenizer trainer or
    stopword inducer starts from."""
    return (
        token_frequencies(df, text_col, id_col)
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(n)
    )


def tf_idf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_token_len: int = 3,
) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF
    (score = tf_in_doc * (ln((N+1)/(df+1)) + 1), sklearn's smooth_idf),
    deterministic tiebreak (score desc, token asc). Tokens shorter than
    `min_token_len` are dropped (stopword-ish noise floor). Output:
    (doc_id, token, score, rank), score rounded to 6dp."""
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_word_tokens(F.col(text_col))).alias("token"),
    ).filter(F.length("token") >= min_token_len)
    per_doc = exploded.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf_doc")
    )
    docfreq = exploded.groupBy("token").agg(
        F.count_distinct("doc_id").alias("df_tok")
    )
    n_docs = df.select(F.count_distinct(F.col(id_col))).first()[0]
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df_tok") + F.lit(1.0))) + F.lit(
        1.0
    )
    scored = per_doc.join(docfreq, "token").select(
        "doc_id", "token", (F.col("tf_doc") * idf).alias("__score")
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("__score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "token",
            F.round("__score", 6).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
