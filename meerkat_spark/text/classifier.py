"""Hashing-trick linear text classifier — the Spark plumbing for
model-based corpus gates (fastText-style quality/toxicity filters used
by C4/CCNet-descendant pipelines). No ML library exists in this
container, so the MODEL is supplied as a (feature_id, weight) table —
what matters here is the distributed scoring shape; training is out of
scope (a trained model imports as parquet).

Scale shape: features are hashed token/bigram ids (row-local HOFs) →
ONE explode → broadcast hash join against the weight table (models are
MBs — always broadcastable) → doc-key sum. No python workers, no
per-row model invocation; scoring a 100 TB corpus is one scan, one
explode, one broadcast join, one keyed agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _feature_ids(text, dim: int, bigrams: bool) -> Column:
    c = text if isinstance(text, Column) else F.col(text)
    toks = F.filter(F.split(F.lower(c), "\\W+"), lambda t: t != "")
    uni = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(dim)))
    if not bigrams:
        return uni
    nxt = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    bi = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        nxt,
        lambda a, b: F.pmod(F.xxhash64(F.concat_ws(" ", a, b)), F.lit(dim)),
    )
    return F.concat(uni, bi)


def hash_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1 << 18,
    bigrams: bool = True,
) -> DataFrame:
    """(doc_id, feature_id, tf) — hashed unigram(+bigram) counts per
    document. tf is the raw in-doc count (models trained with mean
    pooling divide by n_features at scoring time)."""
    feats = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_feature_ids(text_col, dim, bigrams)).alias("feature_id"),
    )
    return feats.groupBy("doc_id", "feature_id").agg(
        F.count(F.lit(1)).alias("tf")
    )


def score_documents(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1 << 18,
    bigrams: bool = True,
    bias: float = 0.0,
    mean_pool: bool = True,
) -> DataFrame:
    """(doc_id, score, prob) — linear score w·x (+ bias) and its
    sigmoid. `weights` is a (feature_id, weight) DataFrame; unhashed
    features (no weight row) contribute 0, exactly like an
    out-of-vocabulary token in the linear model. mean_pool divides by
    the document's feature count (fastText's default)."""
    feats = hash_features(df, text_col, id_col, dim, bigrams)
    w = F.broadcast(
        weights.select(
            F.col("feature_id").cast("long").alias("feature_id"),
            F.col("weight").cast("double").alias("weight"),
        )
    )
    contrib = feats.join(w, "feature_id", "left").select(
        "doc_id",
        (F.col("tf") * F.coalesce(F.col("weight"), F.lit(0.0))).alias("c"),
        "tf",
    )
    agg = contrib.groupBy("doc_id").agg(
        F.sum("c").alias("dot"), F.sum("tf").alias("n")
    )
    raw = F.col("dot") / F.col("n") if mean_pool else F.col("dot")
    score = raw + F.lit(float(bias))
    return agg.select(
        "doc_id",
        score.alias("score"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-score))).alias("prob"),
    )


def filter_by_score(
    df: DataFrame,
    weights: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Rows of `df` whose classifier prob >= threshold — the gate form
    (keeps all original columns; one co-keyed join back on the id)."""
    scores = score_documents(df, weights, text_col, id_col, **kwargs)
    keep = scores.filter(F.col("prob") >= float(threshold)).select("doc_id")
    return df.join(keep, df[id_col] == keep["doc_id"], "left_semi")
