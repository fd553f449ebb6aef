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
from meerkat_spark.localrel import local_df
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


def train_logreg(
    df: DataFrame,
    label_col: str = "y",
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1 << 18,
    bigrams: bool = True,
    lr: float = 0.5,
    n_epochs: int = 5,
    l2: float = 0.0,
) -> DataFrame:
    """In-engine logistic-regression training for the hashing-trick
    gate (r8): full-batch gradient descent where EVERY epoch is one
    broadcast weight join + one feature-key aggregation — the same
    distributed shape as scoring, so training a corpus gate needs no
    ML library and no driver-side data.

    Model: p = sigmoid(w·x / n_features) (mean pooling, matching
    score_documents). Gradient per feature j:
    dL/dw_j = sum_docs (tf_j / n) * (p - y) + l2 * w_j.

    Scale shape: the hashed feature table is computed ONCE and
    persisted (one explode + one groupBy); per epoch the weight table
    (bounded by distinct hashed features <= dim — MBs) broadcasts,
    per-doc probabilities are a doc-key agg, and the gradient is a
    feature-key agg. localCheckpoint per epoch cuts the iterative
    lineage exactly like connected components. 100 TB corpus =
    n_epochs passes over a persisted sparse feature table, nothing
    all-pairs, nothing driver-sized."""
    feats = hash_features(df, text_col, id_col, dim, bigrams)
    n_per_doc = feats.groupBy("doc_id").agg(F.sum("tf").alias("n"))
    labels = df.select(
        F.col(id_col).alias("doc_id"), F.col(label_col).cast("double").alias("y")
    )
    base = (
        feats.join(n_per_doc, "doc_id")
        .join(labels, "doc_id")
        .select("doc_id", "feature_id", (F.col("tf") / F.col("n")).alias("x"), "y")
        .persist()
    )
    base.count()  # materialize once; reused every epoch
    spark = df.sparkSession
    weights = local_df(spark, [], "feature_id long, weight double")
    for _ in range(int(n_epochs)):
        scored = base.join(F.broadcast(weights), "feature_id", "left").select(
            "doc_id",
            "feature_id",
            "x",
            "y",
            (F.col("x") * F.coalesce(F.col("weight"), F.lit(0.0))).alias("c"),
        )
        p = scored.groupBy("doc_id").agg(
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.sum("c")))).alias("p"),
            F.first("y").alias("y"),
        )
        grad = (
            scored.select("doc_id", "feature_id", "x")
            .join(p, "doc_id")
            .groupBy("feature_id")
            .agg(F.sum(F.col("x") * (F.col("p") - F.col("y"))).alias("g"))
        )
        weights = (
            grad.join(weights, "feature_id", "left")
            .select(
                "feature_id",
                (
                    F.coalesce(F.col("weight"), F.lit(0.0)) * (1.0 - lr * l2)
                    - F.lit(lr) * F.col("g")
                ).alias("weight"),
            )
            .localCheckpoint(eager=True)
        )
    base.unpersist()
    return weights


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
