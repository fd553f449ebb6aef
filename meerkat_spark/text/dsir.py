"""DSIR-style importance weighting for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169 — the published recipe behind several open LLM data
pipelines). The method fits two bag-of-ngrams unigram models — p for a
small in-domain TARGET set, q for the big RAW corpus — and scores every
raw document by its log importance weight log p(x) - log q(x); raw docs
are then selected with those weights.

This engine rebuilds the estimator Spark-first with EXACT word-unigram
features instead of the paper's 10k-bucket feature hash: hashing is a
memory trick for single-node numpy, a distributed engine can afford the
exact vocabulary — and exact features keep the op fully SQL-replayable
(the dsir_importance_score suite oracle retrains the identical model in
DuckDB).

Scale shape (100 TB raw corpus):
- fit: one explode + keyed count per corpus (target is usually tiny),
  one full-outer count join on the word key; corpus totals (N_t, N_r,
  |V|) ride along as a broadcast 1-row aggregate — no driver collect.
- score: explode raw docs, ONE co-keyed join against the weight table
  (broadcast when the vocabulary is small, shuffle-hash otherwise —
  AQE picks), doc-key sum. Zero Python in the loop.
- select: a deterministic top-fraction gate via an exact percentile
  threshold (the paper resamples with Gumbel noise; the deterministic
  variant is the reproducible flavor, same spirit as top-k sampling).

Reference anchor: the reference repo has no data-selection surface
(storage-only, README.md:33-34); this is part of the LLM-data-pipeline
extension the build brief mandates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text) -> Column:
    c = text if isinstance(text, Column) else F.col(text)
    return F.filter(F.split(F.lower(c), "\\W+"), lambda t: t != "")


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(_tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_log_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    k: float = 1.0,
    target_pred: Column | None = None,
) -> DataFrame:
    """(w, logw) over the union vocabulary: logw = log p_t(w) - log q_r(w)
    with add-k smoothing, p(w) = (c + k) / (N + k*V), V = |union|+1.
    Totals ship as a broadcast single-row aggregate (CI-whitelisted
    crossJoin shape), so the whole fit is lazy and collect-free.

    `target_pred` (r16): when the target corpus is a row-level slice of
    `raw` (the in-domain-subset shape the suite grades), pass the slice
    predicate instead of a separate `target` frame — ONE tokenize +
    explode + keyed count computes both models (c_t = conditional count
    under the predicate), replacing two full tokenization passes and
    the full-outer vocabulary join. Counts, totals and the logw formula
    are identical by construction (target ⊆ raw ⇒ union vocabulary =
    raw vocabulary). `target` is ignored when target_pred is given."""
    if target_pred is not None:
        joined = (
            raw.select(
                F.explode(_tokens(text_col)).alias("w"),
                target_pred.cast("long").alias("__t"),
            )
            .groupBy("w")
            .agg(
                F.sum("__t").alias("c_t"),
                F.count(F.lit(1)).alias("c_r"),
            )
            .select(
                "w", F.coalesce("c_t", F.lit(0)).alias("c_t"), "c_r"
            )
        )
    else:
        tc = _word_counts(target, text_col).withColumnRenamed("c", "c_t")
        rc = _word_counts(raw, text_col).withColumnRenamed("c", "c_r")
        joined = tc.join(rc, "w", "full_outer").select(
            "w",
            F.coalesce("c_t", F.lit(0)).alias("c_t"),
            F.coalesce("c_r", F.lit(0)).alias("c_r"),
        )
    totals = joined.agg(
        F.sum("c_t").cast("double").alias("n_t"),
        F.sum("c_r").cast("double").alias("n_r"),
        (F.count(F.lit(1)) + F.lit(1)).cast("double").alias("v"),
    )
    kk = F.lit(float(k))
    return joined.crossJoin(F.broadcast(totals)).select(
        "w",
        (
            F.log((F.col("c_t") + kk) / (F.col("n_t") + kk * F.col("v")))
            - F.log((F.col("c_r") + kk) / (F.col("n_r") + kk * F.col("v")))
        ).alias("logw"),
    )


def dsir_scores(
    raw: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, logw_sum, logw_avg) per raw document. Raw words are
    always in the union vocabulary (raw is one of the two fit corpora),
    so the join is inner; docs with zero tokens produce no row (no
    evidence), matching the LM filter's convention (text/lm.py)."""
    doc_words = raw.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("w")
    )
    return (
        doc_words.join(weights, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("logw").alias("logw_sum"),
            F.avg("logw").alias("logw_avg"),
        )
    )


def dsir_select(
    target: DataFrame,
    raw: DataFrame,
    frac: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
    by_avg: bool = False,
) -> DataFrame:
    """Keep the top `frac` of raw docs by importance weight: one exact
    percentile aggregate fixes the threshold (broadcast 1-row), then a
    filter + left-semi join back — no global sort, no driver collect.
    Ties at the threshold are kept (count may slightly exceed frac*n;
    deterministic either way)."""
    score_col = "logw_avg" if by_avg else "logw_sum"
    scores = dsir_scores(raw, dsir_log_weights(target, raw, text_col, k),
                         id_col, text_col)
    thr = scores.agg(
        F.percentile(F.col(score_col), F.lit(1.0 - float(frac))).alias("thr")
    )
    keep = (
        scores.crossJoin(F.broadcast(thr))
        .filter(F.col(score_col) >= F.col("thr"))
        .select(id_col)
    )
    return raw.join(keep, id_col, "left_semi")
