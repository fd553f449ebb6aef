"""DSIR importance weighting (text/dsir.py — Xie et al. 2023,
arXiv:2302.03169 rebuilt with exact word-unigram features): known-answer
check against an in-test pure-python reference, the planted selection
contract, and edge cases. The driver-grade differential twin is the
dsir_importance_score suite query (DuckDB retrains the identical
model)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from meerkat_spark.text.dsir import dsir_log_weights, dsir_scores, dsir_select

TARGET = [
    (1, "alpha beta alpha"),
    (2, "beta gamma"),
]
RAW = TARGET + [
    (3, "delta epsilon delta"),
    (4, "epsilon zeta zeta zeta"),
    (5, "alpha delta"),
]


def _py_reference(target_rows, raw_rows, k=1.0):
    """Pure-python replay of the estimator: per-word log weight and
    per-doc (n_tokens, logw_sum)."""
    tok = lambda s: [t for t in re.split(r"\W+", s.lower()) if t]  # noqa: E731
    tc: dict[str, int] = {}
    rc: dict[str, int] = {}
    for _, s in target_rows:
        for w in tok(s):
            tc[w] = tc.get(w, 0) + 1
    for _, s in raw_rows:
        for w in tok(s):
            rc[w] = rc.get(w, 0) + 1
    vocab = set(tc) | set(rc)
    v = len(vocab) + 1.0
    n_t, n_r = float(sum(tc.values())), float(sum(rc.values()))
    logw = {
        w: math.log((tc.get(w, 0) + k) / (n_t + k * v))
        - math.log((rc.get(w, 0) + k) / (n_r + k * v))
        for w in vocab
    }
    docs = {}
    for i, s in raw_rows:
        ws = tok(s)
        if ws:
            docs[i] = (len(ws), sum(logw[w] for w in ws))
    return logw, docs


def test_known_answer_weights_and_scores(spark):
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    weights = dsir_log_weights(target, raw)
    got_w = {r.w: r.logw for r in weights.collect()}
    ref_w, ref_docs = _py_reference(TARGET, RAW)
    assert set(got_w) == set(ref_w)
    for w in ref_w:
        assert got_w[w] == pytest.approx(ref_w[w], rel=1e-12), w
    got_d = {
        r.doc_id: (r.n_tokens, r.logw_sum)
        for r in dsir_scores(raw, weights).collect()
    }
    assert set(got_d) == set(ref_docs)
    for i, (n, s) in ref_docs.items():
        assert got_d[i][0] == n
        assert got_d[i][1] == pytest.approx(s, rel=1e-12)


def test_target_like_docs_score_higher_and_select_keeps_them(spark):
    """Planted contract: target words appear ONLY in target-like raw
    docs, junk words only in the rest — every target-like doc must
    out-score every junk doc, and select(frac) keeps exactly them."""
    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma alpha") for i in range(3)],
        "doc_id long, text string",
    )
    like = [(i, "alpha beta gamma beta") for i in range(5)]
    junk = [(10 + i, "omega psi chi omega") for i in range(5)]
    raw = spark.createDataFrame(like + junk, "doc_id long, text string")
    scores = {
        r.doc_id: r.logw_sum
        for r in dsir_scores(raw, dsir_log_weights(target, raw)).collect()
    }
    assert min(scores[i] for i, _ in like) > max(scores[i] for i, _ in junk)
    kept = {r.doc_id for r in dsir_select(target, raw, frac=0.5).collect()}
    assert kept == {i for i, _ in like}


def test_empty_and_oov_edges(spark):
    """Docs with no word tokens produce no score row (no evidence);
    words absent from the target corpus still get a finite smoothed
    weight (never -inf/null)."""
    target = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, "alpha"), (2, "zzz yyy"), (3, "!!! ???")],
        "doc_id long, text string",
    )
    out = dsir_scores(raw, dsir_log_weights(target, raw))
    rows = {r.doc_id: r for r in out.collect()}
    assert 3 not in rows  # punctuation-only doc: zero tokens
    assert rows[2].logw_sum is not None
    assert math.isfinite(rows[2].logw_sum)
    # unseen-in-target words score below seen-in-target words
    assert rows[2].logw_avg < rows[1].logw_avg


def test_target_pred_one_pass_matches_two_frame_fit(spark):
    """r16 one-pass fit: when target = raw.filter(pred), passing
    target_pred must produce the identical weight table (same
    vocabulary, equal logw to 1e-15) as the two-frame fit."""
    rows = [
        (i, "alpha beta gamma alpha" if i % 2 == 0 else "omega psi chi beta", "en" if i % 3 == 0 else "fr")
        for i in range(20)
    ]
    raw = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    two = {
        r.w: r.logw
        for r in dsir_log_weights(
            raw.filter(F.col("lang") == "en"), raw
        ).collect()
    }
    one = {
        r.w: r.logw
        for r in dsir_log_weights(
            None, raw, target_pred=F.col("lang") == "en"
        ).collect()
    }
    assert set(one) == set(two)
    for w in two:
        assert one[w] == pytest.approx(two[w], rel=1e-15), w
