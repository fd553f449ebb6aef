"""Known-answer tests for text/vocab.py (corpus vocabulary + TF-IDF)."""

from __future__ import annotations

import math

from meerkat_spark.text.vocab import tf_idf_top_terms, token_frequencies, top_vocab

DOCS = [
    (1, "spark spark spark joins data"),
    (2, "data data pipelines"),
    (3, "spark pipelines; PIPELINES!"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_frequencies_counts_tf_and_df(spark):
    rows = {
        r.token: (r.tf, r.df)
        for r in token_frequencies(_df(spark)).collect()
    }
    assert rows["spark"] == (4, 2)
    assert rows["data"] == (3, 2)
    # case-folded and punctuation-split: 'pipelines;'/'PIPELINES!' merge
    assert rows["pipelines"] == (3, 2)
    assert rows["joins"] == (1, 1)


def test_top_vocab_order_and_tiebreak(spark):
    top = top_vocab(_df(spark), 3).collect()
    assert [r.token for r in top] == ["spark", "data", "pipelines"]
    # data vs pipelines both tf=3 → token asc breaks the tie
    assert top[1].tf == top[2].tf == 3


def test_tfidf_scores_and_ranks(spark):
    out = tf_idf_top_terms(_df(spark), k=2)
    rows = {(r.doc_id, r.rank): (r.token, r.score) for r in out.collect()}
    # doc 1: 'spark' tf=3 in-doc, df=2, N=3 → 3*(ln(4/3)+1)
    tok, score = rows[(1, 1)]
    assert tok == "spark"
    assert score == round(3 * (math.log(4 / 3) + 1), 6)
    # every doc has at most k ranked terms, ranks dense from 1
    by_doc: dict[int, list[int]] = {}
    for (doc, rank), _ in rows.items():
        by_doc.setdefault(doc, []).append(rank)
    for ranks in by_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 2


def test_tfidf_min_token_len_filters_short_tokens(spark):
    out = tf_idf_top_terms(_df(spark), k=5, min_token_len=6)
    toks = {r.token for r in out.collect()}
    assert toks == {"pipelines"}
