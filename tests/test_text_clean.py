"""Boilerplate segment removal: planted repeated lines vanish, unique
content and ordering survive, fully-boilerplate docs become empty."""

from __future__ import annotations

from meerkat_spark.text import clean


def test_remove_boilerplate_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nreal content one\nFOOTER"),
            (2, "COOKIE BANNER\nreal content two\nFOOTER"),
            (3, "only unique text here"),
            (4, "COOKIE BANNER\nFOOTER"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in clean.remove_boilerplate(docs, min_docs=2).collect()}
    assert out[1] == "real content one"
    assert out[2] == "real content two"
    assert out[3] == "only unique text here"
    assert out[4] == ""  # everything was boilerplate


def test_remove_boilerplate_preserves_order(spark):
    docs = spark.createDataFrame(
        [(1, "keep a\nDROP\nkeep b\nkeep c"), (2, "DROP")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in clean.remove_boilerplate(docs, min_docs=2).collect()}
    assert out[1] == "keep a\nkeep b\nkeep c"


def test_boilerplate_detection_counts_distinct_docs(spark):
    # a line repeated WITHIN one doc is not boilerplate
    docs = spark.createDataFrame(
        [(1, "x\nx\nx"), (2, "y")], "doc_id long, text string"
    )
    assert clean.boilerplate_segments(docs, min_docs=2).count() == 0
