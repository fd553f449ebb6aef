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


def test_sentence_chunking(spark):
    from pyspark.sql import functions as F

    from meerkat_spark.text.chunk import chunk_by_sentences, split_sentences

    df = spark.createDataFrame(
        [
            (1, "First one. Second here! Third now? 'Quoted start.' final lower continues."),
            (2, " ".join(f"Sentence number {i} has six words." for i in range(10))),
        ],
        "doc_id long, text string",
    )
    sents = df.where("doc_id = 1").select(split_sentences("text").alias("s")).collect()[0].s
    # splits only before an upper/digit/quote opener — the lower-case
    # continuation after the quoted sentence stays attached
    assert sents == [
        "First one.",
        "Second here!",
        "Third now?",
        "'Quoted start.' final lower continues.",
    ]

    chunks = chunk_by_sentences(df.where("doc_id = 2"), max_tokens=12).orderBy(
        "chunk_id"
    )
    rows = chunks.collect()
    # six-word sentences, 12-token budget -> exactly two per chunk
    assert len(rows) == 5
    assert all(len(r.chunk_text.split()) == 12 for r in rows)
    # reassembly preserves every sentence in order
    joined = " ".join(r.chunk_text for r in rows)
    assert joined == df.where("doc_id = 2").collect()[0].text
    # a single over-budget sentence still lands (never split)
    big = spark.createDataFrame(
        [(3, "word " * 50 + "end.")], "doc_id long, text string"
    )
    got = chunk_by_sentences(big, max_tokens=10).collect()
    assert len(got) == 1 and got[0].chunk_text.endswith("end.")
