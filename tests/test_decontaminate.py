"""Decontamination: planted benchmark overlap is found (hash and string
gram variants agree); clean docs survive."""

from __future__ import annotations

from meerkat_spark.text import decontaminate as DC


def _tables(spark):
    corpus = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog tonight"),
            (101, "completely unrelated corpus text about spark plans"),
            (102, "quick brown fox appears here too with more words"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "a quick brown fox question"), (2, "nothing shared at all zzz")],
        "doc_id long, text string",
    )
    return corpus, bench


def test_contamination_pairs_hash_and_string_agree(spark):
    corpus, bench = _tables(spark)
    for hashed in (True, False):
        pairs = {
            (r.corpus_id, r.bench_id)
            for r in DC.contamination_pairs(
                corpus, bench, k=3, min_shared=1, hashed=hashed
            ).collect()
        }
        # 'quick brown fox' is the shared 3-gram
        assert pairs == {(100, 1), (102, 1)}, (hashed, pairs)


def test_decontaminate_drops_only_contaminated(spark):
    corpus, bench = _tables(spark)
    kept = {r.doc_id for r in DC.decontaminate(corpus, bench, k=3).collect()}
    assert kept == {101}


def test_min_shared_threshold(spark):
    corpus, bench = _tables(spark)
    pairs = DC.contamination_pairs(corpus, bench, k=3, min_shared=2).count()
    assert pairs == 0  # only one shared gram per pair


def test_empty_docs_never_contaminate(spark):
    """Zero-word docs must emit NO grams: the '' gram would make every
    empty corpus doc 'share' a gram with every empty/short benchmark doc
    and be dropped as contaminated."""
    corpus = spark.createDataFrame(
        [(200, ""), (201, "   "), (202, "real content words here")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, ""), (2, "short"), (3, "benchmark only text")],
        "doc_id long, text string",
    )
    for hashed in (True, False):
        pairs = DC.contamination_pairs(
            corpus, bench, k=3, min_shared=1, hashed=hashed
        ).collect()
        assert pairs == [], (hashed, pairs)
        kept = {
            r.doc_id
            for r in DC.decontaminate(corpus, bench, k=3, hashed=hashed).collect()
        }
        assert kept == {200, 201, 202}, hashed
