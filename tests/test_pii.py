"""PII redaction + repetition metrics: planted-PII known answers,
Java-regex/RE2 dialect parity for every pattern, and hand-computed
Gopher repetition fractions."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from meerkat_spark.text import pii
from meerkat_spark.text.analysis import repetition_features


def test_redact_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.x+t@foo-bar.co.uk now"),
            (2, "hosts 192.168.001.255 and 1.2.3.4."),
            (3, "call 555-867-5309 or (415) 555-0123 x"),
            (4, "ssn 123-45-6789 ok"),
            (5, "clean text with no pii at all"),
        ],
        "id int, text string",
    )
    out = {r.id: r.text for r in pii.redact(df).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "hosts <IP> and <IP>."
    assert out[3] == "call <PHONE> or <PHONE> x"
    assert out[4] == "ssn <SSN> ok"
    assert out[5] == "clean text with no pii at all"


def test_counts_counted_before_redaction(spark):
    df = spark.createDataFrame(
        [(1, "a@b.io c@d.io 10.0.0.1 555-123-4567 123-45-6789")],
        "id int, text string",
    )
    row = pii.redact(df, with_counts=True).collect()[0]
    assert (row.n_email, row.n_ip, row.n_phone, row.n_ssn) == (2, 1, 1, 1)
    assert row.text == "<EMAIL> <EMAIL> <IP> <PHONE> <SSN>"


def test_dialect_parity_every_pattern():
    """Each pattern must behave identically under Python/Java regex and
    DuckDB's RE2 (the oracle engine) on tricky boundary inputs."""
    con = duckdb.connect()
    samples = [
        "a.b+x@foo-bar.co.uk end",
        "x@y.io.",
        "1.2.3.4 12.34.56.789 1234.1.1.1",
        "(415) 555-0123, 555.867.5309, 555 867 5309",
        "123-45-6789 1234-45-6789 123-456-7890",
        "no pii here 42",
    ]
    for s in samples:
        for kind, (pat, repl) in pii.PII_PATTERNS.items():
            d = con.execute(
                "select regexp_replace(?, ?, ?, 'g')", [s, pat, repl]
            ).fetchone()[0]
            p = re.sub(pat, repl, s)
            assert d == p, (kind, s, d, p)


def test_repetition_known_answers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat"),
            (2, "spam spam spam spam"),
            (3, "one"),
        ],
        "id int, text string",
    )
    f = repetition_features(F.col("text"))
    rows = {
        r.id: r
        for r in df.select(
            "id", *[v.alias(k) for k, v in f.items()]
        ).collect()
    }
    r1 = rows[1]  # 8 words, 5 distinct, "the"×3; "the cat"×2 of 7 grams
    assert r1.n_words == 8
    assert r1.dup_word_frac == pytest.approx(3 / 8)
    assert r1.top_word_frac == pytest.approx(3 / 8)
    assert r1.dup_bigram_frac == pytest.approx(1 / 7)
    assert r1.top_bigram_frac == pytest.approx(2 / 7)
    r2 = rows[2]
    assert r2.top_word_frac == pytest.approx(1.0)
    assert r2.top_bigram_frac == pytest.approx(1.0)
    r3 = rows[3]  # single word: no bigrams → fractions 0, not errors
    assert (r3.top_word_frac, r3.top_bigram_frac) == (1.0, 0.0)


def test_repetition_filter_drops_degenerate(spark):
    from meerkat_spark.text.analysis import repetition_filter

    df = spark.createDataFrame(
        [
            (1, "a normal sentence with mostly unique words inside"),
            (2, "buy buy buy buy buy buy buy buy buy buy"),
        ],
        "id int, text string",
    )
    kept = [r.id for r in repetition_filter(df).collect()]
    assert kept == [1]


def test_compression_ratio_signal(spark):
    """Repetitive text compresses far better than varied text; empty
    text yields 0 without dividing by zero."""
    import zlib

    from meerkat_spark.text.analysis import compression_ratio_udf

    rows = [
        (1, "spam " * 200),
        (2, "the quick brown fox jumps over the lazy dog in a very fine park today"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    cr = compression_ratio_udf()
    got = {r.id: r.cr for r in df.select("id", cr("text").alias("cr")).collect()}
    assert got[1] < 0.1 < got[2]
    assert got[3] == 0.0
    raw = rows[1][1].encode()
    assert got[2] == pytest.approx(len(zlib.compress(raw, 6)) / len(raw))


def test_gopher_quality_filter_bundle(spark):
    from meerkat_spark.text.analysis import gopher_quality_filter

    good = "the quick brown fox jumps over the lazy dog and then it runs back home across the wide green field while the sun sets slowly in the west and the birds sing their evening songs over the quiet hills again and again until night falls gently on the town below"
    rows = [
        (1, good),                                     # passes
        (2, "short text"),                             # too few words
        (3, "buy " * 80),                              # repetition degenerate
        (4, ("x7# " * 80).strip()),                    # no stopwords + symbols
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    kept = [r.id for r in gopher_quality_filter(df).collect()]
    assert kept == [1]
