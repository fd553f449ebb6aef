"""Token-bloom full-text pre-filter: result parity with plain `has`,
no false negatives, bloom-first conjunct ordering in the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.functions.scalar import has_term
from meerkat_spark.text import index as ix

SF = "/root/testdata/sf0.001"


def test_has_indexed_matches_plain_has(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    indexed = ix.with_text_index(docs, "text")
    for term in ["spark", "shuffle", "the", "zzz_not_present"]:
        plain = {r.doc_id for r in docs.filter(has_term(F.col("text"), term)).collect()}
        fast = {r.doc_id for r in ix.has_indexed(indexed, "text", term).collect()}
        assert fast == plain, term


def test_bloom_no_false_negatives(spark):
    """Every document containing the token must pass the bloom probe —
    the pre-filter may over-select, never under-select."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    indexed = ix.with_text_index(docs, "text")
    term = "data"
    bloom_pass = {
        r.doc_id
        for r in indexed.filter(
            ix.bloom_might_contain(F.col("_tok_bloom"), term)
        ).collect()
    }
    exact = {
        r.doc_id
        for r in docs.filter(has_term(F.col("text"), term)).collect()
    }
    assert exact <= bloom_pass


def test_bloom_probe_is_selective(spark):
    """The probe must actually prune for a rare token (i.e. it is a real
    pre-filter, not a tautology)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    indexed = ix.with_text_index(docs, "text").cache()
    try:
        total = indexed.count()
        rare_pass = indexed.filter(
            ix.bloom_might_contain(F.col("_tok_bloom"), "zzz_not_present")
        ).count()
        assert rare_pass < total * 0.5
    finally:
        indexed.unpersist()


def test_bloom_probe_constant_folded(spark):
    """The literal-term probe must not re-hash per row: the plan shows a
    literal bitmask (no xxhash64 over a literal surviving optimization)
    and the bloom conjunct precedes the rlike verify."""
    from meerkat_spark.plans import executed_plan

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    indexed = ix.with_text_index(docs, "text")
    plan = executed_plan(ix.has_indexed(indexed, "text", "spark"))
    filt = [ln for ln in plan.splitlines() if "RLIKE" in ln or "rlike" in ln]
    assert filt, plan
    line = filt[0]
    assert line.index("&") < line.index("RLIKE" if "RLIKE" in line else "rlike")
