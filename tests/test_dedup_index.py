"""Incremental MinHash dedup: a new batch is checked against the
persisted corpus index (and itself) without re-reading corpus text;
the index extends batch over batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.text.dedup_index import (
    build_minhash_index,
    extend_minhash_index,
    incremental_dedup_pairs,
)

SF = "/root/testdata/sf0.001"


def test_incremental_dedup_across_batches(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 60)
    idx = str(tmp_path / "mh")
    build_minhash_index(corpus, idx)

    # new batch: one exact copy of corpus doc 3, one near-copy of doc 7,
    # one fresh doc (id 90 is not in the corpus slice)
    base = {r.doc_id: r.text for r in docs.filter(F.col("doc_id").isin(3, 7, 90)).collect()}
    batch = spark.createDataFrame(
        [
            (1003, base[3]),
            (1007, base[7] + " extra tail words"),
            (1090, base[90]),
        ],
        "doc_id long, text string",
    )
    pairs = incremental_dedup_pairs(batch, idx)
    got = {(r.id1, r.id2) for r in pairs.collect()}
    assert (3, 1003) in got  # exact copy found against the INDEX
    assert (7, 1007) in got  # near-copy found
    assert not any(p[1] == 1090 for p in got)  # fresh doc is clean

    # corpus text is not re-read: the only parquet scans are the index
    # (band postings) and the new batch source
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan

    # extend with the deduped batch; a later copy of 1090's text now hits
    extend_minhash_index(batch.filter(F.col("doc_id") == 1090), idx)
    batch2 = spark.createDataFrame([(2090, base[90])], "doc_id long, text string")
    got2 = {(r.id1, r.id2) for r in incremental_dedup_pairs(batch2, idx).collect()}
    assert (1090, 2090) in got2


def test_incremental_matches_batch_semantics(spark, tmp_path):
    """Index-join candidates ⊇ what a from-scratch LSH run finds between
    the same two doc sets (same bands/perms ⇒ same collisions)."""
    from meerkat_spark.text.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 40)
    batch = docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 80)).union(
        corpus.select((F.col("doc_id") + 5000).alias("doc_id"), "text").limit(5)
    )
    idx = str(tmp_path / "mh")
    build_minhash_index(corpus, idx)
    inc = {(r.id1, r.id2) for r in incremental_dedup_pairs(batch, idx).collect()}
    full = {
        (r.id1, r.id2)
        for r in minhash_lsh_pairs(corpus.union(batch), route_exact=False).collect()
    }
    # every full-run pair touching a new doc appears in the incremental set
    new_ids = {r.doc_id for r in batch.collect()}
    cross = {p for p in full if p[1] in new_ids or p[0] in new_ids}
    missing = {
        (a, b) for a, b in cross if (a, b) not in inc and (b, a) not in inc
    }
    assert not missing, missing


def test_probe_join_broadcasts_new_side_stored_unshuffled(spark, tmp_path):
    """r12 plan pin for the scale claim in the module docstring: in the
    micro-batch regime the probe is a BroadcastHashJoin with the NEW
    side as build — the stored postings scan feeds the join with NO
    Exchange above it (the index is never shuffled, at any size)."""
    from meerkat_spark.text.dedup_index import (
        build_minhash_index,
        incremental_dedup_pairs,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    idx = str(tmp_path / "plainidx")
    build_minhash_index(docs.filter("doc_id < 200"), idx)
    batch = docs.filter("doc_id >= 200 and doc_id < 260")
    plan = (
        incremental_dedup_pairs(batch, idx)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan[:2000]
    # the vs-old probe joins on (band_id, band_hash) with BuildLeft —
    # the broadcast (build) side is the NEW postings, so the stored
    # scan streams in place
    import re

    vs_old = [
        ln for ln in plan.splitlines()
        if "BroadcastHashJoin" in ln and "band_hash" in ln
    ]
    assert vs_old and any("BuildLeft" in ln or "BuildRight" in ln for ln in vs_old)
    # no SortMergeJoin anywhere: nothing shuffled the stored postings
    assert "SortMergeJoin" not in plan
