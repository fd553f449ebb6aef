"""Incremental embedding near-dup index (similarity/neardup_index.py):
build/extend/probe lifecycle, planted-copy exactness across batches,
param persistence (later batches hash with the build-time planes), and
candidate-only verification."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.similarity.neardup_index import (
    build_neardup_index,
    extend_neardup_index,
    incremental_neardup_pairs,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _copies(emb, step, offset):
    return emb.filter(F.col("vec_id") % step == 0).select(
        (F.col("vec_id") + offset).cast("long").alias("vec_id"), "embedding"
    )


def test_incremental_lifecycle_across_batches(spark, tmp_path):
    emb = _emb(spark)
    idx = str(tmp_path / "ndx")
    build_neardup_index(emb, idx, threshold=0.95)

    # batch 1: copies of every 10th — each must match exactly its source
    b1 = _copies(emb, 10, 1_000_000)
    pairs = incremental_neardup_pairs(b1, idx, threshold=0.95).collect()
    assert len(pairs) == b1.count()
    for p in pairs:
        assert p.id2 == p.id1 + 1_000_000 and p.sim == 1.0
        assert p.id1_is_new is False

    # extend, then batch 2 duplicates every 20th: each copy now matches
    # BOTH its original and the batch-1 copy already in the index
    extend_neardup_index(b1, idx)
    b2 = _copies(emb, 20, 2_000_000)
    got = {
        (p.id1, p.id2)
        for p in incremental_neardup_pairs(b2, idx, threshold=0.95).collect()
    }
    want = set()
    for r in b2.collect():
        src = r.vec_id - 2_000_000
        want.add((src, r.vec_id))
        want.add((src + 1_000_000, r.vec_id))
    assert got == want


def test_within_batch_pairs_flagged_new(spark, tmp_path):
    emb = _emb(spark)
    idx = str(tmp_path / "ndx2")
    build_neardup_index(emb.filter(F.col("vec_id") >= 400), idx, threshold=0.95)
    # a batch containing BOTH members of a dup pair (neither indexed)
    a = _copies(emb.filter(F.col("vec_id") < 5), 1, 3_000_000)
    b = _copies(emb.filter(F.col("vec_id") < 5), 1, 4_000_000)
    batch = a.unionByName(b)
    pairs = incremental_neardup_pairs(batch, idx, threshold=0.95).collect()
    assert len(pairs) == 5
    for p in pairs:
        assert p.id1_is_new is True and p.id1 < p.id2
        assert p.id2 - p.id1 == 1_000_000 and p.sim == 1.0


def test_params_persist_so_extensions_match_build_planes(spark, tmp_path):
    """A later batch must hash with the BUILD-time (bands, rows) even
    if its own size would derive different params — otherwise stored
    and new codes never collide."""
    emb = _emb(spark)
    idx = str(tmp_path / "ndx3")
    build_neardup_index(emb, idx, threshold=0.95)
    one = _copies(emb.filter(F.col("vec_id") == 0), 1, 5_000_000)  # 1-row batch
    pairs = incremental_neardup_pairs(one, idx, threshold=0.95).collect()
    assert len(pairs) == 1 and pairs[0].id1 == 0 and pairs[0].sim == 1.0


def test_probe_join_broadcasts_new_side_stored_unshuffled(spark, tmp_path):
    """r12 plan pin (embedding twin of the MinHash-index test): the
    micro-batch probe broadcasts the NEW postings; the stored postings
    are scanned in place — no SortMergeJoin, no shuffle of the index."""
    from meerkat_spark.similarity.neardup_index import (
        build_neardup_index,
        incremental_neardup_pairs,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    idx = str(tmp_path / "vidx")
    build_neardup_index(emb.filter("vec_id < 200"), idx, threshold=0.95)
    batch = emb.filter("vec_id >= 200 and vec_id < 260")
    plan = (
        incremental_neardup_pairs(batch, idx, threshold=0.95)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan
