"""SemDeDup (similarity/semdedup.py): planted-copy recall, natural-row
pass-through, exact-dup star routing, and the oversized-cluster guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.similarity.semdedup import semdedup, semdedup_pairs

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding"
    )


def _with_copies(spark, mod=10, delta=1_000_000):
    emb = _emb(spark)
    copies = emb.filter(F.col("vec_id") % mod == 0).select(
        (F.col("vec_id") + delta).cast("long").alias("vec_id"), "embedding"
    )
    return emb, emb.unionByName(copies)


def test_semdedup_drops_copies_keeps_originals(spark):
    emb, corpus = _with_copies(spark)
    out = {r.vec_id for r in semdedup(corpus, threshold=0.9).collect()}
    base = {r.vec_id for r in emb.collect()}
    assert out == base  # every copy dropped, every original kept


def test_semdedup_pairs_exact_dups_are_star_edges(spark):
    """A class of k byte-identical vectors contributes k-1 star edges
    (rep, member) — linear, never k(k-1)/2."""
    emb = _emb(spark).limit(5)
    # 4 extra copies of vec 0 -> class size 5
    clones = [emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100 + i).alias("vec_id"), "embedding") for i in range(4)]
    corpus = emb
    for c in clones:
        corpus = corpus.unionByName(c)
    pairs = semdedup_pairs(corpus, threshold=0.99).collect()
    cls = [(p.id1, p.id2) for p in pairs if p.id1 == 0 or p.id2 == 0]
    assert len(cls) == 4 and all(p[0] == 0 for p in cls)


def test_semdedup_oversized_cluster_guard(spark):
    """Clusters past max_cluster are skipped (no pair explosion), and
    the keeper then keeps everything from that cluster except exact
    dups (star edges still flow)."""
    emb, corpus = _with_copies(spark)
    # one cluster for everything + tiny cap -> pairwise stage must skip
    pairs = semdedup_pairs(corpus, threshold=0.0, n_clusters=1, max_cluster=3)
    n_vec = corpus.count()
    n_copies = corpus.count() - _emb(spark).count()
    # only the star edges remain (threshold 0 would otherwise pair everything)
    assert pairs.count() == n_copies
    assert pairs.count() < n_vec * (n_vec - 1) / 2


def test_semdedup_plan_no_cartesian(spark):
    _, corpus = _with_copies(spark)
    plan = semdedup(corpus)._jdf.queryExecution().optimizedPlan().toString()
    assert "Join Cross" not in plan
