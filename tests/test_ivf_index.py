"""Persisted IVF index: build-once/search-many lifecycle — recall vs
brute force, search touches only probed partitions, repeat searches
reuse the stored assignment (no retraining)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.similarity import knn
from meerkat_spark.similarity.ivf_index import build_ivf_index, ivf_search

SF = "/root/testdata/sf0.001"


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_build_search_recall_and_pruning(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=8)

    q = emb.filter(F.col("vec_id") < 8)
    out = ivf_search(spark, idx, q, k=5, n_probe=4)
    exact = _topk_sets(knn.brute_force_topk(emb, q, k=5))
    approx = _topk_sets(out)
    recalls = [len(exact[qid] & approx.get(qid, set())) / 5 for qid in exact]
    assert sum(recalls) / len(recalls) >= 0.3, recalls

    # the probed cell ids reach the scan as PARTITION filters — the
    # layout-level pruning that makes the persisted index worth building
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell_id" in plan, plan[:2000]

    # a second search (different queries) reuses the stored index
    q2 = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 12))
    out2 = ivf_search(spark, idx, q2, k=3, n_probe=3)
    assert out2.count() == 4 * 3


def test_index_matches_inline_ivf_shape(spark, tmp_path):
    """Persisted search returns the same schema/contract as the inline
    ivf_topk operator (drop-in replacement on the query side)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=8)
    q = emb.filter(F.col("vec_id") < 4)
    persisted = ivf_search(spark, idx, q, k=3, n_probe=8)  # probe all cells
    inline = knn.ivf_topk(emb, q, k=3, n_cells=8, n_probe=8)
    assert persisted.columns == inline.columns
    # probing ALL cells makes both exact: identical neighbor sets
    assert _topk_sets(persisted) == _topk_sets(inline)


def test_two_level_exact_dup_contract_and_recall(spark, tmp_path):
    """IMI-style two-level build (super argmax -> in-group cell argmax,
    O(n * n^0.25) assignment work instead of flat O(n * sqrt n)).
    Search mirrors the routing, so an identical query/corpus vector pair
    ALWAYS meets in the same cell: top-1 at n_probe=1 must be the
    planted exact duplicate at sim 1.0."""
    import os

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dups = emb.filter(F.col("vec_id") < 10).withColumn(
        "vec_id", F.col("vec_id") + F.lit(100000)
    )
    idx = str(tmp_path / "ivf2l")
    build_ivf_index(emb.unionByName(dups), idx, n_cells=16, two_level=True)
    assert os.path.isdir(f"{idx}/supercentroids")

    q = emb.filter(F.col("vec_id") < 10)
    out = {r.query_id: r for r in ivf_search(spark, idx, q, k=1, n_probe=1).collect()}
    assert len(out) == 10
    for qid, r in out.items():
        assert r.neighbor_id == qid + 100000 and r.sim == 1.0, r

    # non-degenerate recall on ordinary (non-dup) queries with probes
    q2 = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 28))
    exact = _topk_sets(knn.brute_force_topk(emb.unionByName(dups), q2, k=5))
    approx = _topk_sets(ivf_search(spark, idx, q2, k=5, n_probe=4))
    recalls = [len(exact[qid] & approx.get(qid, set())) / 5 for qid in exact]
    assert sum(recalls) / len(recalls) >= 0.3, recalls


def test_default_n_cells_scales_sqrt(spark, tmp_path):
    """n_cells=None sizes the index at ~sqrt(corpus) (clamped to
    [4, 65536]) — the r8 scale fix: fixed cell counts make probe cost
    linear in the corpus; sqrt keeps centroid-scan and cell-scan both
    O(sqrt n). Pin the sizing so a refactor can't silently regress the
    default back to a constant."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    idx = str(tmp_path / "ivf_default")
    build_ivf_index(emb, idx)
    got = spark.read.parquet(f"{idx}/centroids").count()
    assert got == int(min(max(round(n**0.5), 4), 1 << 16))
    # search still returns k results per query against the default index
    q = emb.filter(F.col("vec_id") < 4)
    out = ivf_search(spark, idx, q, k=3, n_probe=4)
    per_q = {r.query_id for r in out.collect()}
    assert len(per_q) == 4
