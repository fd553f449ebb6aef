"""Small-file maintenance for the incremental indexes (r11): repeated
extend/ingest batches accrete one file per partition per batch;
compaction rewrites each index to bounded file counts WITHOUT changing
results — probed pairs and search top-1s are identical pre/post."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.ingest.neardup_maintenance import (
    compact_minhash_index,
    compact_neardup_index,
    ingest_neardup_batch,
)

SF = "/root/testdata/sf0.001"


def test_neardup_index_compaction_preserves_pairs(spark, tmp_path):
    from meerkat_spark.similarity.neardup_index import (
        build_neardup_index,
        incremental_neardup_pairs,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    idx = str(tmp_path / "ndx")
    build_neardup_index(emb.filter(F.col("vec_id") % 4 == 0), idx, threshold=0.95)
    # three append batches -> one postings file per band PER BATCH
    for rem in (1, 2, 3):
        ingest_neardup_batch(
            emb.filter(F.col("vec_id") % 4 == rem), idx, threshold=0.95
        )
    probe = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 500_000).cast("long").alias("vec_id"), "embedding"
    )
    before_pairs = {
        (r.id1, r.id2)
        for r in incremental_neardup_pairs(probe, idx, threshold=0.95).collect()
    }
    stats = compact_neardup_index(spark, idx)
    for d, (b, a) in stats.items():
        assert a < b, (d, b, a)
    n_bands = spark.read.parquet(f"{idx}/params").collect()[0].bands
    assert stats["postings"][1] == n_bands  # one file per band
    after_pairs = {
        (r.id1, r.id2)
        for r in incremental_neardup_pairs(probe, idx, threshold=0.95).collect()
    }
    assert after_pairs == before_pairs and before_pairs


def test_minhash_index_compaction_preserves_pairs(spark, tmp_path):
    from meerkat_spark.text.dedup_index import (
        BANDS,
        build_minhash_index,
        extend_minhash_index,
        incremental_dedup_pairs,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
        .select("doc_id", "text")
    )
    idx = str(tmp_path / "midx")
    build_minhash_index(docs.filter(F.col("doc_id") % 3 == 0), idx)
    extend_minhash_index(docs.filter(F.col("doc_id") % 3 == 1), idx)
    extend_minhash_index(docs.filter(F.col("doc_id") % 3 == 2), idx)
    probe = docs.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 700_000).alias("doc_id"), "text"
    )
    before = {
        (r.id1, r.id2) for r in incremental_dedup_pairs(probe, idx).collect()
    }
    stats = compact_minhash_index(spark, idx)
    b, a = stats["postings"]
    assert a < b and a == BANDS
    after = {
        (r.id1, r.id2) for r in incremental_dedup_pairs(probe, idx).collect()
    }
    assert after == before and before


def test_ivf_index_compaction_preserves_search(spark, tmp_path):
    from meerkat_spark.similarity.ivf_index import (
        build_ivf_index,
        compact_ivf_index,
        extend_ivf_index,
        ivf_search,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    idx = str(tmp_path / "ivfq")
    build_ivf_index(emb.filter(F.col("vec_id") % 3 == 0), idx, n_cells=8, quantize=True)
    copies = emb.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 100_000).cast("long").alias("vec_id"), "embedding"
    )
    extend_ivf_index(emb.filter(F.col("vec_id") % 3 == 1), idx)
    extend_ivf_index(emb.filter(F.col("vec_id") % 3 == 2).unionByName(copies), idx)
    q = emb.filter(F.col("vec_id") % 9 == 0)
    before = {
        (r.query_id, r.rank): (r.neighbor_id, r.sim)
        for r in ivf_search(spark, idx, q, k=1, n_probe=1).collect()
    }
    b, a = compact_ivf_index(spark, idx)
    assert a < b
    after = {
        (r.query_id, r.rank): (r.neighbor_id, r.sim)
        for r in ivf_search(spark, idx, q, k=1, n_probe=1).collect()
    }
    assert after == before
    for (qid, rank), (nid, sim) in after.items():
        assert rank == 1 and nid == qid + 100_000 and sim == 1.0
