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


def test_sweep_restores_live_dir_after_crash_between_renames(spark, tmp_path):
    """r13 (ADVICE r12, high): a compaction that crashes BETWEEN
    os.rename(dir, old) and os.rename(tmp, dir) leaves NO live dir —
    the `.old-*` residue is the only copy. The old sweep rmtree'd it
    unconditionally (destroying the table); it must instead rename the
    newest residue back into place, and only reclaim residue while a
    live dir exists."""
    import os

    from meerkat_spark.ingest.neardup_maintenance import (
        _compact_dir,
        _sweep_stale_swaps,
    )

    d = str(tmp_path / "tbl")
    spark.range(100).selectExpr("id", "id % 3 AS k").write.parquet(d)
    want = set(range(100))

    # simulate the crash-between-renames state: live dir renamed away,
    # plus an orphaned tmp from the same dead run
    os.rename(d, d + ".old-deadbeef")
    os.mkdir(d + ".compact-deadbeef")
    assert not os.path.isdir(d)

    _sweep_stale_swaps(d)
    assert os.path.isdir(d)  # restored from the .old residue
    assert not os.path.isdir(d + ".old-deadbeef")
    assert not os.path.isdir(d + ".compact-deadbeef")
    got = {r.id for r in spark.read.parquet(d).collect()}
    assert got == want  # data intact

    # and a full compaction straight out of the crashed state works too
    os.rename(d, d + ".old-cafecafe")
    before, after = _compact_dir(spark, d, None, 1_000_000)
    assert {r.id for r in spark.read.parquet(d).collect()} == want
    assert after >= 1

    # residue-only healthy case: live dir present -> residue swept
    os.mkdir(d + ".old-11111111")
    os.mkdir(d + ".compact-22222222")
    _sweep_stale_swaps(d)
    assert os.path.isdir(d)
    assert not os.path.isdir(d + ".old-11111111")
    assert not os.path.isdir(d + ".compact-22222222")

    # pathological: no live dir, no .old, an orphan tmp -> NOTHING is
    # deleted (the tmp may be the only surviving write)
    empty = str(tmp_path / "gone")
    os.mkdir(empty + ".compact-33333333")
    _sweep_stale_swaps(empty)
    assert os.path.isdir(empty + ".compact-33333333")


def test_compact_partition_recovers_crashed_swap(spark, tmp_path):
    """r13 (ADVICE r12, high): ingest/compact.compact_partition shares
    the crash-recovery sweep — a day partition stranded as `.old-*`
    is restored and compacted, not deleted."""
    import os

    from meerkat_spark.ingest.batch import DAY_COL, DEDUP_COL, TS_COL
    from meerkat_spark.ingest.compact import compact_partition

    tbl = str(tmp_path / "events_tbl")
    day = "2026-01-01"
    part = os.path.join(tbl, f"{DAY_COL}={day}")
    spark.range(50).selectExpr(
        "id AS v",
        f"timestamp('2026-01-01 00:00:00') + make_interval(0,0,0,0,0,0,id) AS {TS_COL}",
        f"CAST(id AS STRING) AS {DEDUP_COL}",
    ).write.parquet(part)

    os.rename(part, part + ".old-deadbeef")  # crashed between renames
    assert not os.path.isdir(part)
    before, after = compact_partition(spark, tbl, day)
    assert before == after == 50
    assert spark.read.parquet(part).count() == 50
