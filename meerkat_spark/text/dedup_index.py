"""Persisted MinHash-LSH index + incremental dedup.

The pretraining-pipeline reality `minhash_lsh_pairs` doesn't cover:
corpora grow in batches, and each new batch must be deduped against
BOTH itself and everything already ingested — without recomputing the
existing corpus's signatures. The index is the exploded band table
(band_id, band_hash, doc_id) written partitioned by band_id: new docs
hash row-locally, then one equi-join on (band_id, band_hash) meets
exactly the stored postings that collide — the corpus text is never
re-read, never re-hashed.

Lifecycle:
- build_minhash_index(docs, path): signatures → band hashes → append.
- incremental_dedup_pairs(new_docs, path): candidates new↔old and
  new↔new in one pass.
- extend_minhash_index(new_docs, path): append the (deduped) batch's
  postings so the next batch sees it.

At 100TB: the index is ~bands × 16 bytes per doc — a small fraction of
the text. In the micro-batch regime (the keeper loops' shape) the NEW
batch's postings land under the broadcast threshold, so the probe is a
BroadcastHashJoin with the new side as build: the stored postings are
scanned IN PLACE — zero shuffle of the index, per batch, at any index
size (plan-pinned by tests/test_dedup_index.py). A backfill batch
above the broadcast threshold degrades to a sort-merge join that
shuffles BOTH sides — split giant backfills into broadcastable chunks
(the sequential foreachBatch loop does exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meerkat_spark.text.dedup import minhash_signatures

N_PERM = 64
BANDS = 16


def _band_postings(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n_perm: int,
    bands: int,
    shingle_k: int,
) -> DataFrame:
    """(band_id, band_hash, doc_id) postings — row-local then explode."""
    rows = n_perm // bands
    non_empty = docs.filter(F.trim(F.coalesce(F.col(text_col), F.lit(""))) != "")
    sig = minhash_signatures(non_empty, text_col, id_col, n_perm, shingle_k)
    band_arr = F.array(
        *[
            F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)])
            for b in range(bands)
        ]
    )
    return sig.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(band_arr).alias("band_id", "band_hash"),
    )


def build_minhash_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = N_PERM,
    bands: int = BANDS,
    shingle_k: int = 3,
) -> None:
    _band_postings(docs, text_col, id_col, n_perm, bands, shingle_k).write.mode(
        "overwrite"
    ).partitionBy("band_id").parquet(path)


def extend_minhash_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = N_PERM,
    bands: int = BANDS,
    shingle_k: int = 3,
) -> None:
    """Append a new batch's postings (call after deduping the batch)."""
    _band_postings(new_docs, text_col, id_col, n_perm, bands, shingle_k).write.mode(
        "append"
    ).partitionBy("band_id").parquet(path)


def incremental_dedup_pairs(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = N_PERM,
    bands: int = BANDS,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id1, id2, id1_is_new) for a new batch:
    id2 is always a new-batch doc; id1_is_new distinguishes new-vs-new
    pairs (True) from new-vs-indexed-corpus pairs (False). New-batch ids
    must not collide with indexed ids (caller contract — monotone doc
    ids, the append-only `_ts` discipline)."""
    spark: SparkSession = new_docs.sparkSession
    new_posts = _band_postings(
        new_docs, text_col, id_col, n_perm, bands, shingle_k
    ).withColumnRenamed("doc_id", "new_id")
    old_posts = spark.read.parquet(path)

    vs_old = (
        new_posts.join(old_posts, ["band_id", "band_hash"])
        .select(
            F.col("doc_id").alias("id1"),
            F.col("new_id").alias("id2"),
            F.lit(False).alias("id1_is_new"),
        )
        .filter(F.col("id1") != F.col("id2"))
    )
    l, r = new_posts.alias("l"), new_posts.alias("r")
    vs_new = (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.new_id") < F.col("r.new_id")),
        )
        .select(
            F.col("l.new_id").alias("id1"),
            F.col("r.new_id").alias("id2"),
            F.lit(True).alias("id1_is_new"),
        )
    )
    return vs_old.unionByName(vs_new).distinct()
