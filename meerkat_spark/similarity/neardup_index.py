"""Persisted sign-LSH embedding index + incremental near-duplicate
detection — the vector twin of text/dedup_index.py.

Embedding corpora grow in batches (new crawl shards, new model runs),
and each batch must near-dedup against BOTH itself and everything
already ingested without re-hashing the existing corpus. The index is
the exploded band-posting table (band_id, code, vec_id) partitioned by
band_id, plus the stored vectors (vec_id, embedding — ONE columnar
copy for exact-cosine verification) and a 1-row params table pinning
(bands, rows_per_band, dim) so every later batch hashes with the SAME
deterministic hyperplanes (knn._hyperplanes regenerates them from the
plane index — no plane matrices are stored or shipped).

Lifecycle:
- build_neardup_index(emb, path): derive (bands, rows) from the corpus
  count (neardup.derive_params — expected bucket stays bounded), write
  postings + vectors + params.
- incremental_neardup_pairs(new_emb, path, threshold): candidates
  new<->old via ONE equi-join on (band_id, code) against the stored
  postings and new<->new within the batch, then exact-cosine verify
  (Arrow-vectorized) — only candidate pairs are ever scored.
- extend_neardup_index(new_emb, path): append the batch's postings +
  vectors so the next batch sees it (call after keeping/deduping).

At 100 TB: postings are bands x 16 bytes per vector. In the
micro-batch regime the NEW batch's postings broadcast, so the probe
scans the stored postings IN PLACE — zero shuffle of the index per
batch at any index size (plan-pinned by tests/test_neardup_index.py);
a backfill above the broadcast threshold degrades to a both-sides
sort-merge shuffle — chunk it. Verification touches candidates only,
never all-pairs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meerkat_spark.localrel import local_df
from meerkat_spark.similarity import knn
from meerkat_spark.similarity.neardup import band_codes, derive_params


def _postings(
    emb: DataFrame, bands: int, rows: int, dim: int, id_col: str, vec_col: str
) -> DataFrame:
    v = knn._to_double(F.col(vec_col))
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(band_codes(v, bands, rows, dim)).alias("band_id", "code"),
    )


def _params(spark: SparkSession, path: str) -> tuple[int, int, int]:
    r = spark.read.parquet(os.path.join(path, "params")).collect()[0]
    return int(r.bands), int(r.rows_per_band), int(r.dim)


def build_neardup_index(
    emb: DataFrame,
    path: str,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    spark = emb.sparkSession
    n = emb.count()
    dim = len(emb.select(vec_col).first()[0])
    bands, rows = derive_params(n, threshold)
    local_df(
        spark, [(bands, rows, dim)], "bands int, rows_per_band int, dim int"
    ).write.mode("overwrite").parquet(os.path.join(path, "params"))
    _postings(emb, bands, rows, dim, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("band_id").parquet(os.path.join(path, "postings"))
    emb.select(
        F.col(id_col).alias("vec_id"), knn._to_double(F.col(vec_col)).alias("vec")
    ).write.mode("overwrite").parquet(os.path.join(path, "vectors"))


def extend_neardup_index(
    new_emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a new batch's postings + vectors (call after deduping)."""
    spark = new_emb.sparkSession
    bands, rows, dim = _params(spark, path)
    _postings(new_emb, bands, rows, dim, id_col, vec_col).write.mode(
        "append"
    ).partitionBy("band_id").parquet(os.path.join(path, "postings"))
    new_emb.select(
        F.col(id_col).alias("vec_id"), knn._to_double(F.col(vec_col)).alias("vec")
    ).write.mode("append").parquet(os.path.join(path, "vectors"))


def incremental_neardup_pairs(
    new_emb: DataFrame,
    path: str,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Verified near-dup pairs (id1, id2, sim, id1_is_new) for a new
    batch: id2 is always a new-batch vector; id1_is_new separates
    new-vs-new (True, id1 < id2) from new-vs-indexed (False). New ids
    must not collide with indexed ids (caller contract, same as the
    text index). Candidates come from band-code collisions only; the
    exact cosine verify (Arrow-vectorized) scores just those pairs."""
    spark = new_emb.sparkSession
    bands, rows, dim = _params(spark, path)
    new_posts = _postings(new_emb, bands, rows, dim, id_col, vec_col)
    new_vecs = new_emb.select(
        F.col(id_col).alias("vec_id"), knn._to_double(F.col(vec_col)).alias("vec")
    )
    old_posts = spark.read.parquet(os.path.join(path, "postings"))
    old_vecs = spark.read.parquet(os.path.join(path, "vectors"))

    np_l = new_posts.select(
        F.col("vec_id").alias("id2"), "band_id", "code"
    )
    vs_old = (
        np_l.join(old_posts, ["band_id", "code"])
        .select(
            F.col("vec_id").alias("id1"), "id2", F.lit(False).alias("id1_is_new")
        )
        .filter(F.col("id1") != F.col("id2"))
        .distinct()
    )
    l, r = new_posts.alias("l"), new_posts.alias("r")
    vs_new = (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.code") == F.col("r.code"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("id1"),
            F.col("r.vec_id").alias("id2"),
            F.lit(True).alias("id1_is_new"),
        )
        .distinct()
    )
    all_vecs = old_vecs.unionByName(new_vecs)
    cand = vs_old.unionByName(vs_new)
    cos = knn.cosine_pandas_udf()
    return (
        cand.join(
            all_vecs.select(F.col("vec_id").alias("id1"), F.col("vec").alias("v1")),
            "id1",
        )
        .join(
            new_vecs.select(F.col("vec_id").alias("id2"), F.col("vec").alias("v2")),
            "id2",
        )
        .withColumn("sim", F.round(cos(F.col("v1"), F.col("v2")), round_dp))
        .filter(F.col("sim") >= threshold)
        .select("id1", "id2", "sim", "id1_is_new")
    )
