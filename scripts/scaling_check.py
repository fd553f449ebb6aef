"""Throughput scaling measurement for the corpus-scale kernels: replicate
sf0.1 N× (fresh ids, so dedup classes don't balloon) and measure wall
time per operator. Row-local kernels should show throughput that scales
with cores and holds as the corpus grows.

Usage: python scripts/scaling_check.py [replications ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meerkat_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(df, n: int, id_col: str):
    legs = [
        df.withColumn(id_col, F.col(id_col) + F.lit(i * 1_000_000_000))
        for i in range(n)
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def main() -> None:
    reps = [int(x) for x in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("scaling_check")
    docs0 = spark.read.parquet(f"{SF}/documents.parquet")
    emb0 = spark.read.parquet(f"{SF}/embeddings.parquet")

    from meerkat_spark.similarity import knn, neardup
    from meerkat_spark.text import analysis as TA
    from meerkat_spark.text import dedup as TD

    for n in reps:
        docs = replicated(docs0, n, "doc_id").cache()
        emb = replicated(emb0, n, "vec_id").cache()
        n_docs, n_vecs = docs.count(), emb.count()

        t0 = time.time()
        TD.minhash_lsh_pairs(docs).count()
        t_lsh = time.time() - t0

        t0 = time.time()
        docs.select(
            "doc_id",
            TA.token_count(F.col("text")).alias("n_tok"),
            TA.quality_score(F.col("text")).alias("q"),
            TA.language_id(F.col("text")).alias("lang_id"),
            TA.fingerprint64(F.col("text")).alias("fp"),
        ).write.format("noop").mode("overwrite").save()
        t_stats = time.time() - t0

        q_pdf = (
            emb0.filter(F.col("vec_id") < 8)
            .select(
                F.col("vec_id").alias("query_id"),
                F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
            )
            .toPandas()
        )
        t0 = time.time()
        knn.brute_force_topk_vectorized(emb, q_pdf, k=5).count()
        t_knn = time.time() - t0

        t0 = time.time()
        neardup.neardup_pairs_lsh(emb, threshold=0.4).count()
        t_nd = time.time() - t0

        from meerkat_spark.text import pii
        from meerkat_spark.text.chunk import chunk_documents, pack_chunks

        t0 = time.time()
        pii.redact(docs.select("doc_id", "text"), with_counts=True).write.format(
            "noop"
        ).mode("overwrite").save()
        t_pii = time.time() - t0

        t0 = time.time()
        packed = pack_chunks(
            chunk_documents(docs.select("doc_id", "text")).drop("chunk_text"),
            budget=4096,
            n_shards=64,
        )
        n_chunks = packed.count()
        t_pack = time.time() - t0

        print(
            f"x{n}: docs={n_docs} vecs={n_vecs} | "
            f"minhash_lsh {t_lsh:.1f}s ({n_docs/t_lsh:,.0f} docs/s) | "
            f"text_stats {t_stats:.1f}s ({n_docs/t_stats:,.0f} docs/s) | "
            f"knn_vec {t_knn:.1f}s ({n_vecs/t_knn:,.0f} vecs/s) | "
            f"neardup_lsh {t_nd:.1f}s ({n_vecs/t_nd:,.0f} vecs/s) | "
            f"pii {t_pii:.1f}s ({n_docs/t_pii:,.0f} docs/s) | "
            f"chunk+pack {t_pack:.1f}s ({n_chunks} chunks, {n_docs/t_pack:,.0f} docs/s)",
            flush=True,
        )
        docs.unpersist()
        emb.unpersist()


if __name__ == "__main__":
    main()
