"""The round-5 corpus gates composed into one lazy plan:

  raw docs (+ synthesized URLs)
    → URL/domain blocklist        (text/urlfilter.py — broadcast
                                   left-anti join chain, map-side)
    → Gopher quality gate         (text/analysis.py — one codegen
                                   filter, zero shuffles)
    → model-based quality gate    (text/classifier.py — hashed
                                   features, broadcast weight join)
    → duplicated-span removal     (text/spandedup.py — content-defined
                                   window hashing, one hash-key agg)
    → sentence-aware chunking     (text/chunk.py chunk_by_sentences —
                                   row-local greedy packing)
    → temperature mixing          (operators/sampling.py — p^α
                                   language balancing, hash buckets)

Run: python examples/corpus_gates.py [sf_dir]
(default /root/testdata/sf0.001).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from meerkat_spark import get_spark
    from meerkat_spark.operators.sampling import temperature_mix
    from meerkat_spark.text.analysis import gopher_quality_filter
    from meerkat_spark.text.chunk import chunk_by_sentences
    from meerkat_spark.text.classifier import filter_by_score
    from meerkat_spark.text.spandedup import remove_duplicated_spans
    from meerkat_spark.text.urlfilter import filter_blocked_urls

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus_gates", cpus=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. URL blocklist (URLs synthesized here — a real corpus carries them)
    with_url = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://s"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".site"),
            (F.col("doc_id") % 40).cast("string"),
            F.lit(".com/p"),
        ),
    )
    blocklist = spark.createDataFrame(
        [(f"site{i}.com",) for i in range(0, 40, 5)], "domain string"
    )
    gated = filter_blocked_urls(with_url, blocklist, url_col="url").drop("url")
    n1 = gated.count()

    # 2. heuristic quality gate (Gopher rules — pure codegen)
    quality = gopher_quality_filter(gated)
    n2 = quality.count()

    # 3. model-based gate: weights would load from parquet in production
    dim = 1 << 18
    vocab = [("data", 1.0), ("query", 0.5), ("slow", -1.5)]
    fids = {
        tok: spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(tok)), F.lit(dim)).alias("f"))
        .collect()[0].f
        for tok, _ in vocab
    }
    weights = spark.createDataFrame(
        [(fids[t], w) for t, w in vocab], "feature_id long, weight double"
    )
    scored = filter_by_score(quality, weights, threshold=0.4, dim=dim)
    n3 = scored.count()

    # 4. cross-document duplicated-span removal
    despanned = remove_duplicated_spans(scored, window=12, stride=4)
    n_spans = despanned.agg(F.sum("n_dropped_spans")).first()[0]

    # 5. sentence-aware chunks
    chunks = chunk_by_sentences(despanned, max_tokens=128)
    n_chunks = chunks.count()

    # 6. temperature-balanced language mixture over the surviving docs
    langs = [r.lang for r in despanned.select("lang").distinct().collect()]
    mixed = temperature_mix(
        {lg: despanned.filter(F.col("lang") == lg).select("doc_id") for lg in langs},
        alpha=0.3,
    )
    mix_counts = {
        r.mix_source: r["count"]
        for r in mixed.groupBy("mix_source").count().collect()
    }

    print(f"docs: {n0} → url-gated {n1} → quality {n2} → model-gated {n3}")
    print(f"duplicated spans dropped: {n_spans}; sentence chunks: {n_chunks}")
    print(f"temperature-mixed language counts: {mix_counts}")

    # 7. (r8) bigram-LM perplexity gate — the CCNet-style signal,
    # trained in-engine on the surviving docs (two count aggs), then
    # one co-keyed scoring join; keep the lowest-perplexity 80%
    from meerkat_spark.text.lm import perplexity_scores, train_bigram_lm

    model = train_bigram_lm(despanned)
    ppl = perplexity_scores(despanned, *model)
    cut = ppl.approxQuantile("perplexity", [0.8], 0.01)[0]
    from meerkat_spark.text.lm import lm_quality_filter

    lm_gated = lm_quality_filter(despanned, cut, model=model)
    print(f"LM perplexity gate (p80={cut:.1f}): {lm_gated.count()} docs kept")

    # 8. (r8) in-engine classifier TRAINING — no ML library: labels
    # from the quality gate itself, full-batch GD, then the trained
    # gate rescores the corpus (demonstrates the train->score loop)
    from meerkat_spark.text.classifier import score_documents, train_logreg

    labeled = despanned.select(
        "doc_id", "text", (F.col("doc_id") % 2 == 0).cast("double").alias("y")
    )
    w_trained = train_logreg(labeled, n_epochs=3, lr=1.0, bigrams=False)
    print(f"trained weight table: {w_trained.count()} features")

    # 9. (r8) SemDeDup over the embeddings table — cluster-then-compare
    # semantic dedup (exact-dup star routing + bounded clusters)
    from meerkat_spark.similarity.semdedup import semdedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding"
    )
    kept_vecs = semdedup(emb, threshold=0.95).count()
    print(f"semdedup: {emb.count()} vectors → {kept_vecs} kept")


if __name__ == "__main__":
    main()
