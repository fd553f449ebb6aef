"""End-to-end LLM training-data pipeline over the documents corpus:

  raw docs
    → PII redaction               (text/pii.py, regexp codegen)
    → quality + repetition filter (text/analysis.py, row-local folds)
    → exact dedup                 (text/dedup.py, fingerprint groupBy)
    → near-dup clustering         (MinHash-LSH pairs → connected
                                   components → canonical keep)
    → benchmark decontamination   (text/decontaminate.py, k-gram join)
    → train/holdout split         (operators/sampling.py, hash bucket)
    → chunk + pack                (text/chunk.py, 512-token windows
                                   packed into 4096-token sequences)

Every stage is the operator the suite registers individually; this
script shows them composed. Run: python examples/training_pipeline.py
[sf_dir] (default /root/testdata/sf0.001).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_training_set(
    docs: DataFrame,
    benchmark: DataFrame,
    holdout_pct: int = 10,
    chunk_tokens: int = 512,
    overlap: int = 64,
    pack_budget: int = 4096,
) -> dict[str, DataFrame]:
    """Compose the pipeline; returns each stage's DataFrame keyed by
    stage name (lazily defined — materialize what you need)."""
    from meerkat_spark.operators.components import dedup_assign_canonical
    from meerkat_spark.operators.sampling import hash_split
    from meerkat_spark.text import pii
    from meerkat_spark.text.analysis import repetition_filter
    from meerkat_spark.text.chunk import chunk_documents, pack_chunks
    from meerkat_spark.text.decontaminate import contamination_pairs
    from meerkat_spark.text.dedup import dedup_exact, minhash_lsh_pairs

    stages: dict[str, DataFrame] = {}
    stages["redacted"] = pii.redact(docs)
    stages["filtered"] = repetition_filter(stages["redacted"])
    stages["exact_deduped"] = dedup_exact(stages["filtered"])
    pairs = minhash_lsh_pairs(stages["exact_deduped"]).select("id1", "id2")
    with_canonical = dedup_assign_canonical(stages["exact_deduped"], pairs)
    stages["near_deduped"] = with_canonical.filter(
        F.col("doc_id") == F.col("canonical_id")
    ).drop("canonical_id")
    contaminated = contamination_pairs(
        stages["near_deduped"], benchmark, k=3, min_shared=5
    ).select(F.col("corpus_id").alias("doc_id")).distinct()
    stages["decontaminated"] = stages["near_deduped"].join(
        contaminated, "doc_id", "left_anti"
    )
    split = hash_split(
        stages["decontaminated"], "doc_id", train_pct=100 - holdout_pct
    )
    stages["train"] = split.filter(F.col("split") == "train").drop("split")
    stages["holdout"] = split.filter(F.col("split") == "holdout").drop("split")
    chunks = chunk_documents(
        stages["train"], chunk_tokens=chunk_tokens, overlap=overlap
    )
    stages["packed"] = pack_chunks(chunks.drop("chunk_text"), budget=pack_budget)
    return stages


def main() -> None:
    from meerkat_spark import MeerkatEngine, get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training_pipeline")
    docs = MeerkatEngine(spark, sf_dir).table("documents").to_df().select(
        "doc_id", "text"
    )
    # treat the first 20 docs as the "benchmark" to decontaminate against
    benchmark = docs.filter(F.col("doc_id") < 20)
    corpus = docs.filter(F.col("doc_id") >= 20)
    stages = build_training_set(corpus, benchmark)
    for name in (
        "redacted",
        "filtered",
        "exact_deduped",
        "near_deduped",
        "decontaminated",
        "train",
        "holdout",
        "packed",
    ):
        print(f"{name:16s} {stages[name].count():>8d} rows", flush=True)


if __name__ == "__main__":
    main()
