"""End-to-end training-pipeline composition: planted near-dups vanish,
benchmark-contaminated docs are removed, all train chunks pack."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/examples")

from pyspark.sql import functions as F


def test_build_training_set_composition(spark):
    from training_pipeline import build_training_set

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [
        (100, base),                                   # kept
        (101, base + " extraword"),                    # near-dup of 100
        (102, "totally different text about training pipelines at scale with many unique tokens here"),
        (103, "bench one two three four five six seven eight nine ten eleven twelve"),  # contaminated
        (104, "spark rows columns agg join filter window sort take distinct union parse"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(1, "bench one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    stages = build_training_set(docs, bench, holdout_pct=0, chunk_tokens=8, overlap=2)
    near = {r.doc_id for r in stages["near_deduped"].collect()}
    assert 100 in near and 101 not in near          # near-dup clustered out
    dec = {r.doc_id for r in stages["decontaminated"].collect()}
    assert 103 not in dec and 102 in dec            # contamination removed
    packed = stages["packed"].collect()
    assert {r.doc_id for r in packed} == dec        # every survivor chunked
    assert all(r.pack_id >= 0 and r.n_chunk_tokens <= 8 for r in packed)
