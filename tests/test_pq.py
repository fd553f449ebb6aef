"""Product quantization (similarity/pq.py): planted code-equality
contract, ADC ranking sanity vs brute force, reconstruction error
behavior, and the bounded-training determinism the suite oracle
relies on."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from meerkat_spark.similarity import knn
from meerkat_spark.similarity.pq import (
    adc_topk,
    encode_pq,
    reconstruct_pq,
    train_pq,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_identical_vectors_encode_identically(spark):
    """The construction-exact contract behind pq_codes_planted: an
    exact copy of a vector gets byte-identical codes (same codebooks,
    same argmin, first-index ties)."""
    emb = _emb(spark)
    copies = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100_000).cast("long").alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(copies)
    books = train_pq(corpus, m=8, k=64)
    codes = {r.vec_id: list(r.codes) for r in encode_pq(corpus, books).collect()}
    for vid in range(0, 500, 10):
        assert codes[vid] == codes[vid + 100_000], vid


def test_train_is_deterministic_and_bounded(spark):
    emb = _emb(spark)
    b1 = train_pq(emb, m=4, k=32, train_factor=8)
    b2 = train_pq(emb, m=4, k=32, train_factor=8)
    assert b1.shape == (4, 32, 16)
    assert np.array_equal(b1, b2)


def test_adc_ranks_like_brute_force_roughly(spark):
    """ADC is approximate; on this corpus the top-5 by LUT inner
    product must overlap the exact cosine top-5 well above chance
    (500-doc corpus: chance overlap ~1%)."""
    emb = _emb(spark)
    books = train_pq(emb, m=8, k=256)
    codes = encode_pq(emb, books)
    q = emb.filter(F.col("vec_id") < 8)
    approx: dict[int, set] = {}
    for r in adc_topk(codes, q, books, k=5).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    exact: dict[int, set] = {}
    for r in knn.brute_force_topk(emb, q, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(exact[qid] & approx.get(qid, set())) / 5 for qid in exact]
    assert sum(recalls) / len(recalls) >= 0.2, recalls


def test_reconstruction_error_shrinks_with_more_subspaces(spark):
    """More subspaces = finer quantization: mean reconstruction MSE at
    m=16 must beat m=2 (and both must beat the zero-information
    baseline of reconstructing with the global centroid spread)."""
    emb = _emb(spark).limit(200)
    X = np.stack(
        [np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()]
    )

    def mse(m):
        books = train_pq(emb, m=m, k=64)
        rec = {
            r.vec_id: np.asarray(r.recon)
            for r in reconstruct_pq(encode_pq(emb, books), books).collect()
        }
        ids = [r.vec_id for r in emb.select("vec_id").collect()]
        R = np.stack([rec[i] for i in ids])
        Xo = np.stack(
            [
                np.asarray(r.embedding, dtype=np.float64)
                for r in emb.select("vec_id", "embedding").collect()
            ]
        )
        return float(((Xo - R) ** 2).mean())

    e2, e16 = mse(2), mse(16)
    var = float(((X - X.mean(axis=0)) ** 2).mean())
    assert e16 < e2 < var, (e16, e2, var)


def test_adc_self_code_scores_source_at_top(spark):
    """Planted exact duplicates: the copy's ADC score against its
    source equals the score against itself-as-stored (identical codes),
    so the source must appear in the copy's top-5."""
    emb = _emb(spark)
    copies = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100_000).cast("long").alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(copies)
    books = train_pq(corpus, m=8, k=256)
    codes = encode_pq(corpus, books)
    out: dict[int, set] = {}
    for r in adc_topk(codes, copies, books, k=5).collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(1 for qid, s in out.items() if qid - 100_000 in s)
    assert hits >= 0.8 * len(out), (hits, len(out))


def test_adc_lut_guard_raises():
    from meerkat_spark.similarity.pq import _guard_lut

    import pytest

    _guard_lut(1000, 8, 256)  # fine: ~2M entries
    with pytest.raises(ValueError, match="split the query batch"):
        _guard_lut(65_536, 8, 256)
