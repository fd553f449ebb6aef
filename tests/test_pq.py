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


def test_opq_rotation_is_orthogonal_and_deterministic():
    from meerkat_spark.similarity.pq import opq_rotation

    R1, R2 = opq_rotation(32), opq_rotation(32)
    assert np.array_equal(R1, R2)  # regenerable anywhere, no storage
    assert np.allclose(R1 @ R1.T, np.eye(32), atol=1e-10)
    # different dims -> different (correctly sized) bases
    assert opq_rotation(16).shape == (16, 16)


def test_opq_recovers_recall_on_correlated_dims(spark):
    """OPQ-lite's raison d'etre (VERDICT r10 ask #7): when embedding
    energy concentrates in a few dimensions, plain PQ wastes whole
    codebooks on near-constant subvectors; the fixed rotation spreads
    variance across subspaces and must recover recall@10 at the same
    bitrate. Construction: 4 signal dims (scale 10) + 28 noise dims
    (scale 0.05), m=8 -> unrotated PQ spends 7 of 8 codebooks on
    noise."""
    rng = np.random.default_rng(1234)
    n, dim = 400, 32
    X = np.concatenate(
        [10.0 * rng.standard_normal((n, 4)), 0.05 * rng.standard_normal((n, 28))],
        axis=1,
    )
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") < 16)
    exact = {}
    for r in knn.brute_force_topk(emb, q, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(rotate: bool) -> float:
        books = train_pq(emb, m=8, k=16, rotate=rotate)
        codes = encode_pq(emb, books, rotate=rotate)
        approx = {}
        for r in adc_topk(codes, q, books, k=10, rotate=rotate).collect():
            approx.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(
            len(exact[qid] & approx.get(qid, set())) / 10 for qid in exact
        ) / len(exact)

    r_plain, r_opq = recall(False), recall(True)
    assert r_opq >= r_plain, (r_plain, r_opq)
    # and the rotation should be a real improvement on this geometry,
    # not a tie (guards against the flag silently not being applied)
    assert r_opq >= r_plain + 0.05, (r_plain, r_opq)


def test_ivfpq_rotated_planted_contract(spark, tmp_path):
    """pq_rotate=True through the full persisted IVFPQ lifecycle:
    rotation is deterministic and persisted as a flag (pq_meta), so
    identical vectors still encode identically and the planted
    exact-dup contract holds end-to-end; pq_rotate without pq_m
    raises."""
    import pytest

    from meerkat_spark.similarity.ivf_index import build_ivf_index, ivf_search

    emb = _emb(spark)
    dups = emb.filter(F.col("vec_id") < 10).withColumn(
        "vec_id", F.col("vec_id") + F.lit(100000)
    )
    idx = str(tmp_path / "ivfpq_opq")
    build_ivf_index(emb.unionByName(dups), idx, n_cells=16, pq_m=8, pq_rotate=True)
    q = emb.filter(F.col("vec_id") < 10)
    out = {r.query_id: r for r in ivf_search(spark, idx, q, k=1, n_probe=1).collect()}
    assert len(out) == 10
    for qid, r in out.items():
        assert r.neighbor_id == qid + 100000 and r.sim == 1.0, r

    with pytest.raises(ValueError, match="pq_rotate"):
        build_ivf_index(emb, str(tmp_path / "bad"), pq_rotate=True)
