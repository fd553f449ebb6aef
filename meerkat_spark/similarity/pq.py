"""Product quantization (PQ) for memory-bounded ANN over embedding
columns (Jegou et al. 2011, "Product Quantization for Nearest Neighbor
Search" — the FAISS `PQx` index family): split the dimension into `m`
subspaces, train `k` centroids per subspace on a bounded deterministic
sample, and store each vector as `m` small codes (one centroid id per
subspace) — dim*4 bytes become m bytes (e.g. 64-dim float32 -> 8 bytes
at m=8, a 32x compression vs the 4x of scalar int8).

Scale design (the same discipline as ivf_index.py / quantize.py):
- training: per-subspace k-means on a hash-ordered bounded sample,
  driver numpy — the codebook is m*k*dsub floats (KB), independent of
  corpus size; the collect is hard-capped like the IVF trainer's.
- encode: ONE row-local mapInPandas pass — per batch, an (n, k) gemm
  per subspace and an argmin; zero shuffle, codes ship as
  array<smallint>.
- search (ADC, asymmetric distance computation): per query build an
  m x k lookup table of subspace inner products (driver numpy, tiny),
  then score stored codes by LUT gather inside mapInPandas — the
  corpus scan reads ONLY the m-byte code column, never the floats.
  Queries stay full-precision (the "asymmetric" in ADC), so ranking
  quality beats symmetric code-vs-code distance at the same bitrate.

Determinism: the training sample is hash-ordered (xxhash64 of the id),
k-means init is every row in order — identical vectors therefore
encode to identical codes (same codebook, same argmin, ties broken by
first index), which is the construction-exact contract the
pq_codes_planted suite oracle pins. The BLAS last-ulp caveat
documented for IVF routing (ivf_index.py build docstring) applies here
too and has the same never-observed status.

Reference anchor: the reference has no vector surface (storage-only
Rust); PQ is LLM-pipeline extension surface beside knn.py/quantize.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from meerkat_spark.localrel import local_df
from meerkat_spark.similarity import knn

# Hard cap on training rows collected to the driver (the knn trainer
# contract): k * train_factor rows at m-independent cost.
MAX_PQ_TRAIN_ROWS = 1 << 18


def pq_train_rows(k: int = 256, train_factor: int = 64) -> int:
    """Rows the PQ trainer samples (hash-ordered TakeOrdered prefix) —
    exposed so build_ivf_index can collect one sample shared with the
    coarse-centroid trainer (r16)."""
    return min(k * train_factor, MAX_PQ_TRAIN_ROWS)

# Hard cap on per-query ADC lookup-table entries (n_queries * m * k
# doubles): the LUT ships in every task closure, so an uncapped query
# batch at the 65k queries_to_pdf bound with m=8/k=256 would serialize
# ~1 GB per task. 2^24 entries = 128 MB — raise and tell the caller to
# split the query batch instead of silently shipping gigabytes.
MAX_ADC_LUT_ENTRIES = 1 << 24


# Fixed seed for the OPQ-lite rotation — one deterministic orthogonal
# basis per dimension, regenerable anywhere (build, search, a later
# session) without storing the matrix, exactly like knn._hyperplanes
# regenerates LSH planes from their index.
OPQ_SEED = 0x9E3779B9


def opq_rotation(dim: int, seed: int = OPQ_SEED) -> np.ndarray:
    """OPQ-lite (Ge et al. 2013 'Optimized Product Quantization'
    reduced to its zeroth iteration, as in FAISS's OPQ pre-transform
    with random init): a FIXED random orthogonal rotation applied
    before the subspace split. When embedding dimensions are
    correlated or energy is concentrated in a few dims, a plain PQ
    split wastes whole codebooks on near-constant subvectors; a random
    rotation spreads variance across subspaces and typically recovers
    several recall points at the same bitrate — without the iterative
    codebook/rotation alternation of full OPQ (which would need
    multiple corpus passes). Deterministic: QR of a seeded Gaussian
    matrix, sign-fixed so the factorization is unique; rotation
    preserves inner products, so ADC scores and the exact-duplicate
    contract are unchanged."""
    rng = np.random.default_rng(seed ^ dim)
    A = rng.standard_normal((dim, dim))
    Q, R = np.linalg.qr(A)
    return Q * np.sign(np.diag(R))


def _guard_lut(n_queries: int, m: int, k_eff: int) -> None:
    entries = n_queries * m * k_eff
    if entries > MAX_ADC_LUT_ENTRIES:
        raise ValueError(
            f"ADC lookup table would hold {entries} entries "
            f"({n_queries} queries x {m} subspaces x {k_eff} centroids) > "
            f"{MAX_ADC_LUT_ENTRIES}; split the query batch — the LUT ships "
            "in every task closure"
        )


def train_pq(
    emb: DataFrame,
    m: int = 8,
    k: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_factor: int = 64,
    n_iter: int = 10,
    rotate: bool = False,
    normalize: bool = False,
    sample_X: "np.ndarray | None" = None,
) -> np.ndarray:
    """Train per-subspace codebooks; returns (m, k_eff, dsub) float64.
    dim must divide by m. k_eff <= k when the sample is smaller than k
    (tiny corpora). L2 k-means per subspace (PQ quantizes raw
    subvectors, not directions — unlike the spherical coarse trainer).
    rotate=True trains on opq_rotation(dim)-rotated vectors (OPQ-lite);
    encode_pq/adc_topk must then be called with the same flag.
    normalize=True L2-normalizes the collected sample rows in numpy
    BEFORE training (the IVFPQ build path, which quantizes directions):
    normalizing driver-side on the bounded sample replaces a JVM
    higher-order `transform(cv, x / norm(cv))` whose per-element lambda
    re-evaluates the whole norm fold — O(dim^2) interpreted work per
    row, corpus-wide under the TakeOrdered sample — with one O(dim)
    vectorized pass over only the sampled rows, and matches the
    encode/search kernels, which already normalize with
    np.linalg.norm.
    sample_X (r16): a pre-collected raw (un-normalized, un-rotated)
    hash-ordered sample matrix — the IVFPQ build path collects ONE
    TakeOrdered sample shared with the coarse-centroid trainer instead
    of two full-corpus sample passes; rows must be the pq_train_rows()
    prefix of the xxhash64(id)-ordered corpus, exactly what the
    in-function collect below produces."""
    if sample_X is not None:
        X = np.asarray(sample_X, dtype=np.float64)
    else:
        train_n = pq_train_rows(k, train_factor)
        sample = (
            emb.select(
                F.col(id_col).alias("pid"), knn._to_double(F.col(vec_col)).alias("pv")
            )
            .withColumn("hk", F.xxhash64(F.col("pid")))
            .orderBy("hk")
            .limit(train_n)
            .select("pv")
            .collect()
        )
        X = np.stack([np.asarray(r.pv, dtype=np.float64) for r in sample])
    if normalize:
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    if rotate:
        X = X @ opq_rotation(X.shape[1])
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    k_eff = min(k, len(X))
    books = np.empty((m, k_eff, dsub))
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[:k_eff].copy()  # hash order ⇒ pseudo-random init
        for _ in range(n_iter):
            # ||s - c||^2 argmin == argmax(2 s.c - ||c||^2)
            assign = (2 * S @ C.T - (C * C).sum(axis=1)).argmax(axis=1)
            # centroid update via ONE stable argsort + a single
            # segmented reduceat over the contiguous runs: the r16
            # per-centroid gather loop still issued m*n_iter*k_eff
            # small fancy-indexed means (~20k numpy calls at k=256 —
            # 1.2s of pure call overhead per build, size-independent
            # because the trainer sample is bounded). reduceat sums
            # each non-empty run in one C pass. Members stay in
            # ascending row order; the summation tree differs from
            # np.mean's pairwise blocking only past 8 elements (last-
            # ulp), run-to-run determinism is untouched, and the
            # planted-copy contracts are codebook-perturbation-proof
            # (identical vectors encode identically under ANY books).
            order = np.argsort(assign, kind="stable")
            bounds = np.searchsorted(assign[order], np.arange(k_eff + 1))
            starts, ends = bounds[:-1], bounds[1:]
            nz = np.flatnonzero(ends > starts)
            if len(nz):
                sums = np.add.reduceat(S[order], starts[nz], axis=0)
                C[nz] = sums / (ends[nz] - starts[nz])[:, None]
        books[j] = C
    return books


def _encode_matrix(
    X: np.ndarray, books: np.ndarray, rot: np.ndarray | None = None
) -> np.ndarray:
    """(n, dim) -> (n, m) int32 codes: per-subspace L2 argmin.
    rot (the OPQ-lite basis) is applied before the subspace split."""
    if rot is not None:
        X = X @ rot
    m, _, dsub = books.shape
    codes = np.empty((len(X), m), dtype=np.int32)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = books[j]
        codes[:, j] = (2 * S @ C.T - (C * C).sum(axis=1)).argmax(axis=1)
    return codes


def encode_pq(
    emb: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotate: bool = False,
) -> DataFrame:
    """(id, codes array<smallint>) — one row-local Arrow pass. The
    codebook (+ OPQ rotation when rotate=True) ships as a broadcast
    variable, not a closure capture — at dim 768 the rotation alone is
    ~4.7 MB, a per-task re-ship as a closure.

    Broadcast lifetime (ADVICE r11): the broadcast must outlive the
    RETURNED lazy DataFrame, so it cannot be destroyed here. It is
    referenced only through the returned plan's closure — once the
    caller drops the DataFrame, Spark's ContextCleaner reclaims the
    blocks; only a retained plan pins them. The persisted-index paths
    (ivf_index.py) own their consuming action and destroy their
    broadcasts eagerly instead."""
    rot = opq_rotation(books.shape[0] * books.shape[2]) if rotate else None
    bc = emb.sparkSession.sparkContext.broadcast((books, rot))

    def enc(batches):
        books_v, rot_v = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = _encode_matrix(X, books_v, rot_v)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes.astype(np.int16))}
            )

    c = emb.select(id_col, knn._to_double(F.col(vec_col)).alias(vec_col))
    return c.mapInPandas(enc, f"{id_col} long, codes array<smallint>")


def adc_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    books: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    rotate: bool = False,
) -> DataFrame:
    """Asymmetric-distance top-k by inner product: (query_id,
    neighbor_id, score, rank). The query matrix is collected bounded
    (knn.queries_to_pdf contract) and turned into per-query m x k
    LUTs; the corpus side reads ONLY (id, codes) and scores each row
    with an m-gather LUT sum — no floats, no shuffle before the final
    per-query top-k. rotate=True applies the OPQ-lite rotation to the
    queries driver-side (rotation preserves inner products, so scores
    rank identically to rotating both sides in float)."""
    q_pdf = knn.queries_to_pdf(queries, id_col, vec_col)
    m, k_eff, dsub = books.shape
    if not len(q_pdf):
        return local_df(
            codes_df.sparkSession,
            [],
            "query_id long, neighbor_id long, score double, rank int",
        )
    Q = np.stack(q_pdf["qv"].to_numpy()).astype(np.float64)
    if rotate:
        Q = Q @ opq_rotation(Q.shape[1])
    qids = q_pdf["query_id"].to_numpy()
    _guard_lut(len(Q), m, k_eff)
    # LUT[q, j, c] = <Q[q] subspace j, centroid c>
    lut = np.empty((len(Q), m, k_eff))
    for j in range(m):
        lut[:, j, :] = Q[:, j * dsub : (j + 1) * dsub] @ books[j].T
    # broadcast, not closure capture: the LUT is up to ~128 MB at the
    # _guard_lut cap (same task-binary discipline as ivf_search's ADC)
    bc = codes_df.sparkSession.sparkContext.broadcast((lut, qids))

    def score(batches):
        lut_v, qids_v = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            rows = {"query_id": [], "neighbor_id": [], "score": []}
            for qi, qid in enumerate(qids_v):
                s = lut_v[qi, np.arange(m), C].sum(axis=1)  # (n,)
                mask = ids != qid
                cand_ids, cand_s = ids[mask], s[mask]
                if len(cand_ids) > k:
                    part = np.argpartition(-cand_s, k)[:k]
                    cand_ids, cand_s = cand_ids[part], cand_s[part]
                rows["query_id"].extend([int(qid)] * len(cand_ids))
                rows["neighbor_id"].extend(cand_ids.tolist())
                rows["score"].extend(cand_s.tolist())
            yield pd.DataFrame(rows)

    scored = codes_df.select(id_col, "codes").mapInPandas(
        score, "query_id long, neighbor_id long, score double"
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("score", round_dp).alias("score"), "rank"
        )
    )


def reconstruct_pq(codes_df: DataFrame, books: np.ndarray) -> DataFrame:
    """(id, recon array<double>) — decode codes back to the centroid
    concatenation (for error measurement / debugging)."""

    def dec(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            parts = [books[j][C[:, j]] for j in range(books.shape[0])]
            R = np.concatenate(parts, axis=1)
            out = pdf.iloc[:, :1].copy()
            out["recon"] = list(R)
            yield out

    first = codes_df.columns[0]
    return codes_df.mapInPandas(dec, f"{first} long, recon array<double>")
