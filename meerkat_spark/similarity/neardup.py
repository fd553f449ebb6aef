"""Embedding-cosine near-duplicate detection at corpus scale.

Design (sign-LSH banding, MinHash-style OR-amplification):
- Each vector gets `bands` codes of `rows_per_band` sign bits each
  (deterministic hyperplanes — see knn._hyperplanes). Two vectors are
  candidates iff they share ANY band code:
  P(candidate | cos θ) = 1 - (1 - p^r)^B with p = 1 - θ/π.
- Candidates are verified with exact cosine inside (band, code) buckets
  via applyInPandas — only the bucket grouping shuffles; no all-pairs
  join ever forms.

Scale controls (the round-1/2 'weak' findings, fixed here):
- `derive_params(n, threshold, target_bucket)` picks rows_per_band so
  the EXPECTED bucket size n / 2^r stays ≤ target_bucket, then picks
  the band count B that keeps candidate recall ≥ 90% at the verify
  threshold. Higher corpus count ⇒ more sign bits per band ⇒ smaller
  buckets; the band count pays for the lost per-band recall. B is
  capped (the explode duplicates the corpus B×) — at the cap, recall
  at exactly-threshold pairs degrades gracefully while near-1.0
  duplicates (the actual near-dup regime, p → 1) stay found.
- The in-bucket triangular matmul is TILED: peak memory is
  O(bucket·dim + tile²) instead of O(bucket²), so a skewed bucket
  degrades to more tile iterations, not an OOM.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meerkat_spark.similarity import knn

DEFAULT_TARGET_BUCKET = 10_000
MAX_BANDS = 64
TILE = 2_048


def derive_params(
    n: int,
    threshold: float = 0.9,
    target_bucket: int = DEFAULT_TARGET_BUCKET,
    min_recall: float = 0.9,
) -> tuple[int, int]:
    """(bands, rows_per_band) for a corpus of `n` vectors.

    rows_per_band: smallest r with expected bucket n/2^r ≤ target_bucket
    (≥2 so a band is never a single coin flip).
    bands: smallest B with 1-(1-p^r)^B ≥ min_recall at sim=threshold,
    capped at MAX_BANDS (explode amplification bound).
    """
    r = max(2, math.ceil(math.log2(max(2.0, n / target_bucket))))
    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    p_band = p**r
    if p_band >= 1.0:
        return 1, r
    b = math.ceil(math.log(1.0 - min_recall) / math.log(1.0 - p_band))
    return max(4, min(MAX_BANDS, b)), r


def band_codes(vec_col, bands: int, rows_per_band: int, dim: int):
    """Array of `bands` codes, each `rows_per_band` sign bits, from the
    SAME per-band plane offsets as one lsh_code call per band — but
    computed in ONE Arrow kernel pass (r16): the per-band composition
    made each band its own pandas UDF, shipping the vector column to
    Python `bands` times. Codes are bitwise-identical to the composed
    form (shared knn._fold_sign_bits kernel — the exact sequential
    JVM fold; pinned in tests/test_similarity.py). Bands stay separate
    codes, never one wide >63-bit pack (the documented long-shift
    aliasing hazard)."""
    P = np.asarray(
        knn._hyperplanes(bands * rows_per_band, dim), dtype=np.float64
    )
    weights = np.int64(1) << np.arange(rows_per_band, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def codes_udf(vs: pd.Series) -> pd.Series:
        n = len(vs)
        zero = np.zeros(bands, dtype=np.int64)
        out = [zero] * n
        keep, V = knn._stack_fixed_dim(vs, dim)
        if V is not None:
            bits = knn._fold_sign_bits(V, P)  # (m, bands·r)
            codes = (
                bits.reshape(len(V), bands, rows_per_band).astype(np.int64)
                @ weights
            )
            for j, i in enumerate(keep):
                out[i] = codes[j]
        return pd.Series(out)

    return codes_udf(vec_col)


def _band_codes_fn(bands: int, rows_per_band: int, dim: int):
    """mapInPandas kernel: all band codes in ONE Arrow matmul pass —
    (V @ P.T) > 0 then per-band bit packing. Identical codes to the
    expression-path band_codes (same deterministic hyperplanes, asserted
    in tests/test_similarity.py); ~10-100× less per-row overhead than
    bands·rows_per_band interpreted HOF folds, which dominates the
    signature stage once derive_params asks for dozens of bits."""
    import numpy as np
    import pandas as pd

    P = np.array(
        knn._hyperplanes(bands * rows_per_band, dim), dtype=np.float64
    )  # (bands·r, dim)
    weights = 1 << np.arange(rows_per_band, dtype=np.int64)

    def codes(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            bits = (V @ P.T) > 0  # (n, bands·r); plane b·r+p = band b bit p
            c = bits.reshape(n, bands, rows_per_band).astype(np.int64) @ weights
            out = pdf.loc[pdf.index.repeat(bands), ["id", "v"]].copy()
            out["band"] = np.tile(np.arange(bands, dtype=np.int32), n)
            out["code"] = c.reshape(-1)
            yield out

    return codes


def _bucket_pairs_fn(threshold: float, tile: int = TILE):
    """applyInPandas kernel: tiled upper-triangular cosine scoring of one
    (band, code) bucket; emits only pairs ≥ threshold."""
    import numpy as np
    import pandas as pd

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id1": [], "id2": [], "sim": []})
        ids = pdf["id"].to_numpy()
        M = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        out_i1, out_i2, out_s = [], [], []
        for i0 in range(0, n, tile):
            Mi = M[i0 : i0 + tile]
            for j0 in range(i0, n, tile):
                S = Mi @ M[j0 : j0 + tile].T  # ≤ tile×tile
                ii, jj = np.nonzero(S >= threshold)
                gi, gj = ii + i0, jj + j0
                keep = gi < gj  # strict upper triangle globally
                if not keep.any():
                    continue
                gi, gj = gi[keep], gj[keep]
                a, b = ids[gi], ids[gj]
                lo, hi = np.minimum(a, b), np.maximum(a, b)
                out_i1.append(lo)
                out_i2.append(hi)
                out_s.append(np.round(S[ii[keep], jj[keep]], 6))
        if not out_i1:
            return pd.DataFrame({"id1": [], "id2": [], "sim": []})
        return pd.DataFrame(
            {
                "id1": np.concatenate(out_i1),
                "id2": np.concatenate(out_i2),
                "sim": np.concatenate(out_s),
            }
        )

    return bucket_pairs


def neardup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.4,
    bands: int | None = None,
    rows_per_band: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket: int = DEFAULT_TARGET_BUCKET,
    route_exact: bool = True,
) -> DataFrame:
    """(id1, id2, sim) near-duplicate pairs with sim ≥ threshold.
    No false positives (every candidate is exactly verified); recall is
    the LSH S-curve, asserted in tests/test_similarity.py.

    bands/rows_per_band default to corpus-derived values (one count()
    action — one index-build action, not per-query).

    `route_exact` (the same giant-class guard minhash_lsh_pairs grew in
    text/dedup.py): byte-identical vectors — the dominant duplicate
    class in real corpora, where identical docs embed identically —
    are collapsed to one representative (min id) per exact class
    BEFORE banding, and each class contributes STAR pairs
    (rep, member, sim=1.0) instead of all-pairs. A class of c copies
    costs c-1 output rows and ONE bucket slot, not c(c-1)/2 rows and a
    c-wide bucket in every band; connected components reconstructs the
    full class. Pairs between a non-rep member and an outside vector
    are represented transitively through the rep (identical vectors
    have identical similarities to everything). With no exact dups in
    the corpus every class is a singleton and the output is unchanged."""
    if bands is None or rows_per_band is None:
        n = emb.count()
        d_bands, d_rows = derive_params(n, threshold, target_bucket)
        bands = bands if bands is not None else d_bands
        rows_per_band = rows_per_band if rows_per_band is not None else d_rows
    base = emb.select(
        F.col(id_col).alias("id"), knn._to_double(F.col(vec_col)).alias("v")
    )
    # Narrow inputs (one small parquet file → one partition) would run
    # the signature stage single-threaded; widen them once. At scale the
    # source already has ≥ parallelism partitions, so no shuffle is added.
    parallelism = emb.sparkSession.sparkContext.defaultParallelism
    needs_widen = base.rdd.getNumPartitions() < parallelism
    star = None
    if route_exact:
        from pyspark.sql import Window as W

        marked = base.withColumn("__fp", F.xxhash64("v"))
        if needs_widen:
            # one exchange does both jobs: widen AND hash-cluster by the
            # exact-class key, so the window below reuses the layout
            # instead of adding a second corpus-wide shuffle
            marked = marked.repartition(parallelism, "__fp")
        w = W.partitionBy("__fp")
        marked = marked.withColumn("__rep", F.min("id").over(w))
        star = marked.filter(F.col("id") != F.col("__rep")).select(
            F.col("__rep").alias("id1"),
            F.col("id").alias("id2"),
            F.lit(1.0).alias("sim"),
        )
        base = marked.filter(F.col("id") == F.col("__rep")).select("id", "v")
    elif needs_widen:
        base = base.repartition(parallelism)
    banded = base.mapInPandas(
        _band_codes_fn(bands, rows_per_band, dim),
        "id long, v array<double>, band int, code long",
    )
    pairs = banded.groupBy("band", "code").applyInPandas(
        _bucket_pairs_fn(threshold), "id1 long, id2 long, sim double"
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.dropDuplicates(["id1", "id2"])
