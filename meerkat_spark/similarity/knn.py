"""Approximate-nearest-neighbor search over an array<float> embedding
column.

Scale design:
- Brute force: broadcast the (small) query set against the corpus —
  corpus-side scan is embarrassingly parallel, no shuffle; top-k per
  query via window row_number (k small ⇒ TakeOrdered-like state).
  Dot products run as JVM higher-order functions (zip_with+aggregate)
  in double precision — no Python, no Arrow transfer.
- LSH (random hyperplanes): data-independent deterministic planes
  derived from xxhash64(dim, plane) — every executor regenerates the
  same planes with zero driver state / broadcast of plane matrices.
  Buckets = sign-bit codes; probing = exact rerank within the query's
  bucket. At 100TB the corpus is hashed once (one narrow projection)
  and bucket-partitioned, so a query touches 1/2^b of the data.
- IVF-style variant: coarse centroids via deterministic sampling +
  assignment (one broadcast join), rerank within nearest cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _to_double(arr):
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a, b):
    """Σ aᵢbᵢ in double — sequential fold, deterministic order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pandas_udf():
    """Arrow-vectorized cosine over two array columns — the verifier
    kernel for candidate-pair sets (the zip_with/aggregate fold above is
    exact-oracle-parity but interpreted: ~100× slower per pair. Use this
    wherever millions of pairs are scored and last-ulp parity with a SQL
    oracle is not required)."""

    @F.pandas_udf("double")
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = np.stack(va.to_numpy()).astype(np.float64)
        B = np.stack(vb.to_numpy()).astype(np.float64)
        num = (A * B).sum(axis=1)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return cos


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, sim, rank).
    Self-matches excluded. Queries are broadcast (small by contract)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("sim_raw"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id").asc()
    )
    out = sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    sim = F.round(F.col("sim_raw"), round_dp) if round_dp else F.col("sim_raw")
    return out.select("query_id", "neighbor_id", sim.alias("sim"), "rank")


def _hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes seeded from (plane, dim) via a fixed
    64-bit mix — identical on every run/driver, embedded in the plan as
    literals (tiny: n_planes×dim doubles), so executors get them for
    free with the serialized plan."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            # splitmix64-style deterministic mix of (p, d)
            z = (p * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (1 << 64)
            z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
            z = (z ^ (z >> 27)) * 0x94D049BB133111EB % (1 << 64)
            z = z ^ (z >> 31)
            row.append(1.0 if z & 1 else -1.0)
        planes.append(row)
    return planes


def lsh_code(vec, n_planes: int, dim: int):
    """Sign-bit code: bit p = sign(v · plane_p) — zip_with against a
    literal plane array, fully codegen'd, no UDF."""
    planes = _hyperplanes(n_planes, dim)
    code = F.lit(0).cast("long")
    for p in range(n_planes):
        plane_lit = F.array(*[F.lit(v) for v in planes[p]])
        proj = F.aggregate(
            F.zip_with(vec, plane_lit, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        code = code.bitwiseXOR(F.shiftleft(bit, p))
    return code


def brute_force_topk_vectorized(
    corpus: DataFrame,
    queries_pdf,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The 100TB form of brute-force top-k: queries collected to a small
    numpy matrix (driver-side, bounded), scored against the corpus with
    ONE Arrow-batched matrix multiply per partition batch —
    per-partition top-k, then global merge via TakeOrdered.

    `queries_pdf` is a pandas DataFrame [query_id, qv(list)] — small by
    contract. ~100× less per-element overhead than the interpreted
    zip_with/aggregate fold; results may differ from the exact fold in
    the last float ulp (BLAS pairwise summation), hence rows-only.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F811

    qids = queries_pdf["query_id"].to_numpy()
    Q = np.stack(queries_pdf["qv"].to_numpy()).astype(np.float64)  # (nq, d)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = "query_id long, neighbor_id long, sim double"

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            C = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            sims = Cn @ Qn.T  # (nc, nq)
            rows = {"query_id": [], "neighbor_id": [], "sim": []}
            for qi, qid in enumerate(qids):
                col = sims[:, qi]
                mask = ids != qid
                cand_ids, cand_sims = ids[mask], col[mask]
                if len(cand_ids) > k:
                    part = np.argpartition(-cand_sims, k)[:k]
                    cand_ids, cand_sims = cand_ids[part], cand_sims[part]
                rows["query_id"].extend([qid] * len(cand_ids))
                rows["neighbor_id"].extend(cand_ids.tolist())
                rows["sim"].extend(cand_sims.tolist())
            yield pd.DataFrame(rows)

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int | None = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_bits: int = 1,
    target_bucket: int = 10_000,
) -> DataFrame:
    """Approximate top-k: exact rerank restricted to the query's LSH
    bucket plus multi-probe neighbors (all codes within `probe_bits`
    bit flips — near-miss sign bits are the dominant recall loss).
    Probing multiplies only the tiny query side (n_planes+1 codes per
    query at probe_bits=1); the corpus is still hashed once.

    n_planes=None derives the plane count from the corpus count (one
    count() action, index-build cost): the expected bucket n/2^b must
    stay ≤ target_bucket, so the bit count GROWS with the corpus —
    fixed small n_planes at 100TB would mean billion-row buckets."""
    if n_planes is None:
        import math

        n = corpus.count()
        n_planes = max(4, math.ceil(math.log2(max(2.0, n / target_bucket))))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("cv"),
    ).withColumn("code", lsh_code(F.col("cv"), n_planes, dim))
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
    ).withColumn("qcode", lsh_code(F.col("qv"), n_planes, dim))
    if probe_bits >= 1:
        # expand each query code with its 1-bit-flip neighborhood
        flips = F.array(
            F.col("qcode"),
            *[F.col("qcode").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
        )
        q = q.select("query_id", "qv", F.explode(flips).alias("qcode"))
    sims = (
        c.join(F.broadcast(q), F.col("code") == F.col("qcode"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style: deterministic coarse centroids (every n-th vector by
    id — deterministic 'sampling'), assign corpus to nearest cell,
    probe the query's n_probe nearest cells, exact rerank inside.

    At scale: centroid table is tiny (broadcast); corpus assignment is
    one narrow pass; the rerank touches n_probe/n_cells of the data."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv"))
    # Deterministic centroid pick: order the corpus by a 64-bit hash of
    # the id (a fixed pseudo-random permutation) and take the first
    # n_cells. orderBy+limit compiles to TakeOrderedAndProject —
    # per-partition top-n_cells then a tiny driver-side merge — so no
    # partition-less window ever sees O(N) rows. The row_number() below
    # runs AFTER the limit, over exactly n_cells rows.
    cands = c.withColumn("hk", F.xxhash64(F.col("neighbor_id")))
    cents = (
        cands.orderBy("hk").limit(n_cells)
        .withColumn("rn", F.row_number().over(W.orderBy("hk")))
        .select(F.col("rn").alias("cell_id"), F.col("cv").alias("centroid"))
    )
    # assign corpus rows to nearest centroid
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .withColumn("d", dot(F.col("cv"), F.col("centroid")))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("neighbor_id").orderBy(F.col("d").desc(), F.col("cell_id"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select("neighbor_id", "cv", "cell_id")
    )
    q = queries.select(F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv"))
    q_cells = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("d", dot(F.col("qv"), F.col("centroid")))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.col("d").desc(), F.col("cell_id"))
            ),
        )
        .filter(F.col("rk") <= n_probe)
        .select("query_id", "qv", "cell_id")
    )
    sims = (
        assigned.join(F.broadcast(q_cells), "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )
