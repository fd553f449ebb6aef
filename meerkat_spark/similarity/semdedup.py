"""SemDeDup-style semantic deduplication over an embedding column —
the published cluster-then-compare method (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540): k-means-cluster the corpus so that
ALL-PAIRS cosine comparison only ever happens WITHIN a cluster, then
drop all but one member of every within-cluster similar group.

Spark realization & 100 TB shape (complements the sign-LSH near-dup in
similarity/neardup.py — SemDeDup catches "same meaning, different
bits" pairs a random-hyperplane bucketing can miss at high thresholds):

- exact-dup routing FIRST (the minhash/neardup guard): byte-identical
  embeddings collapse to one representative via a vector-hash window;
  members become linear STAR edges, so a giant duplicate class can
  never flood a cluster with c² pairs (the exact blow-up the ×16
  SCALING replication stress measures).
- cluster count scales as n/target_cluster_size, so per-cluster
  pairwise work is O(target²·dim) CONSTANT per cluster and the total
  is linear in the corpus — unlike search-oriented IVF (sqrt cells),
  dedup wants BOUNDED clusters, not balanced probe cost.
- centroids train on a bounded deterministic sample (driver numpy,
  knn._train_centroids_sample); assignment is one shuffle-free Arrow
  matmul pass; the pairwise stage is ONE applyInPandas over cluster
  groups (numpy X@X.T per cluster, never a DataFrame self-join).
- oversized clusters (degenerate centroids) are SKIPPED with their
  size reported, not expanded — same contract as minhash max_bucket:
  a dropped cluster loses recall, never correctness.
- similar groups may chain across pairs -> connected components
  (operators/components.py, O(diameter) keyed rounds) -> min-id
  keeper, exactly the fuzzy-dedup composition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meerkat_spark.operators.components import connected_components
from meerkat_spark.similarity import knn


def semdedup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    target_cluster: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 5,
    max_cluster: int = 4096,
    n_clusters: int | None = None,
) -> DataFrame:
    """(id1, id2) with id1 < id2 for every detected semantic-duplicate
    pair: byte-identical embeddings as star edges around their min-id
    representative, plus within-cluster pairs with cosine >= threshold
    among representatives."""
    c = emb.select(
        F.col(id_col).alias("id"), knn._to_double(F.col(vec_col)).alias("cv")
    )
    # exact-dup routing: one shuffle keyed on (hash, vector value) —
    # the value is in the key so a 64-bit hash collision between two
    # different vectors can never star-route a non-duplicate (the
    # module contract is "loses recall, never correctness"); the hash
    # prefix keeps comparator work cheap within each bucket
    w = Window.partitionBy("__h", "cv")
    marked = c.withColumn("__h", F.xxhash64("cv")).withColumn(
        "__rep", F.min("id").over(w)
    )
    star = marked.filter(F.col("id") != F.col("__rep")).select(
        F.col("__rep").alias("id1"), F.col("id").alias("id2")
    )
    reps = marked.filter(F.col("id") == F.col("__rep")).select("id", "cv")

    if n_clusters is None:
        n_reps = reps.count()
        n_clusters = max(n_reps // int(target_cluster), 1)
    cents = knn._train_centroids_sample(
        reps.select(F.col("id").alias("neighbor_id"), "cv"), n_clusters, 64, n_iter
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["cv"].to_numpy()).astype(np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            out = pdf[["id", "cv"]].copy()
            out["cell_id"] = (Xn @ cents.T).argmax(axis=1).astype("int64")
            yield out

    assigned = reps.mapInPandas(assign, "id long, cv array<double>, cell_id long")

    thr = float(threshold)
    cap = int(max_cluster)

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2 or n > cap:
            # oversized cluster: skip expansion (bounded-work contract)
            return pd.DataFrame({"id1": pd.Series(dtype="int64"),
                                 "id2": pd.Series(dtype="int64")})
        ids = pdf["id"].to_numpy()
        X = np.stack(pdf["cv"].to_numpy()).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        S = Xn @ Xn.T
        iu, ju = np.triu_indices(n, k=1)
        hit = S[iu, ju] >= thr
        a, b = ids[iu[hit]], ids[ju[hit]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id1": lo.astype("int64"), "id2": hi.astype("int64")})

    sim = assigned.groupBy("cell_id").applyInPandas(
        cell_pairs, "id1 long, id2 long"
    )
    return star.unionByName(sim)


def semdedup(
    emb: DataFrame,
    threshold: float = 0.9,
    target_cluster: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kwargs,
) -> DataFrame:
    """Surviving rows of `emb` after semantic dedup: connected
    components over the pair graph, min-id keeper per component, one
    co-keyed anti-join back. Non-duplicated rows pass through."""
    pairs = semdedup_pairs(
        emb, threshold, target_cluster, id_col, vec_col, **kwargs
    )
    comp = connected_components(pairs, "id1", "id2")  # (id, component)
    drop = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return emb.join(drop, id_col, "left_anti")
