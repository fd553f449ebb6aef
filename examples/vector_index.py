"""Vector-index lifecycle over the embeddings corpus: build a persisted
IVF index in each storage variant, search it, and compare recall vs
exact brute force plus on-disk scoring footprint.

  float  — build_ivf_index(...)              cv only (dim x 8 B rows)
  SQ8    — build_ivf_index(quantize=True)    + int8 codes, scoring
           reads only `q` (1 B/dim), float rerank
  IVFPQ  — build_ivf_index(pq_m=8)           + m PQ codes, ADC
           lookup-table scoring reads only `codes` (1 B/subspace),
           float rerank
  +OPQ   — build_ivf_index(pq_m=8,           same bitrate, codes in a
           pq_rotate=True)                   fixed rotated basis that
           spreads correlated-dim energy across subspaces

Every variant keeps the same partitioned-by-cell layout, so probes
prune at the directory level; the variants trade scoring IO for a
two-pass search. Run: python examples/vector_index.py [sf_dir]
(default /root/testdata/sf0.001).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from meerkat_spark.session import get_spark
    from meerkat_spark.similarity import knn
    from meerkat_spark.similarity.ivf_index import build_ivf_index, ivf_search

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("vector_index_example")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 16)

    exact: dict[int, set] = {}
    for r in knn.brute_force_topk(emb, queries, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    variants = {
        "float": {},
        "sq8": {"quantize": True},
        "ivfpq": {"pq_m": 8},
        "ivfpq+opq": {"pq_m": 8, "pq_rotate": True},
    }
    print(f"{'variant':8s} {'build_s':>8s} {'search_s':>9s} {'recall@5':>9s}")
    for name, kwargs in variants.items():
        path = tempfile.mkdtemp(prefix=f"mk_vecidx_{name}_")
        t0 = time.time()
        build_ivf_index(emb, path, **kwargs)
        build_s = time.time() - t0
        t0 = time.time()
        got: dict[int, set] = {}
        for r in ivf_search(spark, path, queries, k=5, n_probe=4).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        search_s = time.time() - t0
        recall = sum(
            len(exact[q] & got.get(q, set())) / 5 for q in exact
        ) / len(exact)
        print(f"{name:8s} {build_s:8.1f} {search_s:9.1f} {recall:9.2f}")


if __name__ == "__main__":
    main()
