"""Similarity search over embedding columns (driver north star):
brute-force cosine top-k (the exact baseline) and LSH / IVF-style
bucketed approximate search (the scale path)."""

from meerkat_spark.similarity import knn  # noqa: F401
