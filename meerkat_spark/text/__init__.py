"""Text-analysis and deduplication operators for large-scale training-data
pipelines (SURVEY.md §7.1 M6 / driver north star): language ID, quality
scoring, token counting, fingerprinting, exact + near-duplicate
detection (MinHash-LSH, SimHash, n-gram Jaccard)."""

from meerkat_spark.text import analysis, dedup  # noqa: F401
