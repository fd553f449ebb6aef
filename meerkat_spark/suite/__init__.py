"""Query suite: one registered query per implemented operator
(SURVEY.md §2), each with a DuckDB oracle-SQL twin where the semantics
are ANSI-SQL-expressible (driver contract in __spark_entry__.py).

Determinism rules every registered query follows (the driver compares
row-count + schema + order-insensitive value hash):
- No unordered LIMIT; every top-k carries a total tiebreak order.
- collect_list/collect_set are sorted before output.
- Double-valued AGGREGATES are rounded (2-6 dp) in BOTH engines, since
  summation order differs across engines/partitionings. Row-level
  arithmetic is left unrounded (same IEEE ops on both sides).
- DuckDB integer-overflow promotions (sum(BIGINT)→HUGEINT) are cast
  back to BIGINT/DOUBLE explicitly in the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame query; oracle=None means
    the op is not SQL-expressible → driver records rows-only check."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every suite module (each registers its queries)."""
    from meerkat_spark.suite import (  # noqa: F401
        tabular,
        aggs,
        scalars,
        windows,
        textops,
        similarity,
        kqlqueries,
        multimodal,
        extras,
        temporal,
    )


# The driver grades a bounded prefix (first 50 names) of the registry.
# Round-4 rotation: r1+r3 windows drove 87 distinct queries green, so
# this window holds (a) the one r3 defect re-grade, (b) every
# oracle-backed query never yet driver-graded, (c) every rows-only
# query never yet driver-graded, (d) re-confirmations for queries whose
# code changed in round 4, (e) flagship representatives. Union target:
# every registered query driver-graded at least once across r1-r4.
_PRIORITY: list[str] = [
    # (a) r3 red row: feature vector now projected to hashable scalars
    "media_features",
    # (b) oracle-backed, never driver-graded through r1-r3
    "agg_round3_variants",
    "scalar_dynamic_json",
    "scalar_arrays",
    "scalar_array_ops",
    "scalar_predicates",
    "scalar_misc",
    "scalar_extract_regex",
    "scalar_datetime_extended",
    "scalar_strings_extended",
    "text_repetition",
    "pack_chunks_op",
    "kql_datatable",
    "kql_top_hitters",
    "kql_narrow",
    "kql_autocluster",
    "make_series_arrays",
    "fork_legs",
    "top_nested_with_others",
    "mix_datasets_op",
    # (c) rows-only, never driver-graded (weaker rows-only record, but
    # each deserves at least one driver artifact row)
    "agg_tdigest",
    "text_quality_lang",
    "lang_id_accuracy",
    "text_compression_ratio",
    "knn_cosine_topk_fast",
    "media_features_vec",
    "media_frame_sample",
    "media_resize",
    "media_metadata_agg",
    "sample_distinct_op",
    "stratified_sample_op",
    "scan_funnel",
    "scan_funnel_latency",
    # (d) code changed in round 4 — re-confirm green
    "range_join_price_bands",
    "asof_join_events",
    "embedding_neardup_pairs",
    "embedding_neardup_lsh",
    "knn_lsh_topk",
    "knn_ivf_topk",
    "knn_cosine_topk",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_decontaminate_pairs",
    "dedup_components",
    # new in round 4: z-order/Kdtree-slot query side + deterministic
    # hash-sampling oracles (their random siblings hold rows-only slots
    # above; agg_pricing_summary / window_session_native /
    # train_holdout_split rotate OUT — each already driver-green in two
    # prior rounds)
    "geo_bbox_distance",
    "sample_hash_op",
    "sample_distinct_hash_op",
    "stratified_sample_hash_op",
    # (e) flagship representatives
    "summarize_bin_1h",
    "kql_flagship",
]


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _PRIORITY if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    load_all()
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    load_all()
    return _ordered(ORACLE)
