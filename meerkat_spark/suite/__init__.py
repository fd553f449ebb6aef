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
    """Register a (spark, sf_dir) -> DataFrame query. oracle=None means
    the op is not SQL-expressible; the DRIVER HAS NO ROWS-ONLY
    FALLBACK — a windowed oracle-less query burns its slot with
    `err: no_oracle` (CORRECTNESS_r06), so only oracle-backed names
    belong in _PRIORITY; oracle-less ops are pinned by pytest."""

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
# Round-9 rotation (VERDICT r8 ask #1) — ALL 50 slots are oracle-backed
# (the driver has no rows-only fallback; round 6 burned 5 slots on
# `err: no_oracle` rows).
# (a) round-9 code-change re-grades (fixes preempt staleness): the
# ADVICE fixes touched semdedup star routing (hash-collision byte
# verify) and summarize multi-assign column splicing; the scalar
# pack/bag_zip/computed-index fixes land in the r4-stale scalar_*
# names already in (b); the r9 two-level IVF change touches
# ivf_index.py, so ivf_persisted_recall re-grades and the new
# ivf_two_level_recall + dsir_importance_score + the two planted BPE
# queries grade fresh.
# (b) the 17 r4-stale oracle-backed names — after this round no green
# grade is older than r5.
# (c) the oldest r5-stale names alphabetically (26 of 42 fit; the
# remainder — scalar_format_fns onward — rotates in next round).
# Exactly 50 — enforced by tests/test_registry.py.
_PRIORITY: list[str] = [
    # (a) round-9 code-change re-grades
    "semdedup_planted",
    "summarize_multiassign",
    "ivf_persisted_recall",
    "ivf_two_level_recall",
    "dsir_importance_score",
    "bpe_merges_planted",
    "bpe_tokenize_planted",
    # (b) r4-stale oracle-backed cohort (all 17)
    "pack_chunks_op",
    "range_join_price_bands",
    "sample_distinct_hash_op",
    "sample_hash_op",
    "scalar_array_ops",
    "scalar_arrays",
    "scalar_datetime_extended",
    "scalar_dynamic_json",
    "scalar_extract_regex",
    "scalar_misc",
    "scalar_predicates",
    "scalar_strings_extended",
    "stratified_sample_hash_op",
    "summarize_bin_1h",
    "text_decontaminate_pairs",
    "text_repetition",
    "top_nested_with_others",
    # (c) oldest r5-stale names, alphabetical (first 26)
    "active_users_count_op",
    "activity_engagement_op",
    "agg_percentilew",
    "count_op",
    "dedup_incremental_index",
    "distinct_op",
    "embedding_quantize_int8",
    "extend_compute",
    "funnel_completion_op",
    "funnel_sequence_op",
    "geohash_roundtrip",
    "gopher_quality_filter",
    "ipv4_lookup_op",
    "join_inner_agg",
    "kql_basket",
    "kql_diffpatterns",
    "kql_externaldata",
    "kql_graph_match",
    "kql_graph_shortest_paths",
    "kql_reduce_by",
    "kql_union_withsource",
    "project_away_rename",
    "project_keep_wildcard",
    "retention_matrix_op",
    "rolling_percentile_op",
    "rows_near_errors",
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
