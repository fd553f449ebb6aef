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
        sketches,
    )


# The driver grades a bounded prefix (first 50 names) of the registry.
# Round-14 rotation (VERDICT r13 ask #1, matching the verdict's own
# arithmetic: 2 + 2 + 46 = 50) — ALL 50 slots are oracle-backed (the
# driver has no rows-only fallback; round 6 burned 5 slots on
# `err: no_oracle` rows).
# (a) the two r13 registrations that were queued to lead this window
# (never driver-graded): weighted_sample_op, url_dedup_canonical.
# (b) the two promoted sketch KQL plugins (VERDICT r13 ask #2):
# evaluate frequency_estimate / weighted_sample — previously pytest-
# equivalence-pinned only, now oracle-backed window slots.
# (c) the FULL 46-name r9-stale cohort (oldest green grade anywhere
# in the registry — after this round no oracle-backed grade is older
# than r10, the verdict's done-criterion).
# Registered but QUEUED TO LEAD THE r15 WINDOW (the r13 precedent —
# all locally oracle-verified via scripts/check_oracle_sf001.py and
# pytest-pinned this round; the 50 slots are full):
#   mg_approx_envelope   (VERDICT r13 ask #3 — approximate-regime MG
#                         guarantee as the graded contract)
#   heavy_hitters_weighted (ask #8 — `top-hitters N of C by sum(W)`
#                         sketch form through the KQL plugin)
#   weighted_sample_keeper (r14 — the mergeable weighted-reservoir
#                         fold behind start_weighted_sample_stream)
#   kql_weighted_sample_stratified (r14 — 5-arg plugin form: exact-N
#                         per stratum via the keyed window)
#   kql_freq_estimate_weighted (r14 — 5-arg plugin form: weighted
#                         Count-Min, cells sum WeightCol)
#   hll_distinct_rollup (r14 — mergeable HLL distinct counts, the
#                         engine behind start_hll_distinct_stream)
#   tdigest_rollup_envelope (r14 — t-digest merge lifecycle under the
#                         percentile envelope contract)
# Exactly 50 — enforced by tests/test_registry.py.
_PRIORITY: list[str] = [
    # (a) r13 registrations, never graded — they lead
    "weighted_sample_op",
    "url_dedup_canonical",
    # (b) promoted sketch KQL plugins
    "kql_evaluate_frequency_estimate",
    "kql_evaluate_weighted_sample",
    # (c) the full r9-stale cohort (46 names)
    "extend_compute",
    "project_away_rename",
    "project_keep_wildcard",
    "summarize_bin_1h",
    "summarize_multiassign",
    "count_op",
    "distinct_op",
    "join_inner_agg",
    "range_join_price_bands",
    "agg_percentilew",
    "scalar_dynamic_json",
    "scalar_arrays",
    "scalar_array_ops",
    "scalar_predicates",
    "scalar_misc",
    "scalar_extract_regex",
    "scalar_datetime_extended",
    "scalar_strings_extended",
    "text_decontaminate_pairs",
    "text_repetition",
    "pack_chunks_op",
    "gopher_quality_filter",
    "dedup_incremental_index",
    "dsir_importance_score",
    "embedding_quantize_int8",
    "semdedup_planted",
    "kql_reduce_by",
    "kql_basket",
    "kql_diffpatterns",
    "kql_externaldata",
    "kql_union_withsource",
    "kql_graph_match",
    "kql_graph_shortest_paths",
    "top_nested_with_others",
    "sample_hash_op",
    "sample_distinct_hash_op",
    "stratified_sample_hash_op",
    "ipv4_lookup_op",
    "geohash_roundtrip",
    "rows_near_errors",
    "rolling_percentile_op",
    "retention_matrix_op",
    "active_users_count_op",
    "funnel_sequence_op",
    "activity_engagement_op",
    "funnel_completion_op",
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
