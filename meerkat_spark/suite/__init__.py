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
# Round-6 rotation: after r1-r5, 172 distinct queries have driver
# artifacts (171 green/rows-only, 1 red — activity_counts_metrics_op,
# an oracle-side uncast HUGEINT now fixed). This window holds
# (a) every query never graded by the driver (the 23 registered after
# the round-5 window was frozen — restores the "every registered query
# has a driver artifact" invariant), (b) re-grades for round-6 code or
# oracle changes (the fixed activity_counts_metrics oracle; the scan
# family, newly oracle-backed; search_term after the wildcard-anywhere
# fix), (c) refreshes for oracle-backed queries whose newest green
# evidence is round 2 (oldest-first). Exactly 50 entries — enforced by
# tests/test_registry.py. New round-6 queries are appended to section
# (b) as they land, displacing tail (c) refreshes.
_PRIORITY: list[str] = [
    # (a) never driver-graded: registered after the round-5 window
    "agg_percentilesw",
    "scalar_series_elementwise",
    "scalar_ip_ranges",
    "scalar_special_math",
    "scalar_tz_useragent",
    "scalar_unit_convert",
    "scalar_datetime_r5",
    "url_blocklist_filter",
    "diffpatterns_text_op",
    "span_dedup_stats",
    "classifier_quality_gate",
    "sentence_chunking",
    "kql_graph_to_table",
    "kql_parse_kv_op",
    "mv_expand_zip",
    "kql_search_qualified",
    "kql_pred_extensions",
    "kql_argmax_star",
    "media_cdc_dedup",
    "geo_polygon_ops",
    "temperature_mix_op",
    "activity_metrics_op",
    "rollup_incremental",
    # (b) round-6 changes — re-grade
    "activity_counts_metrics_op",
    "scan_funnel",
    "scan_funnel_latency",
    "scan_funnel_time_bound",
    "search_term",
    "kql_parse_kv_regex",
    "scalar_bag_stats_r6",
    "kql_invoke_tabular",
    "new_activity_metrics_op",
    "fuzzy_dedup_pipeline",
    "kql_make_series_numeric",
    # (c) oldest-evidence refreshes (last green in round 2)
    "agg_argmax_argmin",
    "agg_binary_all",
    "agg_conditional",
    "agg_dcount",
    "agg_distinct_variants",
    "agg_make_list_if",
    "agg_make_set",
    "agg_percentiles",
    "agg_stats",
    "agg_take_any",
    "find_in_tables",
    "join_fullouter",
    "join_innerunique",
    "join_leftanti",
    "join_leftouter",
    "join_leftsemi",
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
