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
# Round-10 rotation (VERDICT r9 ask #4) — ALL 50 slots are oracle-backed
# (the driver has no rows-only fallback; round 6 burned 5 slots on
# `err: no_oracle` rows).
# (a) round-10 code-change re-grades: ivf_index.py/knn.py changed
# (hierarchical training, empty-super fix, quantized lifecycle), so
# both persisted-IVF names re-grade and the new ivf_quantized_recall
# grades fresh; text/bpe.py changed (local trainer + broadcast
# encode + apply_bpe auto-routing), so both planted BPE names
# re-grade. The translator in()-expression change re-grades through
# where_project in (b).
# (b) the 16 names whose newest green is r5 (scalar_format_fns onward
# per the r9 queue) — after this round no green grade is older than r6.
# (c) the oldest r6-stale names alphabetically (25 of 44 fit; the
# remainder — kql_parse_kv_op onward — rotates in next round;
# never-graded new names outrank stale re-grades, so the four r10
# registrations pq_codes_planted / kql_in_expr_subquery / ivfpq_recall
# / embedding_neardup_incremental take the last four slots).
# Exactly 50 — enforced by tests/test_registry.py.
_PRIORITY: list[str] = [
    # (a) round-10 code-change re-grades + new registrations
    "ivf_persisted_recall",
    "ivf_two_level_recall",
    "ivf_quantized_recall",
    "ivfpq_recall",
    "bpe_merges_planted",
    "bpe_tokenize_planted",
    "pq_codes_planted",
    "kql_in_expr_subquery",
    "embedding_neardup_incremental",
    # (b) r5-stale oracle-backed cohort (all 16)
    "scalar_format_fns",
    "scalar_ipv6_family",
    "scalar_round5_extras",
    "scalar_series_similarity",
    "scalar_string_bytes",
    "sequence_detect_op",
    "series_fit_line_oracle",
    "session_count_op",
    "sliding_window_counts_op",
    "sort_take_asc",
    "text_language_id_oracle",
    "text_quality_score_oracle",
    "tfidf_top_terms",
    "top_orders",
    "vocab_top_tokens",
    "where_project",
    # (c) oldest r6-stale names, alphabetical (first 29)
    "activity_counts_metrics_op",
    "activity_metrics_op",
    "agg_argmax_argmin",
    "agg_binary_all",
    "agg_conditional",
    "agg_dcount",
    "agg_distinct_variants",
    "agg_make_list_if",
    "agg_make_set",
    "agg_percentiles",
    "agg_percentilesw",
    "agg_stats",
    "agg_take_any",
    "diffpatterns_text_op",
    "find_in_tables",
    "geo_polygon_ops",
    "join_fullouter",
    "join_innerunique",
    "join_leftanti",
    "join_leftouter",
    "join_leftsemi",
    "kql_argmax_star",
    "kql_graph_to_table",
    "kql_invoke_tabular",
    "kql_make_series_numeric",
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
