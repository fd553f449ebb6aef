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
# Round-15 rotation (VERDICT r14 top_next, arithmetic 7 + 42 + 1 = 50) --
# ALL 50 slots are oracle-backed (the driver has no rows-only fallback).
# (a) the seven r14 registrations queued to lead this window (never
# driver-graded; all judge-verified green at sf0.01 in VERDICT r14).
# (b) the FULL 42-name r10-stale cohort (oldest green grade anywhere in
# the registry -- after this round no oracle-backed grade is older than
# r11, the verdict's done-criterion).
# (c) slot 50: the oldest r11 name (first in registry order): search_term.
# Registered but QUEUED TO LEAD THE r16 WINDOW (the r13 precedent — the
# 50 slots are full; locally oracle-verified at sf0.01 this round):
#   knn_lsh_recall_envelope (VERDICT r14 ask #5 — exact twin + multi-
#                         probe LSH in ONE query, graded as boolean
#                         mean-recall@5 >= 0.9; neighbor lists stay
#                         out of the hash)
#   knn_ivf_recall_envelope (ask #5 — the same envelope over the IVF
#                         cell-probed path)
# Exactly 50 -- enforced by tests/test_registry.py.
_PRIORITY: list[str] = [
    # (a) r14 registrations, never graded -- they lead
    "mg_approx_envelope",
    "heavy_hitters_weighted",
    "weighted_sample_keeper",
    "kql_weighted_sample_stratified",
    "kql_freq_estimate_weighted",
    "hll_distinct_rollup",
    "tdigest_rollup_envelope",
    # (b) the full r10-stale cohort (42 names)
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
    "embedding_neardup_incremental",
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
    # (c) slot 50: oldest r11 name
    "search_term",
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
