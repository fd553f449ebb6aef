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
# Round-12 rotation (VERDICT r11 ask #2) — ALL 50 slots are oracle-backed
# (the driver has no rows-only fallback; round 6 burned 5 slots on
# `err: no_oracle` rows).
# (a) round-12 new registrations: the three KQL `evaluate` plugin
# queries (fuzzy_dedup / select_token_budget / knn through the KQL
# front-end) grade fresh.
# (b) round-12 code-change re-grades: the keeper-lifecycle pair
# (replay-idempotence anti-join in ingest_neardup_batch /
# ingest_minhash_batch); select_token_budget_op (histogram-cut
# routing added); all five persisted-IVF names (broadcast destroy,
# one-collect codebooks, compact swap naming, ivf_index_stats);
# kql_in_expr_subquery (in() literal path no longer checkpoints);
# agg_pricing_summary (r11's worst normalized ratio, 1.20x —
# adjudication re-grade, VERDICT ask #7).
# (c) the FULL 29-name r7-stale cohort (oldest green grade anywhere in
# the registry — after this round no oracle-backed grade is older
# than r8).
# (d) fill to 50 with the oldest r8-stale names, alphabetical.
# Exactly 50 — enforced by tests/test_registry.py.
_PRIORITY: list[str] = [
    # (a) new registrations
    "kql_evaluate_fuzzy_dedup",
    "kql_evaluate_token_budget",
    "kql_evaluate_knn",
    # (b) code-change re-grades
    "embedding_neardup_lifecycle",
    "minhash_keeper_lifecycle",
    "select_token_budget_op",
    "ivf_persisted_recall",
    "ivf_two_level_recall",
    "ivf_quantized_recall",
    "ivfpq_recall",
    "ivf_extend_recall",
    "kql_in_expr_subquery",
    "agg_pricing_summary",
    # (c) the full r7-stale cohort (29 names)
    "join_rightanti",
    "join_rightouter",
    "join_rightsemi",
    "lang_id_accuracy",
    "lookup_dim_chain",
    "media_metadata_agg",
    "mv_expand_indexed",
    "mv_expand_words",
    "parse_pattern",
    "partition_window_funcs",
    "print_scalars",
    "range_table",
    "scalar_conditional",
    "scalar_datetime",
    "scalar_ip_ranges",
    "scalar_r7_gap",
    "scalar_string_funcs2",
    "sentence_chunking_packed",
    "span_dedup_exact",
    "stratified_sample_op",
    "training_pipeline_end_to_end",
    "union_inner_mismatched",
    "union_outer",
    "window_cumsum",
    "window_prev_next",
    "window_rank",
    "window_row_number",
    "window_session",
    "window_session_greedy",
    # (d) oldest r8-stale names, alphabetical (first 8 of 47)
    "agg_round3_variants",
    "asof_join_events",
    "cdc_dedup_planted",
    "classifier_gate_exact",
    "classifier_train_gate",
    "dedup_components",
    "embedding_neardup_pairs",
    "fork_legs",
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
