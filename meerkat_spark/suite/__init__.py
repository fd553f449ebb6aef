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
# Round-11 rotation (VERDICT r10 ask #5) — ALL 50 slots are oracle-backed
# (the driver has no rows-only fallback; round 6 burned 5 slots on
# `err: no_oracle` rows).
# (a) round-11 code-change re-grades + new registration:
# ivf_index.py/knn.py changed (rerank isin size gate, broadcast
# matrices, trainer clamp, OPQ plumbing) -> all four persisted-IVF
# names re-grade; pq.py changed (OPQ, broadcast LUT) ->
# pq_codes_planted; text/bpe.py changed (unicode tokenization parity,
# min_word_freq on the engine path) -> both planted BPE names; the
# translator in() localCheckpoint change -> kql_in_expr_subquery; the
# two new keeper-lifecycle queries and the new ivf_extend_recall
# grade fresh.
# (b) the 19 names whose newest green is r6 (kql_parse_kv_op onward —
# after this round no green grade is older than r7).
# (c) the oldest r7-stale names alphabetically (18 of 47 fit; the
# remainder — join_rightanti, join_rightouter, join_rightsemi,
# lang_id_accuracy — rotates in next round).
# Exactly 50 — enforced by tests/test_registry.py.
_PRIORITY: list[str] = [
    # (a) round-11 code-change re-grades + new registrations
    "embedding_neardup_lifecycle",
    "minhash_keeper_lifecycle",
    "ivf_extend_recall",
    "fuzzy_dedup_best_quality",
    "select_token_budget_op",
    "ivf_persisted_recall",
    "ivf_two_level_recall",
    "ivf_quantized_recall",
    "ivfpq_recall",
    "pq_codes_planted",
    "bpe_merges_planted",
    "bpe_tokenize_planted",
    "kql_in_expr_subquery",
    # (b) r6-stale oracle-backed cohort (all 19)
    "kql_parse_kv_op",
    "kql_parse_kv_regex",
    "kql_pred_extensions",
    "kql_search_qualified",
    "mv_expand_zip",
    "new_activity_metrics_op",
    "rollup_incremental",
    "scalar_bag_stats_r6",
    "scalar_datetime_r5",
    "scalar_series_elementwise",
    "scalar_special_math",
    "scalar_tz_useragent",
    "scalar_unit_convert",
    "scan_funnel",
    "scan_funnel_latency",
    "scan_funnel_time_bound",
    "search_term",
    "temperature_mix_op",
    "url_blocklist_filter",
    # (c) oldest r7-stale names, alphabetical (first 22)
    "agg_conditional_r7",
    "agg_dcount_approx",
    "agg_dcount_intersect",
    "agg_hll_sketch",
    "agg_make_bag",
    "agg_percentiles_array",
    "agg_pricing_summary",
    "agg_tdigest",
    "argmin_distance",
    "bag_unpack",
    "chunk_documents_op",
    "dedup_events_by_key",
    "dedup_exact_groups",
    "dedup_exact_keep",
    "fuzzy_dedup_planted",
    "geo_s2cell_ops",
    "knn_cosine_topk_fast",
    "knn_recall_gate",
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
