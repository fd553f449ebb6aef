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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    load_all()
    return dict(ORACLE)
