"""Physical-plan inspection helpers (the engine's scale-audit toolkit):
programmatic access to the properties SURVEY.md §4 says must ride
Catalyst — pushdown, pruning, join strategy, shuffle count."""

from meerkat_spark.plans.inspect import (
    executed_plan,
    pushed_filters,
    read_schema_columns,
    count_exchanges,
    join_strategies,
    audit,
)

__all__ = [
    "executed_plan",
    "pushed_filters",
    "read_schema_columns",
    "count_exchanges",
    "join_strategies",
    "audit",
]
