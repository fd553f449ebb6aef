"""Plan-text inspection over `df.queryExecution().executedPlan()`.

These helpers parse the stable parts of Spark's plan string — the same
signals `.explain("formatted")` surfaces — so tests and tuning scripts
can ASSERT scale properties instead of eyeballing them
(tests/test_plans.py is the consumer)."""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (predicate pushdown)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", executed_plan(df)):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out

def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", executed_plan(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Shuffle + broadcast exchanges in the plan (lower is better; a
    broadcast exchange is cheap, a hashpartitioning exchange is a real
    shuffle)."""
    return executed_plan(df).count("Exchange")


def join_strategies(df: DataFrame) -> dict[str, int]:
    plan = executed_plan(df)
    return {
        "broadcast_hash": plan.count("BroadcastHashJoin"),
        "sort_merge": plan.count("SortMergeJoin"),
        "shuffled_hash": plan.count("ShuffledHashJoin"),
        "broadcast_nested_loop": plan.count("BroadcastNestedLoopJoin"),
    }


@dataclass
class PlanAudit:
    exchanges: int
    pushed_filters: list[str]
    read_columns: list[str]
    joins: dict[str, int]

    def summary(self) -> str:
        return (
            f"exchanges={self.exchanges} "
            f"pushed={len(self.pushed_filters)} "
            f"read_cols={len(self.read_columns)} joins={self.joins}"
        )


def audit(df: DataFrame) -> PlanAudit:
    return PlanAudit(
        exchanges=count_exchanges(df),
        pushed_filters=pushed_filters(df),
        read_columns=read_schema_columns(df),
        joins=join_strategies(df),
    )
