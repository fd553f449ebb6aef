"""Differential tests: every registered query with an oracle runs on
Spark and DuckDB and must match (the local mirror of the driver's
correctness gate, at sf0.001 for speed — driver re-runs at sf0.01)."""

from __future__ import annotations

import pytest

from meerkat_spark import suite
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, register_views

suite.load_all()
ORACLE_NAMES = sorted(suite.ORACLE)
ALL_NAMES = sorted(suite.QUERIES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, duck, name):
    register_views(duck, SF_ORACLE)
    df = suite.QUERIES[name](spark, SF_ORACLE)
    problems = compare(df, duck, suite.ORACLE[name], name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", [n for n in ALL_NAMES if n not in suite.ORACLE])
def test_rows_only_runs(spark, name):
    """Queries without an oracle still must run and return a stable schema."""
    df = suite.QUERIES[name](spark, SF_ORACLE)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"user_id", "h", "n", "v"}
