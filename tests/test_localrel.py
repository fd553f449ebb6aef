"""localrel helpers: single-slice local relations and the
single-round-trip SQL IN predicate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meerkat_spark.localrel import local_df, sql_in


def test_local_df_single_partition(spark):
    df = local_df(spark, [(1, "a"), (2, "b")], "id long, s string")
    assert df.rdd.getNumPartitions() == 1
    assert {(r.id, r.s) for r in df.collect()} == {(1, "a"), (2, "b")}


def test_sql_in_matches_isin_ints(spark):
    df = spark.range(0, 100).select(F.col("id"))
    vals = [3, 17, 42, 99]
    got = {r.id for r in df.filter(sql_in("id", vals)).collect()}
    want = {r.id for r in df.filter(F.col("id").isin(vals)).collect()}
    assert got == want == set(vals)


def test_sql_in_matches_isin_strings_with_quotes(spark):
    rows = [("a",), ("o'brien",), ("back\\slash",), ("plain",)]
    df = local_df(spark, rows, "s string")
    vals = ["o'brien", "back\\slash"]
    got = {r.s for r in df.filter(sql_in("s", vals)).collect()}
    want = {r.s for r in df.filter(F.col("s").isin(vals)).collect()}
    assert got == want == set(vals)


def test_sql_in_empty_is_false(spark):
    df = spark.range(0, 5)
    assert df.filter(sql_in("id", [])).count() == 0


def test_sql_in_rejects_bool(spark):
    with pytest.raises(TypeError):
        sql_in("id", [True])


def test_sql_in_same_pushdown_as_isin(spark, tmp_path):
    """The rendered In predicate must reach the Parquet scan exactly
    like Column.isin does (row-group pruning is the point of the
    literal rerank path in ivf_search)."""
    p = str(tmp_path / "t")
    spark.range(0, 1000).write.parquet(p)
    df = spark.read.parquet(p)
    plan = (
        df.filter(sql_in("id", [1, 2, 3]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [In(id, [1,2,3])]" in plan
