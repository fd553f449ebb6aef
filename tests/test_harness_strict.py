"""The local oracle harness must be as strict as the driver's value
hash: an int column on one side vs float on the other ("123" vs
"123.0") is a driver failure even when numerically equal — the exact
class that made activity_counts_metrics_op red in round 5 (DuckDB
promotes an uncast SUM ... OVER to HUGEINT → float64 via .df())."""

from __future__ import annotations

from tests.oracle_harness import compare


def test_uncast_window_sum_flagged(spark, duck):
    sdf = spark.createDataFrame([(1, 1), (2, 3)], "k int, agg bigint")
    # Uncast windowed sum: DuckDB yields HUGEINT -> float64 in pandas.
    bad = "SELECT k, sum(v) OVER (ORDER BY k) AS agg FROM (VALUES (1,1),(2,2)) t(k,v)"
    problems = compare(sdf, duck, bad, "uncast")
    assert any("dtype mismatch" in p for p in problems), problems

    good = ("SELECT k, CAST(sum(v) OVER (ORDER BY k) AS BIGINT) AS agg "
            "FROM (VALUES (1,1),(2,2)) t(k,v)")
    assert compare(sdf, duck, good, "cast") == []


def test_null_int_coercion_not_flagged(spark, duck):
    # int-with-nulls becomes float64 on BOTH sides — legitimate, not flagged.
    sdf = spark.createDataFrame([(1, 5), (2, None)], "k int, v bigint")
    sql = "SELECT * FROM (VALUES (1, 5), (2, NULL)) t(k, v)"
    assert compare(sdf, duck, sql, "nulls") == []
