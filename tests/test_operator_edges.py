"""Focused regression tests for the round-1 ADVICE defects: KQL
nulls-placement modifier, case-sensitive let-bound lambda names,
`in~`/`!in~` tokenization, range-join outer kinds, and as-of join
carry-forward on nullable value columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.engine import MeerkatEngine
from tests.conftest import SF_ORACLE


def _eng_with(spark, name, df):
    eng = MeerkatEngine(spark, SF_ORACLE)
    eng.catalog._cache[name] = df
    return eng


def test_kql_sort_nulls_modifier(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 5.0)], "id long, v double"
    )
    eng = _eng_with(spark, "t", df)
    # explicit override: desc ordinarily puts nulls last
    first = eng.kql("t | sort by v desc nulls first").to_df().collect()
    assert [r.id for r in first] == [2, 1, 3]
    last = eng.kql("t | sort by v desc nulls last").to_df().collect()
    assert [r.id for r in last] == [1, 3, 2]
    # defaults unchanged: asc → nulls first
    asc = eng.kql("t | sort by v asc").to_df().collect()
    assert [r.id for r in asc] == [2, 3, 1]


def test_kql_case_sensitive_let_lambda(spark):
    df = spark.createDataFrame([(1, 4.0)], "id long, v double")
    eng = _eng_with(spark, "t", df)
    out = eng.kql(
        "let DoubleIt = (x: real) { x * 2 }; t | extend w = DoubleIt(v)"
    ).to_df().collect()
    assert out[0].w == 8.0
    # builtins still dispatch case-insensitively after the change
    out2 = eng.kql("t | extend s = SQRT(v)").to_df().collect()
    assert out2[0].s == 2.0


def test_kql_in_ci_operators(spark):
    df = spark.createDataFrame(
        [(1, "Click"), (2, "view"), (3, "PURCHASE")], "id long, et string"
    )
    eng = _eng_with(spark, "t", df)
    ci = eng.kql("t | where et in~ ('click', 'purchase')").to_df().collect()
    assert sorted(r.id for r in ci) == [1, 3]
    nci = eng.kql("t | where et !in~ ('click', 'purchase')").to_df().collect()
    assert [r.id for r in nci] == [2]
    cs = eng.kql("t | where et in ('Click', 'purchase')").to_df().collect()
    assert [r.id for r in cs] == [1]


def test_range_join_outer_kinds(spark):
    from meerkat_spark.operators.rangejoin import range_join

    points = spark.createDataFrame([(1, 5.0), (2, 50.0)], "pid long, x double")
    intervals = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 100.0, 130.0)], "iid long, lo double, hi double"
    )
    inner = range_join(points, intervals, "x", "lo", "hi", 10.0, how="inner")
    assert [(r.pid, r.iid) for r in inner.collect()] == [(1, 10)]

    left = range_join(points, intervals, "x", "lo", "hi", 10.0, how="left")
    got = sorted((r.pid, r.iid) for r in left.collect())
    assert got == [(1, 10), (2, None)]  # unmatched point survives

    right = range_join(points, intervals, "x", "lo", "hi", 10.0, how="right")
    got = sorted(
        ((r.pid if r.pid is not None else -1), r.iid) for r in right.collect()
    )
    # unmatched interval appears EXACTLY once despite spanning 4 buckets
    assert got == [(-1, 20), (1, 10)]

    full = range_join(points, intervals, "x", "lo", "hi", 10.0, how="full")
    got = sorted(
        ((r.pid if r.pid is not None else -1), (r.iid if r.iid is not None else -1))
        for r in full.collect()
    )
    assert got == [(-1, 20), (1, 10), (2, -1)]


def test_sample_distinct_exact_n(spark):
    """sample-distinct returns EXACTLY N distinct values (Kusto exact-N
    semantics), or all values when fewer exist — builder and KQL paths."""
    df = spark.createDataFrame(
        [(i % 40, float(i)) for i in range(400)], "user_id long, v double"
    )
    eng = _eng_with(spark, "t", df)
    out = eng.kql("t | sample-distinct 25 of user_id").to_df().collect()
    vals = [r.user_id for r in out]
    assert len(vals) == 25
    assert len(set(vals)) == 25
    # ask for more than exist → all 40, still distinct
    out_all = eng.kql("t | sample-distinct 100 of user_id").to_df().collect()
    assert sorted(r.user_id for r in out_all) == list(range(40))
    # deterministic under the fixed seed
    again = eng.kql("t | sample-distinct 25 of user_id").to_df().collect()
    assert {r.user_id for r in again} == set(vals)


def test_endofweek_brackets_sunday_week(spark):
    """startofweek/endofweek must bracket the SAME Sunday-based Kusto
    week (endofweek previously used Spark's Monday-truncated week: an
    8-day span for Monday timestamps)."""
    from meerkat_spark.functions import scalar as S

    df = spark.createDataFrame(
        [
            ("2026-08-09 05:00:00",),  # Sunday
            ("2026-08-10 05:00:00",),  # Monday (the old 8-day case)
            ("2026-08-12 23:59:59",),  # Wednesday
            ("2026-08-15 00:00:00",),  # Saturday
        ],
        "s string",
    ).select(F.to_timestamp("s").alias("ts"))
    rows = df.select(
        "ts",
        S.startofweek(F.col("ts")).alias("sow"),
        S.endofweek(F.col("ts")).alias("eow"),
    ).collect()
    for r in rows:
        assert r.sow.weekday() == 6, r  # Sunday
        assert r.sow <= r.ts <= r.eow, r
        span_us = (r.eow - r.sow).total_seconds()
        assert abs(span_us - (7 * 86400 - 1e-6)) < 1e-3, r
        # all four timestamps are in the same week
    assert len({r.sow for r in rows}) == 1
    assert len({r.eow for r in rows}) == 1


def test_range_join_outer_no_spurious_null_row(spark):
    """An interval that spans several buckets and matches a point only
    in a NON-first bucket must not also emit a null-extended row (its
    unmatched first-bucket replica used to slip through the filter)."""
    from meerkat_spark.operators.rangejoin import range_join

    points = spark.createDataFrame([(1, 35.0)], "pid long, x double")
    intervals = spark.createDataFrame(
        [(10, 0.0, 35.0)], "iid long, lo double, hi double"
    )
    for how in ("right", "full"):
        got = sorted(
            ((r.pid if r.pid is not None else -1), r.iid)
            for r in range_join(
                points, intervals, "x", "lo", "hi", 10.0, how=how
            ).collect()
        )
        assert got == [(1, 10)], how

    # mixed: one interval matched in a later bucket, one matched nowhere,
    # one null-bounded — exactly one null-extended row for each unmatched
    intervals2 = spark.createDataFrame(
        [(10, 0.0, 35.0), (20, 100.0, 130.0), (30, None, None)],
        "iid long, lo double, hi double",
    )
    got = sorted(
        ((r.pid if r.pid is not None else -1), r.iid)
        for r in range_join(
            points, intervals2, "x", "lo", "hi", 10.0, how="right"
        ).collect()
    )
    assert got == [(-1, 20), (-1, 30), (1, 10)]


def test_asof_join_null_value_not_resurrected(spark):
    from meerkat_spark.operators.asof import asof_join

    left = spark.createDataFrame([("u", 30)], "user_id string, ts long")
    right = spark.createDataFrame(
        [("u", 10, 5.0, "a"), ("u", 20, None, "b")],
        "user_id string, ts long, v double, s string",
    )
    out = asof_join(left, right, ts_col="ts", by="user_id").collect()
    assert len(out) == 1
    r = out[0]
    # latest right row (ts=20) has v=NULL — must NOT resurrect ts=10's 5.0
    assert r.v_asof is None
    assert r.s_asof == "b"
    assert r.ts_asof == 20
    # all matched values come from the SAME row
    left2 = spark.createDataFrame([("w", 30)], "user_id string, ts long")
    right2 = spark.createDataFrame(
        [("w", 10, 1.0, None), ("w", 20, None, "late")],
        "user_id string, ts long, v double, s string",
    )
    r2 = asof_join(left2, right2, ts_col="ts", by="user_id").collect()[0]
    assert (r2.v_asof, r2.s_asof) == (None, "late")  # not a (1.0,'late') mix


def test_sample_exact_n(spark):
    """sample N returns exactly N rows via TakeOrdered-on-rand (no
    pre-count job, no global sort exchange)."""
    from meerkat_spark.plans import executed_plan

    eng = MeerkatEngine(spark, SF_ORACLE)
    out = eng.table("events").sample(500, seed=7)
    assert out.to_df().count() == 500
    plan = executed_plan(out.to_df())
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    # KQL surface takes a row count too
    kql_out = eng.kql("events | sample 250").to_df()
    assert kql_out.count() == 250
    # fractional mode still available
    frac = eng.table("events").sample(0.1, seed=7).to_df().count()
    assert 0 < frac < 10_000


def test_sampling_operators(spark):
    from meerkat_spark.operators import sampling

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    split = sampling.hash_split(df, "doc_id", train_pct=90, salt="v1")
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert 850 < counts["train"] < 950  # ~90% within binomial noise
    # deterministic: same assignment on recompute
    a = {r.doc_id: r.split for r in split.collect()}
    b = {r.doc_id: r.split for r in sampling.hash_split(df, "doc_id", 90, "v1").collect()}
    assert a == b
    # different salt reshuffles
    c = {r.doc_id: r.split for r in sampling.hash_split(df, "doc_id", 90, "v2").collect()}
    assert a != c

    ev = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(200)], "id long, g string"
    )
    n_per = sampling.exact_n_per_group(ev, "g", 30).groupBy("g").count().collect()
    assert all(r["count"] == 30 for r in n_per)
    frac = sampling.stratified_sample(ev, "g", {"a": 0.5, "b": 0.1}, seed=1)
    got = {r.g: r.n for r in frac.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert got.get("a", 0) > got.get("b", 0)


def test_percentilesw_exact_matches_singles(spark):
    from meerkat_spark.operators.sampling import (
        percentilesw_exact,
        percentilew_exact,
    )

    df = spark.createDataFrame(
        [("a", v, w) for v, w in [(1.0, 1.0), (2.0, 1.0), (3.0, 8.0), (4.0, 1.0)]]
        + [("b", float(v), 1.0) for v in range(1, 11)],
        "g string, v double, w double",
    )
    multi = {
        r.g: (r.p25_weighted, r.p50_weighted, r.p90_weighted)
        for r in percentilesw_exact(df, ["g"], "v", "w", [0.25, 0.5, 0.9]).collect()
    }
    for p, idx in ((0.25, 0), (0.5, 1), (0.9, 2)):
        singles = {
            r.g: r[1] for r in percentilew_exact(df, ["g"], "v", "w", p).collect()
        }
        for g in singles:
            assert multi[g][idx] == singles[g]
    # weight concentration: p25 through p90 all land on the heavy value
    assert multi["a"] == (3.0, 3.0, 3.0)
    # uniform weights reduce to the ordinary lower-bound percentile
    assert multi["b"] == (3.0, 5.0, 9.0)
