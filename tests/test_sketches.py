"""Frequency sketches (operators/sketches.py): Misra-Gries and
Count-Min guarantees, exact-degradation regimes, determinism, and the
bounded-shuffle plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meerkat_spark.operators.sketches import (
    count_min_build,
    count_min_estimate,
    heavy_hitters,
    load_count_min,
    merge_count_min,
    merge_mg_summaries,
    misra_gries_summary,
    save_count_min,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """Zipf-ish corpus: key k{i} appears ~1000/i times, i in 1..199,
    spread over 8 partitions; plus a weight column."""
    rows = [
        (f"k{i}", float(i % 7 + 1))
        for i in range(1, 200)
        for _ in range(1000 // i)
    ]
    return (
        spark.createDataFrame(rows, "key string, w double")
        .repartition(8)
        .cache()
    )


@pytest.fixture(scope="module")
def exact_counts(skewed):
    return {
        r["key"]: r["c"]
        for r in skewed.groupBy("key").agg(F.count(F.lit(1)).alias("c")).collect()
    }


class TestMisraGries:
    def test_bounds_and_presence_guarantee(self, skewed, exact_counts):
        """est <= true <= est + err for every emitted key; every key
        with true count > err is present (the classic MG guarantee,
        surviving the partition merge)."""
        s = misra_gries_summary(skewed, "key", capacity=20).collect()
        assert s, "summary must not be empty"
        err = s[0]["count_error_max"]
        n = sum(exact_counts.values())
        # merged error is bounded by N/(capacity+1)
        assert 0 < err <= n / 21
        emitted = {}
        for r in s:
            t = exact_counts[r["key"]]
            assert r["est_count"] <= t <= r["est_count"] + err, r
            emitted[r["key"]] = r["est_count"]
        missing = [k for k, v in exact_counts.items() if v > err and k not in emitted]
        assert not missing, f"guaranteed-present keys missing: {missing}"

    def test_exact_when_capacity_covers_distinct(self, skewed, exact_counts):
        hh = heavy_hitters(skewed, "key", k=10, capacity=4096).collect()
        assert len(hh) == 10
        for r in hh:
            assert r["count_error_max"] == 0
            assert r["approximate_count"] == exact_counts[r["key"]]
        # ranked by true count desc, key asc
        top = sorted(
            exact_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[:10]
        assert [r["key"] for r in hh] == [k for k, _ in top]

    def test_weighted(self, skewed):
        exact_w = {
            r["key"]: r["s"]
            for r in skewed.groupBy("key").agg(F.sum("w").alias("s")).collect()
        }
        s = misra_gries_summary(
            skewed, "key", capacity=25, weight_col="w"
        ).collect()
        err = s[0]["count_error_max"]
        for r in s:
            t = exact_w[r["key"]]
            assert r["est_count"] <= t + 1e-9
            assert t <= r["est_count"] + err + 1e-9

    def test_deterministic(self, skewed):
        a = sorted(map(tuple, heavy_hitters(skewed, "key", 15, 20).collect()))
        b = sorted(map(tuple, heavy_hitters(skewed, "key", 15, 20).collect()))
        assert a == b

    def test_null_keys_excluded(self, spark):
        df = spark.createDataFrame(
            [("a",), (None,), ("a",), (None,), ("b",)], "key string"
        )
        s = {r["key"]: r["est_count"]
             for r in misra_gries_summary(df, "key", 10).collect()}
        assert s == {"a": 2, "b": 1}

    def test_integer_keys_exact(self, spark):
        """Int keys must not round-trip through float64 (the None
        sentinel coercion hazard) — large ids stay exact."""
        big = 2**60 + 1
        df = spark.createDataFrame(
            [(big,), (big,), (big + 2,)], "key long"
        )
        hh = heavy_hitters(df, "key", k=2, capacity=10).collect()
        assert [(r["key"], r["approximate_count"]) for r in hh] == [
            (big, 2),
            (big + 2, 1),
        ]

    def test_capacity_validation(self, skewed):
        with pytest.raises(ValueError):
            misra_gries_summary(skewed, "key", capacity=0)


class TestCountMin:
    def test_never_underestimates(self, skewed, exact_counts):
        """Adversarially small width (32 cells for 199 keys): heavy
        collisions everywhere, yet min-over-depth never drops below
        the true count."""
        cm = count_min_build(skewed, "key", depth=4, width=32, seed=3)
        est = count_min_estimate(
            cm, skewed, "key", depth=4, width=32, seed=3
        ).collect()
        assert len(est) == len(exact_counts)
        for r in est:
            assert r["approximate_count"] >= exact_counts[r["key"]], r

    def test_exact_at_ample_width(self, skewed, exact_counts):
        cm = count_min_build(skewed, "key", depth=4, width=65536, seed=0)
        est = count_min_estimate(
            cm, skewed, "key", depth=4, width=65536, seed=0
        ).collect()
        for r in est:
            assert r["approximate_count"] == exact_counts[r["key"]], r

    def test_sketch_is_bounded(self, skewed):
        cm = count_min_build(skewed, "key", depth=4, width=64, seed=0)
        assert cm.count() <= 4 * 64

    def test_weighted(self, skewed):
        exact_w = {
            r["key"]: r["s"]
            for r in skewed.groupBy("key").agg(F.sum("w").alias("s")).collect()
        }
        cm = count_min_build(
            skewed, "key", depth=4, width=65536, seed=1, weight_col="w"
        )
        est = count_min_estimate(
            cm, skewed, "key", depth=4, width=65536, seed=1
        ).collect()
        for r in est:
            assert r["approximate_count"] == pytest.approx(exact_w[r["key"]])

    def test_unseen_key_estimates_zero_or_noise(self, spark, skewed):
        """A key absent from the corpus gets only collision mass — at
        ample width that is exactly 0 (missing cells coalesce to 0)."""
        cm = count_min_build(skewed, "key", depth=4, width=65536, seed=0)
        probe = spark.createDataFrame([("never-seen",)], "key string")
        est = count_min_estimate(
            cm, probe, "key", depth=4, width=65536, seed=0
        ).collect()
        assert est[0]["approximate_count"] == 0

    def test_build_plan_has_partial_aggregation(self, skewed):
        """The bounded-shuffle claim: the (d, b) aggregation must have
        a map-side partial before the exchange, so each partition ships
        <= depth x width rows."""
        cm = count_min_build(skewed, "key", depth=4, width=64, seed=0)
        plan = cm._jdf.queryExecution().executedPlan().toString()
        assert plan.count("HashAggregate") >= 2, plan


class TestMerge:
    """Mergeable-summary guarantees: daily/sliced sketches roll up
    without losing their bounds (MG: Agarwal et al. PODS'12 merge;
    CM: cell-wise summation by linearity)."""

    def _slices(self, skewed, n=3):
        return [
            skewed.filter(F.abs(F.xxhash64("key", F.lit(9))) % n == i)
            for i in range(n)
        ]

    def test_mg_merge_exact_regime(self, skewed, exact_counts):
        summaries = [
            misra_gries_summary(s, "key", capacity=4096)
            for s in self._slices(skewed)
        ]
        merged = merge_mg_summaries(summaries, "key", capacity=4096)
        got = {r["key"]: (r["est_count"], r["count_error_max"])
               for r in merged.collect()}
        assert got == {k: (v, 0) for k, v in exact_counts.items()}

    def test_mg_merge_bounds_with_re_eviction(self, skewed, exact_counts):
        """Small per-slice capacity AND a smaller merge capacity: the
        theta re-eviction fires, bounds still hold, heavy keys still
        guaranteed present."""
        summaries = [
            misra_gries_summary(s, "key", capacity=30)
            for s in self._slices(skewed)
        ]
        merged = merge_mg_summaries(summaries, "key", capacity=15).collect()
        assert 0 < len(merged) <= 15
        err = merged[0]["count_error_max"]
        emitted = {}
        for r in merged:
            t = exact_counts[r["key"]]
            assert r["est_count"] <= t <= r["est_count"] + err, r
            emitted[r["key"]] = r["est_count"]
        missing = [
            k for k, v in exact_counts.items() if v > err and k not in emitted
        ]
        assert not missing, missing

    def test_mg_merge_empty_and_single(self, skewed, exact_counts):
        with pytest.raises(ValueError):
            merge_mg_summaries([], "key", 10)
        one = misra_gries_summary(skewed, "key", capacity=4096)
        merged = merge_mg_summaries([one], "key", capacity=4096)
        got = {r["key"]: r["est_count"] for r in merged.collect()}
        assert got == exact_counts

    def test_mg_merge_empty_evicted_input_keeps_error(self, spark):
        """Hypothesis-found edge, closed: a summary whose counters ALL
        evicted (capacity 1 over unique keys) has zero rows, so a
        naive merge drops its error mass and overstates the merged
        upper bound. With keep_total_row=True the NULL-key sentinel
        carries it: true(k0)=6 must stay inside [est, est+err]."""
        a = spark.createDataFrame([("k0",), ("k1",)], "key string").coalesce(1)
        b = spark.createDataFrame([("k0",)] * 5, "key string").coalesce(1)
        sa = misra_gries_summary(a, "key", capacity=1, keep_total_row=True)
        assert sa.filter("key is not null").count() == 0  # fully evicted
        sb = misra_gries_summary(b, "key", capacity=10, keep_total_row=True)
        merged = merge_mg_summaries([sa, sb], "key", capacity=10)
        row = {r["key"]: r for r in merged.collect()}["k0"]
        true_k0 = 6
        assert row["est_count"] <= true_k0 <= (
            row["est_count"] + row["count_error_max"]
        ), row

    def test_cm_merge_equals_direct_build(self, skewed):
        """Linearity, cell-for-cell: merging per-slice sketches yields
        the EXACT cell table of one build over the whole corpus."""
        cms = [
            count_min_build(s, "key", depth=4, width=256, seed=5)
            for s in self._slices(skewed)
        ]
        merged = {(r["d"], r["b"]): r["cnt"]
                  for r in merge_count_min(cms).collect()}
        direct = {(r["d"], r["b"]): r["cnt"]
                  for r in count_min_build(
                      skewed, "key", depth=4, width=256, seed=5).collect()}
        assert merged == direct

    def test_cm_save_load_roundtrip(self, spark, skewed, tmp_path):
        cm = count_min_build(skewed, "key", depth=4, width=128, seed=2)
        save_count_min(cm, str(tmp_path / "cm"), depth=4, width=128, seed=2)
        loaded, meta = load_count_min(spark, str(tmp_path / "cm"))
        assert meta == {"depth": 4, "width": 128, "seed": 2}
        assert sorted(map(tuple, loaded.collect())) == sorted(
            map(tuple, cm.collect())
        )


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        keys=st.lists(
            st.integers(min_value=0, max_value=30), min_size=1, max_size=300
        ),
        capacity=st.integers(min_value=1, max_value=40),
        n_parts=st.integers(min_value=1, max_value=5),
    )
    def test_mg_bounds_property(spark, keys, capacity, n_parts):
        """Randomized Misra-Gries merge property: for ANY multiset,
        capacity, and partitioning — est <= true <= est + err for every
        emitted key, err <= N/(capacity+1), every key with true > err
        present, and capacity >= distinct implies exactness."""
        from collections import Counter

        df = spark.createDataFrame(
            [(f"k{k}",) for k in keys], "key string"
        ).repartition(n_parts)
        true = Counter(f"k{k}" for k in keys)
        s = misra_gries_summary(df, "key", capacity=capacity).collect()
        # an EMPTY summary is legal (every counter evicted — e.g.
        # capacity 1 with all-unique keys): it reports no error mass,
        # and its meaning is "no key exceeded N/(capacity+1)" — use
        # the analytic bound for the presence check then
        err = (
            s[0]["count_error_max"] if s else len(keys) / (capacity + 1)
        )
        assert err <= len(keys) / (capacity + 1)
        emitted = {}
        for r in s:
            t = true[r["key"]]
            assert r["est_count"] <= t <= r["est_count"] + err
            emitted[r["key"]] = r["est_count"]
        assert not [k for k, v in true.items() if v > err and k not in emitted]
        if capacity >= len(true):
            assert err == 0 and emitted == dict(true)


class TestKqlPlugin:
    def test_evaluate_heavy_hitters(self, spark, skewed, exact_counts):
        from meerkat_spark.engine import MeerkatEngine

        eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
        eng.register_table("T", skewed)
        out = eng.kql("T | evaluate heavy_hitters(key, 5, 4096)").to_df().collect()
        top = sorted(exact_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert [(r["key"], r["approximate_count"]) for r in out] == top

    def test_bad_arity_raises(self, spark, skewed):
        from meerkat_spark.engine import MeerkatEngine
        from meerkat_spark.kql import KqlSyntaxError

        eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
        eng.register_table("T", skewed)
        with pytest.raises(KqlSyntaxError):
            eng.kql("T | evaluate heavy_hitters(key)").to_df()


def test_kql_weighted_sample_matches_direct(spark):
    """`evaluate weighted_sample(...)` equals the DataFrame call."""
    from meerkat_spark.engine import MeerkatEngine
    from meerkat_spark.operators.sampling import weighted_sample_n

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    out = eng.kql(
        "documents | project doc_id, n_chars "
        "| evaluate weighted_sample(doc_id, n_chars, 25, 'k1')"
    ).to_df()
    direct = weighted_sample_n(
        eng.table("documents").to_df().select("doc_id", "n_chars"),
        weight_col="n_chars", n=25, id_col="doc_id", salt="k1",
    )
    assert {r.doc_id for r in out.collect()} == {
        r.doc_id for r in direct.collect()
    }
    assert out.count() == 25


def test_kql_frequency_estimate_matches_direct(spark):
    """`evaluate frequency_estimate(...)` equals build+estimate on the
    same table, and estimates are exact at ample width."""
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    out = {
        r["lang"]: r["approximate_count"]
        for r in eng.kql(
            "documents | evaluate frequency_estimate(lang, 4, 65536)"
        ).to_df().collect()
    }
    exact = {
        r["lang"]: r["c"]
        for r in eng.table("documents").to_df()
        .groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert out == exact

    from meerkat_spark.kql import KqlSyntaxError

    with pytest.raises(KqlSyntaxError):
        eng.kql("documents | evaluate frequency_estimate()").to_df()


def test_kql_heavy_hitters_weighted_matches_direct(spark, skewed):
    """r14 (VERDICT r13 ask #8): the 4-arg `evaluate heavy_hitters(Col,
    K, Capacity, WeightCol)` is Kusto's `top-hitters N of C by sum(W)`
    through the sketch — equals the DataFrame weighted call, and in
    the exact regime equals the true weighted ranking."""
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    eng.register_table("T", skewed)
    out = (
        eng.kql("T | evaluate heavy_hitters(key, 7, 4096, w)")
        .to_df()
        .collect()
    )
    direct = heavy_hitters(
        skewed, "key", k=7, capacity=4096, weight_col="w"
    ).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in direct]
    true_w = {
        r["key"]: r["s"]
        for r in skewed.groupBy("key").agg(F.sum("w").alias("s")).collect()
    }
    top = sorted(true_w.items(), key=lambda kv: (-kv[1], kv[0]))[:7]
    assert [(r["key"], r["approximate_count"]) for r in out] == top
    assert all(r["count_error_max"] == 0 for r in out)


def test_kql_plugin_nonliteral_scalar_raises_syntax_error(spark, skewed):
    """ADVICE r13 (translator.py lit_arg): a non-literal scalar plugin
    argument — a column reference for K/N/Depth, a string where a
    number is required — surfaces as KqlSyntaxError carrying the
    plugin's usage string, the same class as the arity errors, not a
    bare ValueError/TypeError."""
    from meerkat_spark.engine import MeerkatEngine
    from meerkat_spark.kql import KqlSyntaxError

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    eng.register_table("T", skewed)
    for bad in [
        "T | evaluate heavy_hitters(key, w)",  # column ref for K
        "T | evaluate heavy_hitters(key, 'five')",  # string for K
        "T | evaluate frequency_estimate(key, w)",  # column for Depth
        "T | evaluate frequency_estimate(key, 'x')",
        "T | evaluate weighted_sample(key, w, w)",  # column for N
    ]:
        with pytest.raises(KqlSyntaxError, match=r"\("):
            eng.kql(bad).to_df()


def test_mg_approx_envelope_query_contract(spark):
    """The r14 registered query mg_approx_envelope (VERDICT r13 ask
    #3): capacity 8 << distinct keys, so the regime is genuinely
    approximate, yet all three guarantee booleans hold for every
    planted heavy key — and the sketch really did evict (the exact
    twin would have count_error_max 0)."""
    from meerkat_spark.suite.sketches import mg_approx_envelope
    from tests.conftest import SF_SMOKE

    rows = mg_approx_envelope(spark, SF_SMOKE).collect()
    assert [r["k"] for r in rows] == ["H0", "H1", "H2"]
    for r in rows:
        assert r["present"] and r["lower_ok"] and r["upper_ok"], r


def test_heavy_hitters_weighted_query_matches_exact(spark):
    """The r14 registered query heavy_hitters_weighted reproduces the
    exact weighted ranking (capacity > distinct custkeys => error 0)."""
    from meerkat_spark.engine import MeerkatEngine
    from meerkat_spark.suite.sketches import heavy_hitters_weighted
    from tests.conftest import SF_SMOKE

    got = heavy_hitters_weighted(spark, SF_SMOKE).collect()
    o = MeerkatEngine(spark, SF_SMOKE).table("orders").to_df()
    exact = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.col("o_orderkey") % 10 + 1).alias("s"))
        .orderBy(F.col("s").desc(), F.col("o_custkey").asc())
        .limit(12)
        .collect()
    )
    assert [(r["o_custkey"], r["approximate_count"]) for r in got] == [
        (r["o_custkey"], r["s"]) for r in exact
    ]
    assert all(r["count_error_max"] == 0 for r in got)


def test_kql_weighted_sample_stratified_matches_direct(spark):
    """r14: the 5-arg `evaluate weighted_sample(Id, W, N, Salt,
    StratumCol)` equals the DataFrame keyed-window form — exactly
    min(N, stratum size) rows per stratum, weight-proportional."""
    from meerkat_spark.engine import MeerkatEngine
    from meerkat_spark.operators.sampling import weighted_sample_n

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    out = eng.kql(
        "documents | where n_chars > 0 | project doc_id, lang, n_chars"
        " | evaluate weighted_sample(doc_id, n_chars, 5, 'st', lang)"
    ).to_df()
    direct = weighted_sample_n(
        eng.table("documents").to_df()
        .filter("n_chars > 0").select("doc_id", "lang", "n_chars"),
        weight_col="n_chars", n=5, id_col="doc_id", salt="st",
        stratum_col="lang",
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, direct.collect())
    )
    per = out.groupBy("lang").count().collect()
    assert per and all(r["count"] <= 5 for r in per)


def test_kql_frequency_estimate_weighted_matches_exact(spark, skewed):
    """r14: the 5-arg `evaluate frequency_estimate(Col, Depth, Width,
    Seed, WeightCol)` sums weights per key — exact at collision-free
    width, and never under the true weighted mass at any width."""
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    eng.register_table("T", skewed.withColumn("wi", (F.col("w")).cast("long")))
    out = {
        r["key"]: r["approximate_count"]
        for r in eng.kql(
            "T | evaluate frequency_estimate(key, 4, 65536, 0, wi)"
        ).to_df().collect()
    }
    exact = {
        r["key"]: r["s"]
        for r in skewed.groupBy("key")
        .agg(F.sum(F.col("w").cast("long")).alias("s"))
        .collect()
    }
    assert out == exact

    # adversarial width: still never under the true weighted mass
    under = {
        r["key"]: r["approximate_count"]
        for r in eng.kql(
            "T | evaluate frequency_estimate(key, 4, 32, 0, wi)"
        ).to_df().collect()
    }
    assert all(under[k] >= v for k, v in exact.items())
