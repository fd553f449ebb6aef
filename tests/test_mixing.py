"""Weighted dataset mixing: output proportions track the weights, the
binding source keeps everything, and membership is deterministic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meerkat_spark.operators.sampling import mix_datasets


def test_mix_proportions_and_determinism(spark):
    a = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    b = spark.range(10_000, 14_000).select(F.col("id").alias("doc_id"))
    c = spark.range(20_000, 20_400).select(F.col("id").alias("doc_id"))
    mixed = mix_datasets(
        {"web": (a, 2.0), "code": (b, 1.0), "books": (c, 1.0)}
    )
    counts = {r.mix_source: r.n for r in
              mixed.groupBy("mix_source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # books is binding (400 rows / weight 1): kept fully; targets 800/400/400
    assert counts["books"] == 400
    assert counts["web"] == pytest.approx(800, rel=0.15)
    assert counts["code"] == pytest.approx(400, rel=0.15)
    # deterministic: same call → identical membership
    again = mix_datasets({"web": (a, 2.0), "code": (b, 1.0), "books": (c, 1.0)})
    assert sorted(r.doc_id for r in mixed.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_mix_validation(spark):
    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        mix_datasets({})
    with pytest.raises(ValueError):
        mix_datasets({"a": (df, 0.0)})


def test_temperature_mix_flattens_and_binds(spark):
    from pyspark.sql import functions as F

    from meerkat_spark.operators.sampling import temperature_mix

    docs = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, src string",
    )
    srcs = {
        s: docs.filter(F.col("src") == s).select("doc_id")
        for s in ("big", "small")
    }
    out = temperature_mix(srcs, alpha=0.0)  # uniform target
    got = {r.mix_source: r["count"] for r in out.groupBy("mix_source").count().collect()}
    # alpha=0: equal target shares; 'small' binds at 100 kept docs,
    # 'big' down-samples to ~100 (hash granularity gives +-~10%)
    assert got["small"] == 100
    assert 70 <= got["big"] <= 130
    # alpha=1: natural proportions -> both kept fully
    out1 = temperature_mix(srcs, alpha=1.0)
    got1 = {r.mix_source: r["count"] for r in out1.groupBy("mix_source").count().collect()}
    assert got1 == {"big": 900, "small": 100}
    # deterministic: same call, same kept set
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in temperature_mix(srcs, alpha=0.0).collect()}
    assert a == b


def test_select_token_budget_semantics_and_stability(spark):
    """r11 select_token_budget: per stratum the kept set is the
    minimal hash-ordered prefix reaching the budget (total >= budget,
    removing the last-kept doc drops below); strata without budgets
    vanish; growing the corpus never evicts previously selected docs
    that keep their hash position (append-stability, the hash_split
    contract)."""
    from meerkat_spark.operators.sampling import _salted_md5, select_token_budget
    from meerkat_spark.text.analysis import token_count

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang", token_count(F.col("text")).alias("n_tok"))
    )
    budgets = {"en": 1500, "fr": 600}
    kept = select_token_budget(docs, budgets, token_col="n_tok").cache()
    sums = {r.lang: r.s for r in kept.groupBy("lang").agg(F.sum("n_tok").alias("s")).collect()}
    assert set(sums) == {"en", "fr"}  # unbudgeted strata dropped
    for lang, budget in budgets.items():
        assert sums[lang] >= budget, (lang, sums[lang])
        # minimality: dropping the hash-last kept doc goes below budget
        last = (
            kept.filter(F.col("lang") == lang)
            .withColumn("h", _salted_md5("doc_id", "budget"))
            .orderBy(F.col("h").desc(), F.col("doc_id").desc())
            .limit(1)
            .collect()[0]
        )
        assert sums[lang] - last.n_tok < budget, (lang, sums[lang], last.n_tok)

    # append-stability: selecting from HALF the corpus then from the
    # whole corpus — every doc selected from the half that the full
    # run also selects is fine, but more strongly: the full-corpus
    # selection restricted to the half-corpus ids equals selecting the
    # prefix among those ids' hash positions; minimal check = no doc
    # selected from the full corpus that exists in the half was
    # selected there with a LOWER hash position and dropped now.
    half = docs.filter(F.col("doc_id") % 2 == 0)
    kept_half = {r.doc_id for r in select_token_budget(half, budgets, token_col="n_tok").collect()}
    kept_full = {r.doc_id for r in kept.collect()}
    # a doc kept in the FULL run and present in half must be kept in
    # the half run too: the half corpus has strictly fewer competitors
    # before any hash position, so prefixes only grow
    assert {d for d in kept_full if d % 2 == 0} <= kept_half


def test_select_token_budget_histogram_cut_matches_window(spark):
    """r12 (VERDICT r11 ask #3): above the per-stratum row threshold,
    select_token_budget switches to the histogram-cut plan — the kept
    set is BIT-IDENTICAL to the window form, and the plan contains no
    single-partition window (every Window partitions by (stratum,
    hash-prefix bin); the fully-kept bins are a plain filter)."""
    from meerkat_spark.operators.sampling import select_token_budget
    from meerkat_spark.text.analysis import token_count

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang", token_count(F.col("text")).alias("n_tok"))
    )
    budgets = {"en": 1500, "fr": 600, "zh": 10**9}  # zh: budget > total
    window_out = select_token_budget(
        docs, budgets, token_col="n_tok", histogram_threshold=None
    )
    hist_out = select_token_budget(
        docs, budgets, token_col="n_tok",
        histogram_threshold=0,  # force EVERY stratum down the cut path
        histogram_hex_digits=1,  # 16 bins — boundary bins are non-trivial
    )
    a = {tuple(r) for r in window_out.collect()}
    b = {tuple(r) for r in hist_out.collect()}
    assert a == b and a  # identical, non-empty
    # zh (budget above the stratum total) must be kept whole
    n_zh = docs.filter("lang = 'zh'").count()
    assert sum(1 for r in b if r[1] == "zh") == n_zh

    # plan shape: every windowspecdefinition partitions by BOTH the
    # stratum and the bin column — no single-partition stratum window
    plan = hist_out._jdf.queryExecution().optimizedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan  # the boundary-bin window exists
    for spec in specs:
        assert "__bin" in spec, spec

    # mixed routing: a threshold between the stratum sizes sends big
    # strata down the cut path and small ones down the window path,
    # still bit-identical
    sizes = {r[0]: r[1] for r in docs.groupBy("lang").count().collect()}
    mid = sorted(sizes[s] for s in budgets)[1]
    mixed = select_token_budget(
        docs, budgets, token_col="n_tok",
        histogram_threshold=mid - 1, histogram_hex_digits=1,
    )
    assert {tuple(r) for r in mixed.collect()} == a


def test_select_token_budget_many_strata_broadcast_path(spark):
    """r12: above _LITERAL_MAP_MAX strata the budget lookup and the
    histogram decision table ride broadcast joins instead of literal
    create_maps (plan-bloat class of an oversized isin). Semantics are
    unchanged: identical kept set to the literal-map form."""
    from meerkat_spark.operators import sampling
    from meerkat_spark.operators.sampling import select_token_budget

    df = (
        spark.range(6000)
        .selectExpr(
            "id AS doc_id",
            "concat('s', CAST(id % 600 AS STRING)) AS lang",
            "CAST(5 + id % 7 AS LONG) AS n_tok",
        )
    )
    budgets = {f"s{i}": 40 for i in range(600)}  # 600 > _LITERAL_MAP_MAX
    assert len(budgets) > sampling._LITERAL_MAP_MAX

    got = select_token_budget(df, budgets, token_col="n_tok")
    # identical kept set through the literal-map form (threshold lifted)
    old = sampling._LITERAL_MAP_MAX
    sampling._LITERAL_MAP_MAX = 10_000
    try:
        want = select_token_budget(df, budgets, token_col="n_tok")
        a = {tuple(r) for r in got.collect()}
        b = {tuple(r) for r in want.collect()}
    finally:
        sampling._LITERAL_MAP_MAX = old
    assert a == b and a
    # and through the histogram path too (forced), still identical
    hist = select_token_budget(
        df, budgets, token_col="n_tok",
        histogram_threshold=0, histogram_hex_digits=1,
    )
    assert {tuple(r) for r in hist.collect()} == a


def test_select_token_budget_single_stats_pass(spark, monkeypatch):
    """r13 (VERDICT r12 ask #5): routing + histogram share ONE
    aggregation ACTION over the corpus. The old form paid a separate
    groupBy().count() size probe before the histogram aggregation —
    two full corpus scans on the big-strata path and a pure-overhead
    probe scan on the small path. Collect-spy (the in()-subquery
    precedent, tests/test_kql.py): building the operator fires exactly
    one collect whether routing lands on the window or the histogram
    path, zero when histogram_threshold=None pins the window form —
    and that one collect's rows are the skinny per-stratum stats with
    the bin list NULLed for small strata (never a per-bin row set)."""
    from pyspark.sql.classic.dataframe import DataFrame

    from meerkat_spark.operators.sampling import select_token_budget

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("doc_id", "lang", "CAST(5 + doc_id % 7 AS LONG) AS n_tok")
    )
    budgets = {"en": 1500, "fr": 600}
    calls: list[list] = []
    real_collect = DataFrame.collect

    def spy(self):
        rows = real_collect(self)
        calls.append(rows)
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)

    # small strata -> window routing: the single stats action only
    select_token_budget(docs, budgets, token_col="n_tok")
    assert len(calls) == 1
    # ... whose payload is one skinny row per stratum, bins NULLed
    assert len(calls[0]) == 2
    assert all(r[2] is None for r in calls[0]), calls[0]

    # big strata (threshold 0) -> histogram routing: STILL one action,
    # now carrying the bin structs for the (big) strata
    calls.clear()
    select_token_budget(
        docs, budgets, token_col="n_tok",
        histogram_threshold=0, histogram_hex_digits=1,
    )
    assert len(calls) == 1
    assert all(r[2] is not None for r in calls[0]), calls[0]

    # explicit window form: no stats action at all
    calls.clear()
    select_token_budget(docs, budgets, token_col="n_tok", histogram_threshold=None)
    assert calls == []


def test_select_token_budget_nonstring_stratum_broadcast(spark):
    """r13 (ADVICE r12): the >_LITERAL_MAP_MAX broadcast-lookup path
    hardcoded a `{col} string` DDL schema, so a LONG stratum column
    joined through implicit casts (or broke). The lookup frames now
    carry the input column's actual dtype; kept set identical to the
    literal-map form on an integer stratum key."""
    from meerkat_spark.operators import sampling
    from meerkat_spark.operators.sampling import select_token_budget

    df = spark.range(6000).selectExpr(
        "id AS doc_id",
        "CAST(id % 600 AS LONG) AS bucket",
        "CAST(5 + id % 7 AS LONG) AS n_tok",
    )
    budgets = {i: 40 for i in range(600)}  # int keys, 600 > literal max
    assert len(budgets) > sampling._LITERAL_MAP_MAX

    got = select_token_budget(
        df, budgets, stratum_col="bucket", token_col="n_tok"
    )
    # the broadcast lookup key must be the column's own type — no cast
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "cast(bucket" not in plan.lower(), plan
    old = sampling._LITERAL_MAP_MAX
    sampling._LITERAL_MAP_MAX = 10_000
    try:
        want = select_token_budget(
            df, budgets, stratum_col="bucket", token_col="n_tok"
        )
        a = {tuple(r) for r in got.collect()}
        b = {tuple(r) for r in want.collect()}
    finally:
        sampling._LITERAL_MAP_MAX = old
    assert a == b and a
    # histogram routing over the integer stratum: same kept set
    hist = select_token_budget(
        df, budgets, stratum_col="bucket", token_col="n_tok",
        histogram_threshold=0, histogram_hex_digits=1,
    )
    assert {tuple(r) for r in hist.collect()} == a


def test_weighted_sample_n_semantics(spark):
    """Efraimidis-Spirakis weighted sampling (r13): exact n without
    replacement, weight-proportional inclusion, determinism under the
    salt, nonpositive/NULL weights never drawn, keyed per-stratum
    variant."""
    from meerkat_spark.operators.sampling import weighted_sample_n

    rows = [(i, "heavy" if i < 20 else "light",
             1000.0 if i < 20 else 1.0) for i in range(2000)]
    rows += [(9000, "bad", 0.0), (9001, "bad", -3.0), (9002, "bad", None)]
    df = spark.createDataFrame(rows, "id long, grp string, w double")

    s = weighted_sample_n(df, "w", 100, "id", salt="a")
    got = s.collect()
    assert len(got) == 100
    ids = [r["id"] for r in got]
    assert len(set(ids)) == 100
    assert not any(r["grp"] == "bad" for r in got)
    # each heavy row carries 1000x the weight of a light row; with 100
    # draws from total mass 20*1000 + 1980*1 the inclusion probability
    # of every heavy row is ~1 — require at least 15/20 present
    n_heavy = sum(1 for r in got if r["grp"] == "heavy")
    assert n_heavy >= 15, n_heavy

    # determinism: same salt -> same set; different salt -> different
    again = {r["id"] for r in weighted_sample_n(df, "w", 100, "id", salt="a").collect()}
    assert again == set(ids)
    other = {r["id"] for r in weighted_sample_n(df, "w", 100, "id", salt="b").collect()}
    assert other != set(ids)

    # per-stratum: exactly min(n, eligible) rows per group, keyed window
    per = weighted_sample_n(df, "w", 30, "id", salt="a", stratum_col="grp")
    counts = {r["grp"]: r["c"] for r in
              per.groupBy("grp").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert counts == {"heavy": 20, "light": 30}

    # plan: global form is TakeOrdered, not a full sort-exchange
    plan = weighted_sample_n(df, "w", 100, "id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_weighted_sample_summary_merge_identity(spark):
    """r14: weighted_sample_summary is mergeable — folding per-slice
    summaries (min-n of unions of <= n-row frames) is bit-identical to
    one global weighted_sample_n pass, at any disjoint split, and the
    merge is idempotent under overlapping/replayed inputs (same id =>
    same deterministic race key)."""
    from meerkat_spark.operators.sampling import (
        merge_weighted_samples,
        weighted_sample_n,
        weighted_sample_summary,
    )

    df = spark.createDataFrame(
        [(i, (i * 13) % 50 + 1) for i in range(2000)], "id long, w long"
    )
    slices = [df.filter(F.col("id") % 4 == k) for k in range(4)]
    summaries = [
        weighted_sample_summary(s, "w", n=30, id_col="id", salt="mrg")
        for s in slices
    ]
    merged = merge_weighted_samples(summaries, n=30, id_col="id")
    got = sorted(
        (r["id"], r["w"]) for r in merged.drop("__es_key").collect()
    )
    want = sorted(
        map(tuple, weighted_sample_n(df, "w", 30, "id", salt="mrg").collect())
    )
    assert got == want

    # idempotent under replayed/overlapping inputs
    again = merge_weighted_samples([merged, summaries[0]], n=30, id_col="id")
    assert sorted(
        (r["id"], r["w"]) for r in again.drop("__es_key").collect()
    ) == got


def test_weighted_sample_merge_weight_conflict_deterministic(spark):
    """r15 (ADVICE r14): if the same id is re-ingested with a DIFFERENT
    weight, its race keys differ across summaries — the merge keeps the
    MIN __es_key row per id (a keyed window, not dropDuplicates'
    arbitrary pick), so the fold is deterministic, order-invariant, and
    bit-identical to a global pass over the per-id-min-key union."""
    from meerkat_spark.operators.sampling import (
        merge_weighted_samples,
        weighted_sample_summary,
    )

    a = spark.createDataFrame(
        [(i, (i * 7) % 20 + 1) for i in range(200)], "id long, w long"
    )
    # ids 50..149 re-ingested with different weights
    b = spark.createDataFrame(
        [(i, (i * 11) % 30 + 1) for i in range(50, 250)], "id long, w long"
    )
    sa = weighted_sample_summary(a, "w", n=25, id_col="id", salt="wc")
    sb = weighted_sample_summary(b, "w", n=25, id_col="id", salt="wc")
    m1 = sorted(
        (r["id"], r["w"])
        for r in merge_weighted_samples([sa, sb], 25, "id").collect()
    )
    m2 = sorted(
        (r["id"], r["w"])
        for r in merge_weighted_samples([sb, sa], 25, "id").collect()
    )
    assert m1 == m2  # order of summaries cannot change the draw
    # repeating a summary (replay) cannot change the draw either
    m3 = sorted(
        (r["id"], r["w"])
        for r in merge_weighted_samples([sa, sb, sa], 25, "id").collect()
    )
    assert m3 == m1


def test_weighted_sample_merge_edges(spark):
    """Edge cases of the mergeable draw: empty slices contribute
    nothing, and n larger than the corpus returns every valid row."""
    from meerkat_spark.operators.sampling import (
        merge_weighted_samples,
        weighted_sample_summary,
    )

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, 7), (4, None)], "id long, w int"
    )
    empty = df.filter("id < 0")
    s_all = weighted_sample_summary(df, "w", n=10, id_col="id")
    s_empty = weighted_sample_summary(empty, "w", n=10, id_col="id")
    merged = merge_weighted_samples([s_all, s_empty], n=10, id_col="id")
    # weight 0 and NULL rows are never drawn; everything else survives
    assert sorted(r["id"] for r in merged.collect()) == [1, 3]
