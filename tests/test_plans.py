"""Physical-plan shape tests: the 100TB-scale properties are asserted on
`.explain` output, not hoped for — filter pushdown reaches the parquet
scan, projections prune columns, dimension joins broadcast, top-k plans
TakeOrderedAndProject (no global sort), aggregations run partial+final.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from meerkat_spark.engine import MeerkatEngine

SF = "/root/testdata/sf0.001"


from meerkat_spark.plans import audit, executed_plan, pushed_filters, read_schema_columns


def plan_of(df) -> str:
    return executed_plan(df)


def test_plans_helpers(eng):
    df = (
        eng.table("lineitem")
        .where(F.col("l_quantity") > 30)
        .project("l_orderkey", "l_quantity")
        .to_df()
    )
    a = audit(df)
    assert any("l_quantity" in p for p in a.pushed_filters)
    assert set(read_schema_columns(df)) == {"l_orderkey", "l_quantity"}
    assert a.exchanges == 0
    assert "exchanges=0" in a.summary()


@pytest.fixture()
def eng(spark):
    return MeerkatEngine(spark, SF)


def test_filter_pushdown_reaches_scan(eng):
    df = (
        eng.table("lineitem")
        .where(F.col("l_quantity") > 30)
        .project("l_orderkey", "l_quantity")
        .to_df()
    )
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters:.*GreaterThan\(l_quantity,30", plan)


def test_column_pruning_reaches_scan(eng):
    df = eng.table("lineitem").project("l_orderkey", "l_quantity").to_df()
    read_schema = [ln for ln in plan_of(df).splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema  # untouched columns not read


def test_lookup_is_broadcast(eng):
    df = eng.table("customer").lookup(
        eng.table("nation"), on=F.col("c_nationkey") == F.col("n_nationkey")
    ).to_df()
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_top_uses_take_ordered(eng):
    df = eng.table("orders").top(10, F.col("o_totalprice")).to_df()
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort shuffle


def test_agg_is_partial_final(eng):
    df = (
        eng.table("lineitem")
        .summarize({"s": F.sum("l_quantity")}, by=["l_returnflag"])
        .to_df()
    )
    plan = plan_of(df)
    # two HashAggregate nodes (partial then final) around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan


def test_kql_pipeline_single_codegen_stage(eng):
    df = eng.kql(
        "lineitem | where l_quantity > 30 | project l_orderkey, x = l_quantity * 2"
    ).to_df()
    plan = plan_of(df)
    # filter+project fuse into one codegen stage (plan shows `*(n)` ids)
    stage_ids = set(re.findall(r"\*\((\d+)\)", plan))
    assert stage_ids == {"1"}, plan


def test_kql_timestamp_bin_prunable(eng):
    """bin(ts, 1h) on a filtered time range: the ts filter itself must
    push to the scan (partition pruning applies when tables are written
    partitioned by _ts_day — ingest path)."""
    df = eng.kql(
        "events | where ts > datetime_cut and event_type == 'click' | count"
        .replace("datetime_cut", "now() - 365d")
    ).to_df()
    plan = plan_of(df)
    assert "PushedFilters" in plan


def test_knn_brute_force_no_shuffle_before_topk(eng):
    """Query side broadcast: the corpus scan must not shuffle before the
    per-query top-k window."""
    from meerkat_spark.similarity import knn

    emb = eng.table("embeddings").to_df()
    q = emb.filter(F.col("vec_id") < 4)
    plan = plan_of(knn.brute_force_topk(emb, q, k=3))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ivf_query_plan_has_no_global_bottleneck(eng):
    """IVF after the sample-trained k-means rewrite: centroid training
    is a bounded driver-side sample (not part of the query lineage), so
    the returned plan must contain NO partition-less exchange at all —
    assignment is a row-local Arrow pass, the rerank join broadcasts
    the query-cell side."""
    from meerkat_spark.similarity import knn

    emb = eng.table("embeddings").to_df()
    q = emb.filter(F.col("vec_id") < 4)
    plan = plan_of(knn.ivf_topk(emb, q, k=3, n_cells=8, n_probe=2))
    assert "Exchange SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_union_schema_alignment(eng):
    t1 = eng.table("customer").project(key=F.col("c_custkey"))
    t2 = eng.table("supplier").project(key=F.col("s_suppkey"), extra=F.lit(1))
    out = t1.union(t2, kind="outer").to_df()
    assert set(out.columns) == {"key", "extra"}
    plan = plan_of(out)
    assert "Union" in plan


def test_facet_partial_final_agg(eng):
    df = eng.kql("events | facet by event_type, user_id").to_df()
    plan = plan_of(df)
    # each facet leg is a partial+final hash aggregation
    assert plan.count("HashAggregate") >= 4
    assert "partial_count" in plan


def test_find_pushes_search_to_each_leg(eng):
    """find-where pushes the (shared-column) predicate to each table's
    scan independently."""
    df = eng.kql(
        "find in (orders, customer) where o_totalprice > 500000 or c_acctbal > 9000"
    ).to_df()
    plan = plan_of(df)
    assert "Union" in plan


def test_top_hitters_take_ordered(eng):
    df = eng.kql("events | top-hitters 3 of event_type").to_df()
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2


def test_pack_chunks_window_is_partitioned(eng):
    """Sequence packing must never plan a partition-less window — the
    running sum is per-shard."""
    from meerkat_spark.text.chunk import chunk_documents, pack_chunks

    docs = eng.table("documents").to_df().select("doc_id", "text")
    df = pack_chunks(
        chunk_documents(docs, chunk_tokens=64, overlap=16).drop("chunk_text"),
        budget=256,
        n_shards=8,
    )
    plan = plan_of(df)
    # a partition-less window plans Exchange SinglePartition — the
    # single-reducer shape that dies at corpus scale
    assert "SinglePartition" not in plan, plan


def test_chunking_is_shuffle_free(eng):
    """Chunk generation is a row-local projection: zero exchanges."""
    from meerkat_spark.plans import audit
    from meerkat_spark.text.chunk import chunk_documents

    docs = eng.table("documents").to_df().select("doc_id", "text")
    assert audit(chunk_documents(docs)).exchanges == 0


def test_pii_and_repetition_shuffle_free(eng):
    from meerkat_spark.plans import audit
    from meerkat_spark.text.analysis import repetition_features
    from meerkat_spark.text.pii import redact

    docs = eng.table("documents").to_df().select("doc_id", "text")
    assert audit(redact(docs, with_counts=True)).exchanges == 0
    f = repetition_features(F.col("text"))
    proj = docs.select("doc_id", *[v.alias(k) for k, v in f.items()])
    assert audit(proj).exchanges == 0


def test_pii_reads_only_needed_columns(eng):
    """Redaction of (doc_id, text) must not drag the other document
    columns through the scan."""
    from meerkat_spark.plans import read_schema_columns
    from meerkat_spark.text.pii import redact

    docs = eng.table("documents").to_df().select("doc_id", "text")
    assert set(read_schema_columns(redact(docs))) == {"doc_id", "text"}


def test_range_join_outer_stays_equi_join(eng):
    """The bucketed range join must hash-join on the bucket equality in
    EVERY join kind — the round-4 matched-flag rework (window over the
    interval id) must not push the plan back to BroadcastNestedLoopJoin
    (the O(|L|*|R|) shape the bucketing exists to avoid)."""
    from meerkat_spark.operators.rangejoin import range_join

    spark = eng.spark
    points = spark.range(100).select(
        F.col("id").alias("pid"), (F.col("id") * 1.0).alias("x")
    )
    intervals = spark.range(20).select(
        F.col("id").alias("iid"),
        (F.col("id") * 5.0).alias("lo"),
        (F.col("id") * 5.0 + 12.0).alias("hi"),
    )
    for how in ("inner", "left", "right", "full"):
        plan = plan_of(range_join(points, intervals, "x", "lo", "hi", 10.0, how=how))
        assert "NestedLoop" not in plan, (how, plan[:1500])
        assert "CartesianProduct" not in plan, how


def test_zorder_write_is_range_partitioned(eng):
    """write_zordered plans a range repartition on the Morton code (the
    clustering property), not a hash or round-robin shuffle."""
    from meerkat_spark.operators.zorder import zorder_code

    spark = eng.spark
    pts = spark.range(1000).select(
        ((F.col("id") * 7919 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("id") * 104729 % 36000) / 100.0 - 180.0).alias("lon"),
    )
    clustered = (
        pts.withColumn("__z", zorder_code(F.col("lat"), F.col("lon")))
        .repartitionByRange(8, "__z")
        .sortWithinPartitions("__z")
    )
    plan = plan_of(clustered)
    assert "rangepartitioning" in plan.lower(), plan[:1500]


def test_minhash_routed_single_arrow_stage(eng):
    """Exact-dup routing computes fingerprint AND signature row-local in
    the scan stage: the plan shows the Arrow UDF evaluation BELOW the
    fingerprint exchange (batches stay scan-sized), and no text column
    survives past the window projection."""
    from meerkat_spark.text.dedup import minhash_lsh_pairs

    docs = eng.table("documents").to_df().select("doc_id", "text")
    plan = plan_of(minhash_lsh_pairs(docs))
    assert "ArrowEvalPython" in plan
    # banding groups by (band_id, band_hash); bucket-pair expansion is
    # JVM HOFs — no applyInPandas stage beyond the signature kernel
    assert plan.count("FlatMapGroupsInPandas") == 0, plan[:2000]


def test_gopher_filter_is_single_stage_no_python(eng, spark):
    """The Gopher quality gate is one codegen scan: no exchange, no
    Python eval in the plan."""
    from meerkat_spark.suite.textops import gopher_quality_filter

    df = gopher_quality_filter(spark, SF)
    plan = plan_of(df)
    a = audit(df)
    assert a.exchanges == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # '*(n)' marks WholeStageCodegen spans in the simple plan string
    assert re.search(r"\*\(\d+\)", plan)


def test_basket_cube_is_one_aggregate(eng, spark):
    """evaluate basket: cube = Expand + partial/final aggregate — one
    shuffle, no join, no Python."""
    from meerkat_spark.suite.kqlqueries import kql_basket

    df = kql_basket(spark, SF)
    plan = plan_of(df)
    assert "Expand" in plan
    assert plan.count("Exchange") <= 2  # partial→final agg (+AQE read)
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan


def test_reduce_by_single_groupby(eng, spark):
    from meerkat_spark.suite.kqlqueries import kql_reduce_by

    df = kql_reduce_by(spark, SF)
    a = audit(df)
    assert a.exchanges <= 1
    assert "BatchEvalPython" not in plan_of(df)


def test_externaldata_prunes_columns(eng):
    df = (
        eng.kql(
            "externaldata (product: string, qty: long, price: real)"
            " ['/root/repo/tests/data/ext_sales.csv']"
            " with (format='csv', ignoreFirstRecord=true)"
            " | project product"
        ).to_df()
    )
    assert set(read_schema_columns(df)) == {"product"}


def test_graph_match_is_equi_joins_no_cartesian(eng, spark):
    """graph-match compiles to equi-joins only — a pattern must never
    produce a cartesian product."""
    from meerkat_spark.suite.kqlqueries import kql_graph_match

    plan = plan_of(kql_graph_match(spark, SF))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "Join" in plan


def test_vocab_wordcount_partial_final(eng):
    """token_frequencies is canonical distributed wordcount: the token
    aggregation must run partial (map-side) then final around ONE
    exchange — corpus rows never shuffle raw, only partial counts."""
    from meerkat_spark.text.vocab import token_frequencies

    docs = eng.table("documents").to_df()
    plan = plan_of(token_frequencies(docs))
    assert re.search(r"partial_count", plan, re.I)
    assert "CartesianProduct" not in plan


def test_tfidf_no_cartesian_and_pruned_scan(eng):
    """The doc-frequency join is on the token key (broadcast or
    shuffled hash join, never a loop join), and the scan reads only
    (doc_id, text)."""
    from meerkat_spark.plans import read_schema_columns
    from meerkat_spark.text.vocab import tf_idf_top_terms

    docs = eng.table("documents").to_df()
    out = tf_idf_top_terms(docs, k=3)
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert set(read_schema_columns(out)) <= {"doc_id", "text"}


def test_sliding_window_counts_no_range_join(eng):
    """The sliding count must be the explode-to-bins shape — a bin-key
    hash aggregate, never an events×grid theta/loop join (the naive
    formulation Catalyst would execute as BroadcastNestedLoopJoin)."""
    from meerkat_spark.operators.temporalagg import sliding_window_counts

    ev = eng.table("events").to_df()
    out = sliding_window_counts(
        ev, "user_id", "ts", "2024-01-08", "2024-01-28",
        lookback_sec=7 * 86400, bin_sec=86400,
    )
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"Generate explode", plan)


def test_rows_near_single_window_no_extra_exchange(eng):
    """rows_near adds one Window over the given order and a filter —
    no joins, no aggregation, no added exchange beyond the ordering's
    own sort requirement."""
    from meerkat_spark.operators.temporalagg import rows_near

    ev = eng.table("events").to_df()
    out = rows_near(ev, F.col("event_type") == "error", ["ts", "event_id"], 2, 1)
    plan = plan_of(out)
    assert plan.count("Window") >= 1
    assert "Join" not in plan
    assert "HashAggregate" not in plan


def test_session_count_and_engagement_explode_shape(eng):
    """session_count and activity_engagement are the explode-to-bins
    shape: Generate explode + hash aggregates, never an events×grid
    theta/loop join."""
    from meerkat_spark.operators.temporalagg import (
        activity_engagement,
        session_count,
    )

    ev = eng.table("events").to_df()
    for out in (
        session_count(ev, "user_id", "ts", "2024-01-02", "2024-01-12",
                      86400, 2 * 86400),
        activity_engagement(ev, "user_id", "ts", "2024-01-01", "2024-01-15",
                            86400, 7 * 86400),
    ):
        plan = plan_of(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert re.search(r"Generate explode", plan)


def test_sequence_detect_no_pairwise_join(eng):
    """sequence_detect is K-1 union+window passes on the id key — no
    theta-join of events against events; every Join in the plan is
    absent (the chain is windows over a union)."""
    from meerkat_spark.operators.temporalagg import sequence_detect

    ev = eng.table("events").to_df()
    out = sequence_detect(
        ev, "user_id", "ts",
        [F.col("event_type") == "view", F.col("event_type") == "click",
         F.col("event_type") == "purchase"],
        max_step_sec=43200, max_span_sec=86400,
    )
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("Window") >= 2  # one forward pass per later step


def test_ipv6_and_geohash_are_single_project(eng):
    """The ipv6/geohash scalar families stay row-local codegen — a
    parquet scan plus projection, no shuffle, no UDF python workers."""
    from meerkat_spark.functions.scalar import (
        geo_point_to_geohash,
        parse_ipv6,
    )

    cust = eng.table("customer").to_df()
    out = cust.select(
        parse_ipv6(F.concat(F.lit("2001:db8::"), F.col("c_custkey").cast("string"))).alias("v6"),
        geo_point_to_geohash(F.lit(10.4), F.lit(57.6), 6).alias("gh"),
    )
    from meerkat_spark.plans import audit

    a = audit(out)
    assert a.exchanges == 0
    assert "BatchEvalPython" not in plan_of(out)
    assert "ArrowEvalPython" not in plan_of(out)


def test_series_elementwise_stays_codegen(eng):
    """The elementwise series family (HOF subset) is row-local JVM —
    no exchange, no python workers in the plan."""
    from meerkat_spark.functions import series as SER

    emb = eng.table("embeddings").to_df()
    out = emb.select(
        SER.series_sum(SER.series_multiply("embedding", 2.0)).alias("s"),
        SER.series_magnitude("embedding").alias("m"),
        SER.series_pearson_correlation(
            "embedding", SER.series_add("embedding", 1.0)
        ).alias("r"),
    )
    a = audit(out)
    assert a.exchanges == 0
    p = plan_of(out)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_temperature_mix_is_row_local(eng):
    """temperature_mix compiles to per-source filters + union — zero
    exchanges beyond the bounded count() actions it already did."""
    from meerkat_spark.operators.sampling import temperature_mix

    docs = eng.table("documents").to_df()
    srcs = {
        lg: docs.filter(F.col("lang") == lg).select("doc_id")
        for lg in ("en", "fr")
    }
    out = temperature_mix(srcs, alpha=0.5)
    assert audit(out).exchanges == 0
    assert "Join" not in plan_of(out)


def test_diffpatterns_text_single_token_shuffle(eng):
    """diffpatterns_text: one token-key aggregation (partial+final) and
    a broadcast cross join for the 1-row totals — no sort-merge join,
    no per-token python."""
    from meerkat_spark.text.analysis import diffpatterns_text

    docs = eng.table("documents").to_df()
    out = diffpatterns_text(docs, "text", "lang", "en", "fr", 5.0)
    p = plan_of(out)
    assert "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert p.count("Generate explode") == 1
    assert "BatchEvalPython" not in p


def test_activity_metrics_cokeyed_semi_join(eng):
    """activity_metrics' retained count is an equi-semi-join on
    (bin, id) — never a cartesian/BNLJ, no set collection."""
    from meerkat_spark.operators.temporalagg import activity_metrics

    ev = eng.table("events").to_df()
    out = activity_metrics(
        ev, "user_id", "ts", "2024-01-01", "2024-01-15", 86400
    )
    p = plan_of(out)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "LeftSemi" in p


def test_percentilesw_single_window_pass(eng):
    """percentilesw: all percentiles share ONE cumulative-weight window
    — exactly one Window node, one partial+final aggregate after it."""
    from meerkat_spark.operators.sampling import percentilesw_exact

    li = eng.table("lineitem").to_df()
    out = percentilesw_exact(
        li, ["l_returnflag"], "l_extendedprice", "l_quantity",
        [0.25, 0.5, 0.75, 0.9, 0.99],
    )
    p = plan_of(out)
    # cum + tot windows and the final agg all reuse ONE hash exchange
    # on the group key — adding percentiles adds no shuffle
    assert p.count("Exchange") == 1
    assert p.count("Window") == 2
    assert "HashAggregate" in p


def test_in_subquery_compiles_to_broadcast_semi_join(eng, monkeypatch):
    """Above _IN_LITERAL_MAX distinct values, `where col in ((T|...))`
    must become a broadcast left-semi join (no 1M-literal isin plan);
    results must equal the literal path's."""
    from meerkat_spark.kql.translator import Translator

    q = "events | where user_id in ((customer | project c_custkey)) | summarize n=count()"
    nq = "events | where user_id !in ((customer | project c_custkey)) | summarize n=count()"
    lit_in = eng.kql(q).to_df().collect()[0].n
    lit_notin = eng.kql(nq).to_df().collect()[0].n

    monkeypatch.setattr(Translator, "_IN_LITERAL_MAX", 5)
    df = eng.kql(q.replace(" | summarize n=count()", "")).to_df()
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert df.count() == lit_in
    ndf = eng.kql(nq.replace(" | summarize n=count()", "")).to_df()
    nplan = plan_of(ndf)
    assert "BroadcastHashJoin" in nplan and "LeftAnti" in nplan
    assert ndf.count() == lit_notin


def test_scan_fast_path_is_whole_partition(eng):
    """The common scan case (no residuals, non-concurrent) must compile
    to repartition + MapInPandas (one Arrow exchange per PARTITION),
    not FlatMapGroupsInPandas (one per group — measured 4x slower on
    thousands of small groups); residual/concurrent modes keep the
    per-group machine."""
    from pyspark.sql import functions as F2

    from meerkat_spark.operators.scan import scan_steps

    ev = eng.table("events").to_df().select("user_id", "ts", "event_id", "event_type")
    fast = scan_steps(
        ev,
        steps=[F2.col("event_type") == "view", F2.col("event_type") == "purchase"],
        order_by=["ts", "event_id"],
        partition_by=["user_id"],
    )
    plan = plan_of(fast)
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan

    slow = scan_steps(
        ev,
        steps=[F2.col("event_type") == "view", F2.col("event_type") == "purchase"],
        order_by=["ts", "event_id"],
        partition_by=["user_id"],
        concurrent=True,
    )
    assert "FlatMapGroupsInPandas" in plan_of(slow)


def test_round7_query_plan_shapes(eng, spark):
    """Round-7 plan assertions: (1) training-pipeline dedup compiles
    WindowGroupLimit partial+final (map-side top-1 per fingerprint —
    the rank filter never shuffles whole duplicate classes); (2)
    span_dedup_exact shuffles ONLY on keyed exchanges (span hash /
    doc id) — no global-order exchange; (3) partition-by window
    functions compile a keyed Window (no partition-less Window in the
    plan)."""
    from meerkat_spark.suite.textops import (
        span_dedup_exact,
        training_pipeline_end_to_end,
    )

    plan = plan_of(training_pipeline_end_to_end(spark, SF))
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final

    plan = plan_of(span_dedup_exact(spark, SF))
    assert "rangepartitioning" not in plan  # no global sort exchange
    assert "hashpartitioning" in plan  # keyed shuffles only

    df = eng.kql(
        "events | partition by user_id (sort by ts asc, event_id asc"
        " | extend rn = row_number())"
    ).to_df()
    plan = plan_of(df)
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert windows and all("windowspecdefinition(user_id" in ln for ln in windows)
