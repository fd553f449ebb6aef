"""Frequency-sketch queries (operators/sketches.py): Misra-Gries heavy
hitters and Count-Min point estimates.

Oracle strategy — each query is graded in a regime where the sketch's
answer is PROVABLY exact, so the DuckDB twin is plain exact SQL while
the Spark side still executes the full sketch path (mapInPandas
summaries / posexplode cells + bounded merge):

- heavy_hitters_sketch: capacity (4096) exceeds the column's distinct
  count (1500 custkeys at sf<=1), so no partition ever evicts —
  decremented mass is 0 and estimates equal exact counts. The
  approximate regime (capacity << distinct) is pinned by bound tests
  in tests/test_sketches.py, which ALSO pin that this query's planted
  guarantee holds when capacity shrinks.
- count_min_freq_est: 5 distinct event types vs width 65536 x depth 4
  at fixed xxhash64 seeds — the bucket assignment is deterministic
  (same hash, same data => same cells every run/engine visit), and at
  this width the 5 keys land in distinct cells per depth, so min-over-
  depth equals the exact count. The overestimate property under
  adversarial width is pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.engine import MeerkatEngine
from meerkat_spark.suite import register


def _df(spark, sf_dir, table):
    return MeerkatEngine(spark, sf_dir).table(table).to_df()


@register(
    "heavy_hitters_sketch",
    oracle="""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS approximate_count,
           CAST(0 AS BIGINT) AS count_error_max
    FROM orders GROUP BY o_custkey
    ORDER BY approximate_count DESC, o_custkey ASC LIMIT 20
    """,
)
def heavy_hitters_sketch(spark, sf_dir):
    """Top-20 customers by order count through the Misra-Gries path:
    per-partition bounded summaries -> O(capacity x partitions) merge,
    never a |distinct keys| shuffle. Exact here (capacity > distinct),
    same code path as the approximate regime."""
    from meerkat_spark.operators.sketches import heavy_hitters

    return heavy_hitters(
        _df(spark, sf_dir, "orders"), "o_custkey", k=20, capacity=4096
    )


@register(
    "count_min_freq_est",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS approximate_count
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def count_min_freq_est(spark, sf_dir):
    """Count-Min frequency estimates for every event type through the
    ROLLUP path: three disjoint slices (the per-day production shape)
    each build their own (d, b, cnt) sketch in one partially-aggregated
    pass; merge_count_min sums cells — the sketch is linear, so the
    merged table is bit-identical to a single build over the union —
    then a broadcast min-over-depth lookup. Exact at this
    width/cardinality; always an over-estimate otherwise."""
    from meerkat_spark.operators.sketches import (
        count_min_build,
        count_min_estimate,
        merge_count_min,
    )

    e = _df(spark, sf_dir, "events")
    # one grouped pass builds the three per-slice sketches (r16 — the
    # slice id is a group key via count_min_build(by=...), not three
    # scan predicates; cell sums are order-free so each slice's rows
    # yield the identical sketch): 3 scans + 3 exchanges -> 1 scan +
    # 1 exchange. merge_count_min still folds three cnt rows per cell.
    cms = count_min_build(
        e.withColumn("__slice", F.pmod(F.col("event_id"), F.lit(3))),
        "event_type",
        depth=4,
        width=65536,
        seed=0,
        by=["__slice"],
    )
    cm = merge_count_min([cms.select("d", "b", "cnt")])
    return count_min_estimate(
        cm, e, "event_type", depth=4, width=65536, seed=0
    ).orderBy("event_type")


@register(
    "kql_evaluate_heavy_hitters",
    oracle="""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS approximate_count,
           CAST(0 AS BIGINT) AS count_error_max
    FROM orders GROUP BY o_custkey
    ORDER BY approximate_count DESC, o_custkey ASC LIMIT 15
    """,
)
def kql_evaluate_heavy_hitters(spark, sf_dir):
    """The sketch through the KQL front-end (reference README.md:33-34
    declares KQL as THE query surface): `evaluate heavy_hitters(...)`."""
    return (
        MeerkatEngine(spark, sf_dir)
        .kql("orders | evaluate heavy_hitters(o_custkey, 15, 4096)")
        .to_df()
    )


@register(
    "kql_evaluate_frequency_estimate",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS approximate_count
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def kql_evaluate_frequency_estimate(spark, sf_dir):
    """The Count-Min sketch through the KQL front-end (r14, VERDICT
    r13 ask #2 — the plugin was pytest-equivalence-pinned in r13, this
    slot driver-grades it): `evaluate frequency_estimate(Col, Depth,
    Width, Seed)`. Same provably-exact regime as count_min_freq_est
    (5 event types vs width 65536 at fixed xxhash64 seeds — distinct
    cells per depth, so min-over-depth is the exact count); the Spark
    side still runs the full sketch path (posexplode cell build →
    partial agg → broadcast min-over-depth lookup)."""
    return (
        MeerkatEngine(spark, sf_dir)
        .kql(
            "events | evaluate frequency_estimate(event_type, 4, 65536, 0)"
            " | order by event_type asc"
        )
        .to_df()
    )


@register(
    "kql_evaluate_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             -ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                  || 'kqlws'), 1, 8)) AS BIGINT) + 1.0)
                 / 4294967296.0) / n_chars AS k
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, lang, n_chars
    FROM keyed ORDER BY k ASC, doc_id ASC LIMIT 60
    """,
)
def kql_evaluate_weighted_sample(spark, sf_dir):
    """Efraimidis-Spirakis weighted sampling through the KQL front-end
    (r14, VERDICT r13 ask #2): `evaluate weighted_sample(IdCol,
    WeightCol, N, Salt)`. An independent draw from weighted_sample_op
    (different salt and N), so the two slots grade two distinct
    selections; the DuckDB twin recomputes the identical -ln(u)/w race
    keys from the canonical salted md5. TakeOrdered plan — no global
    sort materializes."""
    return (
        MeerkatEngine(spark, sf_dir)
        .kql(
            "documents | where n_chars > 0"
            " | project doc_id, lang, n_chars"
            " | evaluate weighted_sample(doc_id, n_chars, 60, 'kqlws')"
        )
        .to_df()
    )


@register(
    "mg_approx_envelope",
    oracle="""
    SELECT 'H' || CAST(o_orderkey % 3 AS VARCHAR) AS k,
           CAST(count(*) AS BIGINT) AS true_count,
           TRUE AS present, TRUE AS lower_ok, TRUE AS upper_ok
    FROM orders WHERE o_orderkey % 2 = 0
    GROUP BY o_orderkey % 3 ORDER BY k
    """,
)
def mg_approx_envelope(spark, sf_dir):
    """Misra-Gries in the APPROXIMATE regime as the graded contract
    (r14, VERDICT r13 ask #3 — every earlier sketch grade ran where
    the sketch is provably exact; this one grades the GUARANTEE with
    capacity << distinct, the agg_dcount_approx envelope pattern).

    Planted distribution over orders: even orderkeys collapse to 3
    heavy keys H0/H1/H2 (N/6 rows each), odd orderkeys stay an
    all-unique tail — hundreds-to-thousands of distinct keys against
    capacity 8, so every partition evicts and count_error_max is
    genuinely positive. The MG theorems under test: any key with true
    count > N/(capacity+1) is PRESENT in the merged summary (N/6 is
    1.5x that threshold at EVERY scale factor — a theorem, not a
    probabilistic margin), and for every emitted key
    est <= true <= est + count_error_max. The Spark side computes the
    exact counts in the same query and emits the three booleans; the
    oracle pins exact counts and TRUE — a bound violation (an eviction
    accounting bug, a merge that loses error mass) flips a boolean and
    fails the grade. The regime-dependent raw estimate stays out of
    the hash."""
    from meerkat_spark.operators.sketches import misra_gries_summary

    o = _df(spark, sf_dir, "orders")
    key = F.when(
        F.col("o_orderkey") % 2 == 0,
        F.concat(F.lit("H"), (F.col("o_orderkey") % 3).cast("string")),
    ).otherwise(F.concat(F.lit("T"), F.col("o_orderkey").cast("string")))
    keyed = o.select(key.alias("k"))
    sketch = misra_gries_summary(keyed, "k", capacity=8)
    exact = (
        keyed.filter(F.col("k").startswith("H"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    j = exact.join(sketch, "k", "left")
    present = F.col("est_count").isNotNull()
    return j.select(
        "k",
        F.col("true_count").cast("long").alias("true_count"),
        present.alias("present"),
        (present & (F.col("est_count") <= F.col("true_count"))).alias(
            "lower_ok"
        ),
        (
            present
            & (
                F.col("true_count")
                <= F.col("est_count") + F.col("count_error_max")
            )
        ).alias("upper_ok"),
    ).orderBy("k")


@register(
    "heavy_hitters_weighted",
    oracle="""
    SELECT o_custkey,
           CAST(sum(o_orderkey % 10 + 1) AS BIGINT) AS approximate_count,
           CAST(0 AS BIGINT) AS count_error_max
    FROM orders GROUP BY o_custkey
    ORDER BY approximate_count DESC, o_custkey ASC LIMIT 12
    """,
)
def heavy_hitters_weighted(spark, sf_dir):
    """Kusto's `top-hitters N of C by sum(W)` form through the sketch
    (r14, VERDICT r13 ask #8): `evaluate heavy_hitters(Col, K,
    Capacity, WeightCol)` ranks by Misra-Gries-estimated WEIGHT sums.
    Integer weight (o_orderkey%10+1) so the sums are exact arithmetic
    on both engines; capacity 4096 > distinct custkeys => the exact
    regime (error 0), the same grading pattern as
    heavy_hitters_sketch. The approximate-regime weighted bounds are
    pytest-pinned in tests/test_sketches.py."""
    return (
        MeerkatEngine(spark, sf_dir)
        .kql(
            "orders | extend w = o_orderkey % 10 + 1"
            " | evaluate heavy_hitters(o_custkey, 12, 4096, w)"
        )
        .to_df()
    )


@register(
    "kql_weighted_sample_stratified",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             -ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                  || 'strat14'), 1, 8)) AS BIGINT) + 1.0)
                 / 4294967296.0) / n_chars AS k
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ), ranked AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY k ASC, doc_id ASC) AS rn
      FROM keyed
    )
    SELECT doc_id, lang, n_chars FROM ranked WHERE rn <= 10
    ORDER BY doc_id
    """,
)
def kql_weighted_sample_stratified(spark, sf_dir):
    """The STRATIFIED weighted draw through the KQL front-end (r14):
    `evaluate weighted_sample(IdCol, WeightCol, N, Salt, StratumCol)`
    — exactly N per stratum via the keyed-window form of
    weighted_sample_n (one shuffle on the stratum key, never a global
    sort); the per-stratum draws stay weight-proportional and the
    DuckDB twin replays the identical race keys under a per-lang
    row_number."""
    return (
        MeerkatEngine(spark, sf_dir)
        .kql(
            "documents | where n_chars > 0"
            " | project doc_id, lang, n_chars"
            " | evaluate weighted_sample(doc_id, n_chars, 10,"
            " 'strat14', lang)"
        )
        .to_df()
    )


@register(
    "kql_freq_estimate_weighted",
    oracle="""
    SELECT event_type,
           CAST(sum(event_id % 5 + 1) AS BIGINT) AS approximate_count
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def kql_freq_estimate_weighted(spark, sf_dir):
    """WEIGHTED Count-Min through the KQL front-end (r14): `evaluate
    frequency_estimate(Col, Depth, Width, Seed, WeightCol)` — cells
    sum WeightCol instead of counting rows, so estimates bound the
    per-key weight mass (bytes per host, tokens per domain, ...).
    Integer weights and the collision-free regime (5 keys x width
    65536 at fixed seeds) make the estimate the exact weighted sum on
    both engines; the over-estimate property under adversarial width
    is pytest-pinned with the unweighted build."""
    return (
        MeerkatEngine(spark, sf_dir)
        .kql(
            "events | extend w = event_id % 5 + 1"
            " | evaluate frequency_estimate(event_type, 4, 65536, 0, w)"
            " | order by event_type asc"
        )
        .to_df()
    )


@register(
    "hll_distinct_rollup",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def hll_distinct_rollup(spark, sf_dir):
    """Per-group distinct counts through the MERGEABLE HLL path (r14 —
    the engine behind start_hll_distinct_stream): three disjoint
    slices each aggregate their own per-type Datasketches HLL sketch,
    the slices fold via hll_union_agg (register-max merging is
    associative/commutative, so the folded sketch equals one build
    over the union), then one estimate per group. At fixture
    cardinalities the sketch is in sparse mode and the estimate is
    EXACT, so the DuckDB twin is plain COUNT(DISTINCT) — the same
    provably-exact-regime pattern as heavy_hitters_sketch; the
    approximate envelope is graded separately by agg_dcount_approx."""
    e = _df(spark, sf_dir, "events")
    # one grouped pass builds the SAME three per-slice sketches the old
    # three filtered scans built (r16, guide §2.3/§2.4: the slice id is
    # a group key, not a scan predicate — HLL registers are
    # order-insensitive, so each (event_type, slice) sketch is
    # identical to the per-slice build): 3 scans + 3 exchanges -> 1
    # scan + 1 exchange. The rollup fold below is unchanged — three
    # sketch rows per type merged via hll_union_agg.
    sks = (
        e.groupBy("event_type", F.pmod(F.col("event_id"), F.lit(3)).alias("__slice"))
        .agg(F.hll_sketch_agg(F.col("user_id"), F.lit(12)).alias("__hll"))
    )
    return (
        sks.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg(F.col("__hll"))
            ).cast("long").alias("distinct_users")
        )
        .orderBy("event_type")
    )


@register(
    "tdigest_rollup_envelope",
    oracle="""
    SELECT event_type,
           CAST(count(value) AS BIGINT) AS n,
           TRUE AS p50_rank_ok, TRUE AS p95_rank_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def tdigest_rollup_envelope(spark, sf_dir):
    """The t-digest ROLLUP lifecycle as the graded contract (r14 —
    the engine behind start_tdigest_stream): three disjoint slices
    each build per-type digests (tdigest_sketch — map-side combine,
    digest-sized shuffle), merge_digest_tables folds them (merge is
    the build on concatenated centroid sets), and each merged
    digest's p50/p95 must land inside the exact +-3%-RANK envelope —
    between the exact p47/p53 and p92/p98 values computed in the same
    query. Rank error (not value error) is what the t-digest theorem
    bounds, so this contract holds at EVERY scale factor, including
    ~200-row groups at sf0.001 where a relative-value tolerance
    flakes on tail interpolation (found by the r14 full-suite run).
    Exact group keys and counts are graded directly; the
    regime-dependent raw estimates stay out of the hash."""
    from meerkat_spark.functions.tdigest import (
        digest_percentiles,
        merge_digest_tables,
        tdigest_sketch,
    )

    e = _df(spark, sf_dir, "events").select("event_id", "event_type", "value")
    # one grouped pass builds the three per-slice digests (r16 — the
    # slice id joins the group key instead of driving three filtered
    # scans; each (event_type, slice) digest sees exactly its slice's
    # rows, and digest build order within a group was already
    # partition-dependent): 3 scans + 3 exchanges -> 1 scan + 1
    # exchange. merge_digest_tables still folds three digest rows per
    # type — the rollup lifecycle under test is unchanged.
    sks = tdigest_sketch(
        e.withColumn("__slice", F.pmod(F.col("event_id"), F.lit(3))),
        "value",
        by=["event_type", "__slice"],
    )
    merged = merge_digest_tables(sks.drop("__slice"), by=["event_type"])
    est = digest_percentiles(merged, [0.5, 0.95]).select(
        "event_type", F.col("p5").alias("p50_est"), F.col("p95").alias("p95_est")
    )
    exact = e.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.percentile("value", 0.47).alias("lo50"),
        F.percentile("value", 0.53).alias("hi50"),
        F.percentile("value", 0.92).alias("lo95"),
        F.percentile("value", 0.98).alias("hi95"),
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            ((F.col("p50_est") >= F.col("lo50"))
             & (F.col("p50_est") <= F.col("hi50"))).alias("p50_rank_ok"),
            ((F.col("p95_est") >= F.col("lo95"))
             & (F.col("p95_est") <= F.col("hi95"))).alias("p95_rank_ok"),
        )
        .orderBy("event_type")
    )
