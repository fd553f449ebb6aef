"""Aggregation-function queries (SURVEY.md §2.2.2): KQL summarize
aggregates with DuckDB oracle twins. All compile to partial+final
HashAggregateExec (map-side combine → one shuffle on the group keys)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.engine import MeerkatEngine
from meerkat_spark.functions import agg as A
from meerkat_spark.suite import register


def _eng(spark, sf_dir) -> MeerkatEngine:
    return MeerkatEngine(spark, sf_dir)


@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shaped pricing summary (the canonical grouped-agg)."""
    t = _eng(spark, sf_dir).table("lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .summarize(
            {
                "sum_qty": F.round(F.sum("l_quantity"), 2),
                "sum_base_price": F.round(F.sum("l_extendedprice"), 2),
                "sum_disc_price": F.round(F.sum(disc_price), 2),
                "avg_qty": F.round(F.avg("l_quantity"), 4),
                "avg_price": F.round(F.avg("l_extendedprice"), 4),
                "min_price": F.round(F.min("l_extendedprice"), 2),
                "max_price": F.round(F.max("l_extendedprice"), 2),
                "count_order": A.count(),
            },
            by=["l_returnflag", "l_linestatus"],
        )
        .to_df()
    )


@register(
    "agg_conditional",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(CASE WHEN value > 50 THEN 1 END) AS n_big,
           ROUND(SUM(CASE WHEN value > 50 THEN value END), 2) AS sum_big,
           ROUND(AVG(CASE WHEN user_id % 2 = 0 THEN value END), 4) AS avg_even,
           MIN(CASE WHEN value > 50 THEN value END) AS min_big,
           MAX(CASE WHEN value > 50 THEN value END) AS max_big
    FROM events GROUP BY event_type
    """,
)
def agg_conditional(spark, sf_dir):
    """KQL countif/sumif/avgif/minif/maxif."""
    t = _eng(spark, sf_dir).table("events")
    big = F.col("value") > 50
    even = F.col("user_id") % 2 == 0
    return t.summarize(
        {
            "n": A.count(),
            "n_big": A.countif(big),
            "sum_big": F.round(A.sumif("value", big), 2),
            "avg_even": F.round(A.avgif("value", even), 4),
            "min_big": A.minif("value", big),
            "max_big": A.maxif("value", big),
        },
        by=["event_type"],
    ).to_df()


@register(
    "agg_dcount",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS d_parts,
           COUNT(DISTINCT l_suppkey) AS d_supps,
           COUNT(DISTINCT CASE WHEN l_quantity > 25 THEN l_orderkey END) AS d_big_orders
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_dcount(spark, sf_dir):
    """KQL dcount/dcountif — exact mode for oracle parity; the engine's
    scale mode is approx_count_distinct (mergeable HLL, no distinct
    shuffle) — see functions/agg.py:dcount."""
    t = _eng(spark, sf_dir).table("lineitem")
    return t.summarize(
        {
            "d_parts": A.dcount("l_partkey"),
            "d_supps": A.dcount("l_suppkey"),
            "d_big_orders": A.dcountif("l_orderkey", F.col("l_quantity") > 25),
        },
        by=["l_returnflag"],
    ).to_df()


@register(
    "agg_dcount_approx",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS d_parts_exact,
           TRUE AS est_within_10pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_dcount_approx(spark, sf_dir):
    """Round-7 ORACLE-BACKED approximate dcount: the HLL estimate is
    engine-specific but DETERMINISTIC for fixed data, so the graded
    projection carries the exact-tracking column plus a boolean
    asserting the estimate lands within the sketch's error envelope
    (rsd=0.05 → 10% grading margin); the raw estimate itself stays out
    of the hash. The oracle pins exact counts and TRUE — a wrong or
    drifting sketch flips the boolean and fails the grade."""
    t = _eng(spark, sf_dir).table("lineitem")
    out = t.summarize(
        {
            "d_est": A.dcount("l_partkey", exact=False),
            "d_parts_exact": A.dcount("l_partkey", exact=True),
        },
        by=["l_returnflag"],
    ).to_df()
    return out.select(
        "l_returnflag",
        F.col("d_parts_exact").cast("long").alias("d_parts_exact"),
        (
            F.abs(F.col("d_est") - F.col("d_parts_exact"))
            <= 0.10 * F.col("d_parts_exact")
        ).alias("est_within_10pct"),
    )


@register(
    "agg_argmax_argmin",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
      FROM orders)
    SELECT o_orderpriority,
           MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS best_order,
           MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS worst_order,
           ROUND(MAX(o_totalprice), 2) AS best_price
    FROM ranked GROUP BY o_orderpriority
    """,
)
def agg_argmax_argmin(spark, sf_dir):
    """KQL arg_max/arg_min. Ordering key is (price, key) — a total order,
    so the result is deterministic even under price ties."""
    t = _eng(spark, sf_dir).table("orders")
    ordc = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return t.summarize(
        {
            "best_order": F.max_by(F.col("o_orderkey"), ordc),
            "worst_order": F.min_by(F.col("o_orderkey"), ordc),
            "best_price": F.round(F.max("o_totalprice"), 2),
        },
        by=["o_orderpriority"],
    ).to_df()


@register(
    "agg_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.95), 4) AS p95,
           ROUND(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
)
def agg_percentiles(spark, sf_dir):
    """KQL percentile()/percentiles() — exact interpolated percentile for
    oracle parity; percentile_approx (mergeable t-digest-style sketch) is
    the 100TB path (functions/agg.py:percentile)."""
    t = _eng(spark, sf_dir).table("events")
    return t.summarize(
        {
            "p50": F.round(A.percentile("value", 0.5), 4),
            "p95": F.round(A.percentile("value", 0.95), 4),
            "p99": F.round(A.percentile("value", 0.99), 4),
        },
        by=["event_type"],
    ).to_df()


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd,
           ROUND(stddev_pop(l_quantity), 4) AS sdp,
           ROUND(var_samp(l_quantity), 4) AS vr,
           ROUND(var_pop(l_quantity), 4) AS vrp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark, sf_dir):
    """KQL stdev/stdevp/variance/variancep."""
    t = _eng(spark, sf_dir).table("lineitem")
    return t.summarize(
        {
            "sd": F.round(A.stdev("l_quantity"), 4),
            "sdp": F.round(A.stdevp("l_quantity"), 4),
            "vr": F.round(A.variance("l_quantity"), 4),
            "vrp": F.round(A.variancep("l_quantity"), 4),
        },
        by=["l_returnflag"],
    ).to_df()


@register(
    "agg_make_set",
    oracle="""
    SELECT event_type,
           array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users
    FROM events WHERE user_id < 30 GROUP BY event_type
    """,
)
def agg_make_set(spark, sf_dir):
    """KQL make_set — canonicalized (sorted, joined) for cross-engine
    comparison."""
    t = _eng(spark, sf_dir).table("events")
    return (
        t.where(F.col("user_id") < 30)
        .summarize(
            {"users": F.array_join(A.make_set("user_id"), ",")},
            by=["event_type"],
        )
        .to_df()
    )


@register(
    "agg_make_list_if",
    oracle="""
    SELECT event_type,
           array_to_string(list_sort(list(event_id) FILTER (WHERE value > 90)), ',') AS big_ids
    FROM events GROUP BY event_type
    """,
)
def agg_make_list_if(spark, sf_dir):
    """KQL make_list_if — sorted for determinism."""
    t = _eng(spark, sf_dir).table("events")
    return t.summarize(
        {
            "big_ids": F.array_join(
                A.make_list_if("event_id", F.col("value") > 90, sort=True), ","
            )
        },
        by=["event_type"],
    ).to_df()


@register(
    "agg_take_any",
    oracle="""
    SELECT event_type, MIN(user_id) AS any_user
    FROM events GROUP BY event_type
    """,
)
def agg_take_any(spark, sf_dir):
    """KQL take_any returns an arbitrary value; for oracle determinism the
    engine's take_any is pinned to min() here (documented relaxation)."""
    t = _eng(spark, sf_dir).table("events")
    return t.summarize({"any_user": F.min("user_id")}, by=["event_type"]).to_df()


@register(
    "agg_binary_all",
    oracle="""
    SELECT user_id % 8 AS grp,
           bit_and(event_id) AS all_and,
           bit_or(event_id) AS all_or,
           bit_xor(event_id) AS all_xor
    FROM events GROUP BY grp
    """,
)
def agg_binary_all(spark, sf_dir):
    """KQL binary_all_and/or/xor."""
    t = _eng(spark, sf_dir).table("events")
    return t.summarize(
        {
            "all_and": A.binary_all_and("event_id"),
            "all_or": A.binary_all_or("event_id"),
            "all_xor": A.binary_all_xor("event_id"),
        },
        by=[(F.col("user_id") % 8).alias("grp")],
    ).to_df()


@register(
    "agg_distinct_variants",
    oracle="""
    SELECT l_linestatus,
           ROUND(SUM(DISTINCT l_quantity), 2) AS sum_d,
           COUNT(DISTINCT CASE WHEN l_discount > 0.05 THEN l_partkey END) AS cd_if
    FROM lineitem GROUP BY l_linestatus
    """,
)
def agg_distinct_variants(spark, sf_dir):
    """KQL sum_distinct / count_distinctif (§2.2.2 T2)."""
    t = _eng(spark, sf_dir).table("lineitem")
    return t.summarize(
        {
            "sum_d": F.round(F.sum_distinct(F.col("l_quantity")), 2),
            "cd_if": F.countDistinct(
                F.when(F.col("l_discount") > 0.05, F.col("l_partkey"))
            ),
        },
        by=["l_linestatus"],
    ).to_df()


@register(
    "agg_hll_sketch",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS est_within_10pct
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_hll_sketch(spark, sf_dir):
    """KQL hll()/hll_merge()/dcount_hll() — two-level sketch merge:
    per-group HLL sketches, unioned, then estimated. Round-7
    ORACLE-BACKED via the sketch-tolerance pattern: the merged-sketch
    estimate is deterministic for fixed data, so the graded projection
    carries the exact distinct count plus a boolean asserting the
    estimate within 10% (measured error 0.45% at sf0.01). A broken
    merge (double-count, dropped register) flips the boolean."""
    e = _eng(spark, sf_dir)
    per_flag = (
        e.table("lineitem")
        .summarize({"sk": A.hll("l_partkey")}, by=["l_returnflag", "l_linestatus"])
        .to_df()
    )
    merged = per_flag.groupBy("l_returnflag").agg(
        A.hll_merge("sk").alias("sk_merged")
    )
    exact = (
        e.table("lineitem")
        .to_df()
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact_parts"))
    )
    return (
        merged.select(
            "l_returnflag", A.dcount_hll("sk_merged").alias("approx_parts")
        )
        .join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("exact_parts").cast("long").alias("exact_parts"),
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= 0.10 * F.col("exact_parts")
            ).alias("est_within_10pct"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_make_bag",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_keys,
           array_to_string(list(CAST(event_id AS VARCHAR)
                                ORDER BY CAST(event_id AS VARCHAR)), ',') AS keys_cat,
           ROUND(SUM(value), 4) AS vsum
    FROM events WHERE event_id < 50
    GROUP BY event_type ORDER BY event_type
    """,
)
def agg_make_bag(spark, sf_dir):
    """KQL make_bag — JSON object aggregation. Round-7 ORACLE-BACKED:
    the raw JSON string's key order is collect-order-nondeterministic,
    so the graded projection round-trips the bag through from_json and
    grades order-free derivations — key count, lexically sorted key
    list, 4dp value sum (event value has <=4 decimal digits, so the
    true sum never sits on a rounding boundary). This exercises
    make_bag's content AND the to_json/from_json dynamic round-trip."""
    t = _eng(spark, sf_dir).table("events")
    bags = (
        t.where(F.col("event_id") < 50)
        .summarize(
            {"bag": A.make_bag(F.col("event_id").cast("string"), "value")},
            by=["event_type"],
        )
        .to_df()
    )
    m = F.from_json("bag", "map<string,double>")
    return bags.select(
        "event_type",
        F.size(m).cast("long").alias("n_keys"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_cat"),
        F.round(
            F.aggregate(F.map_values(m), F.lit(0.0), lambda a, v: a + v), 4
        ).alias("vsum"),
    ).orderBy("event_type")


@register(
    "agg_tdigest",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           TRUE AS p50_within_1pct, TRUE AS p95_within_1pct,
           TRUE AS p99_within_1pct
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_tdigest(spark, sf_dir):
    """Mergeable t-digest percentile sketch (SURVEY.md §2.2.2 T2): one
    stored digest per l_returnflag — map-side pre-digest per partition,
    one merge shuffle of O(compression) centroids per key — then p50/
    p95/p99 extracted from the sketch. Round-7 ORACLE-BACKED via the
    sketch-tolerance pattern (agg_dcount_approx): the digest is
    deterministic for fixed data, so booleans asserting each estimate
    within 1% relative of Spark's EXACT percentile are constants of
    the fixture (measured error <=0.08% at sf0.01; rank-error <=0.5%
    pinned in tests/test_tdigest.py). The exact percentile values stay
    out of the hash — interpolated doubles rounded at a decimal
    boundary are the one cross-engine hazard — while the group keys
    and exact row counts are graded directly."""
    from meerkat_spark.functions import tdigest as td

    df = _eng(spark, sf_dir).table("lineitem").to_df()
    sk = td.tdigest_sketch(df, "l_extendedprice", by=["l_returnflag"])
    est = td.digest_percentiles(sk, [0.5, 0.95, 0.99]).select(
        "l_returnflag",
        F.col("p5").alias("p50_est"),
        F.col("p95").alias("p95_est"),
        F.col("p99").alias("p99_est"),
    )
    exact = df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("l_extendedprice", 0.5).alias("e50"),
        F.percentile("l_extendedprice", 0.95).alias("e95"),
        F.percentile("l_extendedprice", 0.99).alias("e99"),
    )
    tol = lambda e, x: (F.abs(F.col(e) - F.col(x)) <= 0.01 * F.abs(F.col(x)))
    return (
        est.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "n",
            tol("p50_est", "e50").alias("p50_within_1pct"),
            tol("p95_est", "e95").alias("p95_within_1pct"),
            tol("p99_est", "e99").alias("p99_within_1pct"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_round3_variants",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS cd,
           CAST(COUNT(DISTINCT CASE WHEN value > 50 THEN user_id END) AS BIGINT) AS cdi,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(covar_samp(value, CAST(user_id AS DOUBLE)), 4) AS cv
    FROM events GROUP BY event_type
    """,
)
def agg_round3_variants(spark, sf_dir):
    """Round-3 aggregate surface through the KQL front-end:
    count_distinct(if), 0-100 percentile args, covariance."""
    from meerkat_spark.engine import MeerkatEngine

    return MeerkatEngine(spark, sf_dir).kql(
        """events | summarize
           cd = count_distinct(user_id),
           cdi = count_distinctif(user_id, value > 50),
           p50 = round(percentile(value, 50), 4),
           cv = round(covariance(value, todouble(user_id)), 4)
           by event_type"""
    ).to_df()


@register(
    "agg_percentilew",
    oracle="""
    WITH cum AS (
      SELECT l_returnflag, l_extendedprice,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice
                                   ROWS UNBOUNDED PRECEDING) AS c,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS t
      FROM lineitem
    )
    SELECT l_returnflag, MIN(l_extendedprice) AS p50_weighted
    FROM cum WHERE c >= 0.5 * t GROUP BY l_returnflag
    """,
)
def agg_percentilew(spark, sf_dir):
    """Kusto percentilew (weighted percentile), exact lower-bound
    variant (operators/sampling.py:percentilew_exact): quantity-weighted
    median price per return flag — one keyed cumulative-weight window +
    one aggregate, mirrored exactly by the SQL twin."""
    from meerkat_spark.operators.sampling import percentilew_exact

    li = MeerkatEngine(spark, sf_dir).table("lineitem").to_df()
    return percentilew_exact(
        li, ["l_returnflag"], "l_extendedprice", "l_quantity", 0.5
    )


@register(
    "agg_dcount_intersect",
    oracle="""
    WITH w AS (
      SELECT user_id,
             (epoch_us(ts) // 604800000000) * 604800000000 AS wb,
             bool_or(event_type = 'view') AS has_v,
             bool_or(event_type = 'purchase') AS has_b
      FROM events
      GROUP BY user_id, (epoch_us(ts) // 604800000000) * 604800000000
    )
    SELECT make_timestamp(wb) AS ts,
           CAST(count(*) FILTER (has_v) AS BIGINT) AS viewers_exact,
           CAST(count(*) FILTER (has_v AND has_b) AS BIGINT)
             AS viewers_buyers_exact,
           TRUE AS s1_within_10pct, TRUE AS s2_within_10pct
    FROM w GROUP BY wb ORDER BY ts
    """,
)
def agg_dcount_intersect(spark, sf_dir):
    """`evaluate dcount_intersect` over weekly viewer/buyer HLL
    sketches — Kusto semantics: s1 = dcount(set1), s2 = dcount of the
    INTERSECTION set1∩set2, by inclusion-exclusion on sketch unions.
    Round-7 ORACLE-BACKED via the agg_dcount_approx pattern: the
    estimates are engine-specific but deterministic, so the graded
    projection carries the exact weekly viewer / viewer∩buyer dcounts
    plus booleans asserting each estimate lands within 10% of exact
    (at fixture cardinalities the Datasketches HLL is in sparse mode
    and exact); the raw estimates stay out of the hash. Typed-null
    literals (long(null)) route the sketch inputs."""
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, sf_dir)
    est = eng.kql(
        """events
           | summarize viewers = hll(iff(event_type == 'view', user_id,
                                         long(null))),
                       buyers = hll(iff(event_type == 'purchase', user_id,
                                        long(null)))
             by bin(ts, 7d)
           | evaluate dcount_intersect(viewers, buyers)
           | project ts, s1, s2"""
    ).to_df()
    ev = eng.table("events").to_df()
    wb = (F.floor(F.unix_micros(F.col("ts")) / 604_800_000_000) * 604_800_000_000).cast("long")
    exact = (
        ev.groupBy("user_id", wb.alias("__wb"))
        .agg(
            F.max(F.col("event_type") == "view").alias("has_v"),
            F.max(F.col("event_type") == "purchase").alias("has_b"),
        )
        .groupBy("__wb")
        .agg(
            F.count_if(F.col("has_v")).alias("viewers_exact"),
            F.count_if(F.col("has_v") & F.col("has_b")).alias(
                "viewers_buyers_exact"
            ),
        )
        .select(F.timestamp_micros(F.col("__wb")).alias("ts"), "viewers_exact",
                "viewers_buyers_exact")
    )
    return (
        est.join(exact, "ts")
        .select(
            "ts",
            F.col("viewers_exact").cast("long").alias("viewers_exact"),
            F.col("viewers_buyers_exact").cast("long").alias(
                "viewers_buyers_exact"
            ),
            (
                F.abs(F.col("s1") - F.col("viewers_exact"))
                <= 0.10 * F.col("viewers_exact")
            ).alias("s1_within_10pct"),
            (
                F.abs(F.col("s2") - F.col("viewers_buyers_exact"))
                <= 0.10 * F.col("viewers_buyers_exact")
            ).alias("s2_within_10pct"),
        )
        .orderBy("ts")
    )


@register(
    "agg_percentilesw",
    oracle="""
    WITH cum AS (
      SELECT l_returnflag, l_extendedprice,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice
                                   ROWS UNBOUNDED PRECEDING) AS c,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS t
      FROM lineitem
    )
    SELECT l_returnflag,
           MIN(CASE WHEN c >= 0.25 * t THEN l_extendedprice END) AS p25_weighted,
           MIN(CASE WHEN c >= 0.5 * t THEN l_extendedprice END) AS p50_weighted,
           MIN(CASE WHEN c >= 0.9 * t THEN l_extendedprice END) AS p90_weighted
    FROM cum GROUP BY l_returnflag
    """,
)
def agg_percentilesw(spark, sf_dir):
    """Kusto percentilesw: every requested weighted percentile from ONE
    cumulative-weight window pass (operators/sampling.py:
    percentilesw_exact) — conditional mins share the window, so cost is
    independent of how many percentiles are requested."""
    from meerkat_spark.operators.sampling import percentilesw_exact

    li = MeerkatEngine(spark, sf_dir).table("lineitem").to_df()
    return percentilesw_exact(
        li, ["l_returnflag"], "l_extendedprice", "l_quantity", [0.25, 0.5, 0.9]
    )


@register(
    "agg_conditional_r7",
    oracle="""
    SELECT user_id,
           round(stddev_samp(CASE WHEN event_type = 'click' THEN value END),
                 6) AS sd,
           round(var_samp(CASE WHEN event_type = 'click' THEN value END),
                 6) AS va,
           TRUE AS hll_if_exact
    FROM events GROUP BY user_id
    """,
)
def agg_conditional_r7(spark, sf_dir):
    """Round-7 conditional aggregates: stdevif/varianceif (exact
    DuckDB twins) and hll_if graded via the sketch-tolerance-boolean
    pattern (estimate == exact dcountif at fixture cardinalities —
    sparse-mode HLL)."""
    from meerkat_spark.engine import MeerkatEngine

    out = MeerkatEngine(spark, sf_dir).kql(
        "events | summarize"
        " sd = round(stdevif(value, event_type == 'click'), 6),"
        " va = round(varianceif(value, event_type == 'click'), 6),"
        " e = dcount_hll(hll_if(user_id, event_type == 'click')),"
        " x = dcountif(user_id, event_type == 'click')"
        " by user_id"
    ).to_df()
    return out.select(
        "user_id", "sd", "va", (F.col("e") == F.col("x")).alias("hll_if_exact")
    )
