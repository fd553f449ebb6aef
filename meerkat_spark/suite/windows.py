"""Window-function queries (SURVEY.md §2.2.4): KQL's serialized-table
window functions (row_number / prev / next / row_cumsum / row_rank /
session windows) realized over Spark Window specs with explicit total
orders (KQL `serialize` = explicit orderBy)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meerkat_spark.engine import MeerkatEngine
from meerkat_spark.suite import register


def _eng(spark, sf_dir) -> MeerkatEngine:
    return MeerkatEngine(spark, sf_dir)


# The serialize order used throughout: per-user by (ts, event_id) — a
# total order (event_id unique), so every window result is deterministic.
def _ORDER():
    return [F.col("ts").asc(), F.col("event_id").asc()]


@register(
    "window_row_number",
    oracle="""
    SELECT event_id, user_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS rn
    FROM events WHERE user_id < 20
    """,
)
def window_row_number(spark, sf_dir):
    """KQL: serialize | extend rn=row_number(1, user_id changed) — i.e.
    restart per user."""
    t = _eng(spark, sf_dir).table("events")
    w = W.partitionBy("user_id").orderBy(*_ORDER())
    return (
        t.where(F.col("user_id") < 20)
        .extend(rn=F.row_number().over(w))
        .project("event_id", "user_id", "rn")
        .to_df()
    )


@register(
    "window_prev_next",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next2_value
    FROM events WHERE user_id < 20
    """,
)
def window_prev_next(spark, sf_dir):
    """KQL prev()/next() over the serialize order."""
    t = _eng(spark, sf_dir).table("events")
    w = W.partitionBy("user_id").orderBy(*_ORDER())
    return (
        t.where(F.col("user_id") < 20)
        .extend(
            prev_value=F.lag("value").over(w),
            next2_value=F.lead("value", 2).over(w),
        )
        .project("event_id", "user_id", "value", "prev_value", "next2_value")
        .to_df()
    )


@register(
    "window_cumsum",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_value
    FROM events WHERE user_id < 20
    """,
)
def window_cumsum(spark, sf_dir):
    """KQL row_cumsum — running sum over the serialize order (prefix sums
    are order-fixed, so cross-engine values agree; rounded for fp safety)."""
    t = _eng(spark, sf_dir).table("events")
    w = (
        W.partitionBy("user_id")
        .orderBy(*_ORDER())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t.where(F.col("user_id") < 20)
        .extend(cum_value=F.round(F.sum("value").over(w), 4))
        .project("event_id", "user_id", "cum_value")
        .to_df()
    )


@register(
    "window_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(rank() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber) AS INT) AS rk,
           CAST(dense_rank() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber) AS INT) AS drk
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def window_rank(spark, sf_dir):
    """KQL row_rank_min / row_rank_dense."""
    t = _eng(spark, sf_dir).table("lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        F.col("l_quantity").desc(), F.col("l_linenumber").asc()
    )
    return (
        t.where(F.col("l_orderkey") < 500)
        .extend(rk=F.rank().over(w), drk=F.dense_rank().over(w))
        .project("l_orderkey", "l_linenumber", "rk", "drk")
        .to_df()
    )


@register(
    "window_session",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id < 20
    ), sess AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def window_session(spark, sf_dir):
    """KQL row_window_session: sessionize by 30-min inactivity gap —
    lag + gap-flag + cumulative sum (the batch realization; streaming
    uses session_window(), meerkat_spark/streaming)."""
    t = _eng(spark, sf_dir).table("events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wsum = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > 1_800_000_000),
        1,
    ).otherwise(0)
    return (
        t.where(F.col("user_id") < 20)
        .extend(new_session=new_session)
        .extend(session_id=F.sum("new_session").over(wsum).cast("long"))
        .summarize({"n_events": F.count(F.lit(1))}, by=["user_id", "session_id"])
        .to_df()
    )


@register(
    "window_session_native",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id < 20
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM gaps
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def window_session_native(spark, sf_dir):
    """Spark's NATIVE session_window (gap-merge sessionization, the
    batch form of streaming session windows) — oracled against the
    first-principles lag/cumsum SQL. Verified at the boundary: events
    exactly `gap` apart MERGE (inclusive), so the oracle's new-session
    flag is strict `>`."""
    t = _eng(spark, sf_dir).table("events")
    return (
        t.where(F.col("user_id") < 20)
        .to_df()
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


@register(
    "top_nested",
    oracle="""
    WITH region_counts AS (
      SELECT r_name, COUNT(*) AS n_cust
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
    ), top_regions AS (
      SELECT r_name, n_cust,
             row_number() OVER (ORDER BY n_cust DESC, r_name) AS rr
      FROM region_counts
    ), nation_counts AS (
      SELECT r_name, n_name, COUNT(*) AS n_cust_nation
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    ), ranked_nations AS (
      SELECT r_name, n_name, n_cust_nation,
             row_number() OVER (PARTITION BY r_name
                                ORDER BY n_cust_nation DESC, n_name) AS rn
      FROM nation_counts
    )
    SELECT t.r_name, t.n_cust, rn_tab.n_name, rn_tab.n_cust_nation
    FROM top_regions t
    JOIN ranked_nations rn_tab ON t.r_name = rn_tab.r_name
    WHERE t.rr <= 3 AND rn_tab.rn <= 2
    """,
)
def top_nested(spark, sf_dir):
    """KQL top-nested: top 3 regions by customer count, then top 2
    nations within each (deterministic tiebreak on names)."""
    e = _eng(spark, sf_dir)
    base = (
        e.table("customer")
        .lookup(e.table("nation"), on=F.col("c_nationkey") == F.col("n_nationkey"))
        .lookup(e.table("region"), on=F.col("n_regionkey") == F.col("r_regionkey"))
        .to_df()
    )
    region_counts = base.groupBy("r_name").agg(F.count(F.lit(1)).alias("n_cust"))
    top_regions = (
        region_counts.withColumn(
            "rr",
            F.row_number().over(
                W.orderBy(F.col("n_cust").desc(), F.col("r_name").asc())
            ),
        )
        .filter(F.col("rr") <= 3)
        .drop("rr")
    )
    nation_counts = base.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust_nation")
    )
    ranked = nation_counts.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("r_name").orderBy(
                F.col("n_cust_nation").desc(), F.col("n_name").asc()
            )
        ),
    ).filter(F.col("rn") <= 2)
    return (
        top_regions.join(ranked.drop("rn"), "r_name", "inner")
        .select("r_name", "n_cust", "n_name", "n_cust_nation")
    )


@register(
    "make_series_daily",
    oracle="""
    WITH days AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-30',
                                    INTERVAL '1 day')) AS day
    ), types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
      SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n,
             ROUND(SUM(value), 4) AS v
      FROM events GROUP BY event_type, day
    )
    SELECT t.event_type, d.day,
           COALESCE(c.n, 0) AS n,
           COALESCE(c.v, 0.0) AS v
    FROM types t CROSS JOIN days d
    LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day
    """,
)
def make_series_daily(spark, sf_dir):
    """KQL make-series n=count(), v=sum(value) default 0 on ts from … to …
    step 1d by event_type — dense grid (type × day) with zero-fill,
    then mv-expanded back to rows for comparison.

    Scale notes: the day grid is sequence()-generated per group key
    (small), joined to pre-aggregated per-day counts — the heavy input
    is reduced FIRST (partial agg), the dense grid join touches only
    group × step rows."""
    e = _eng(spark, sf_dir)
    counts = (
        e.table("events")
        .extend(day=F.date_trunc("day", F.col("ts")))
        .summarize(
            {"n": F.count(F.lit(1)), "v": F.round(F.sum("value"), 4)},
            by=["event_type", "day"],
        )
        .to_df()
    )
    types = e.table("events").distinct("event_type").to_df()
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("timestamp"),
                F.lit("2024-01-30").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    grid = types.crossJoin(days)
    return (
        grid.join(counts, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("v"), F.lit(0.0)).alias("v"),
        )
    )


@register(
    "pivot_event_types",
    oracle="""
    SELECT CAST(EXTRACT(day FROM ts) AS INT) AS day_of_month,
           COALESCE(COUNT(CASE WHEN event_type = 'click' THEN 1 END), 0) AS click,
           COALESCE(COUNT(CASE WHEN event_type = 'view' THEN 1 END), 0) AS view,
           COALESCE(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS purchase,
           COALESCE(COUNT(CASE WHEN event_type = 'error' THEN 1 END), 0) AS error,
           COALESCE(COUNT(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS signup
    FROM events GROUP BY day_of_month
    """,
)
def pivot_event_types(spark, sf_dir):
    """KQL evaluate pivot(event_type, count()) by day-of-month. Explicit
    value list → no extra distinct-discovery job at scale."""
    e = _eng(spark, sf_dir)
    kinds = ["click", "view", "purchase", "error", "signup"]
    df = (
        e.table("events")
        .extend(day_of_month=F.dayofmonth("ts"))
        .to_df()
        .groupBy("day_of_month")
        .pivot("event_type", kinds)
        .count()
    )
    return df.select(
        "day_of_month",
        *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds],
    )


@register(
    "bag_unpack",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events WHERE event_id < 500
    """,
)
def bag_unpack(spark, sf_dir):
    """KQL evaluate bag_unpack(props) — pivot dynamic-bag keys into
    columns via from_json with the bag schema."""
    e = _eng(spark, sf_dir)
    t = e.table("events").where(F.col("event_id") < 500)
    parsed = t.extend(_bag=F.from_json(F.col("props"), "k BIGINT"))
    return parsed.project("event_id", k=F.col("_bag.k")).to_df()


@register(
    "window_session_greedy",
    oracle="""
    WITH RECURSIVE src AS (
      SELECT epoch_us(ts) AS us,
             row_number() OVER (ORDER BY ts, event_id) AS rn
      FROM events WHERE user_id < 5
    ), rec AS (
      SELECT rn, us, us AS sess FROM src WHERE rn = 1
      UNION ALL
      SELECT s.rn, s.us,
             CASE WHEN s.us - r.us > 28800000000
                    OR s.us - r.sess > 43200000000
                  THEN s.us ELSE r.sess END
      FROM src s JOIN rec r ON s.rn = r.rn + 1
    )
    SELECT make_timestamp(sess) AS sid, COUNT(*) AS n
    FROM rec GROUP BY 1
    """,
)
def window_session_greedy(spark, sf_dir):
    """Round-7: KQL row_window_session with Kusto-EXACT greedy
    MaxDuration — a session restarts at the first row breaching
    session_start + MaxDuration (data-dependent, not aligned
    sub-buckets of the idle-segment start). The DuckDB twin replays the
    literal greedy recurrence as a recursive CTE (one step per row —
    the scan-funnel oracle pattern). Engine path:
    kql/translator.py row_window_session → operators/sessionize.py
    greedy_session_first (idle breaks window-computed, greedy pass
    distributed per idle segment via applyInPandas)."""
    return (
        _eng(spark, sf_dir)
        .kql(
            "events | where user_id < 5 | sort by ts asc, event_id asc"
            " | extend sid = row_window_session(ts, 12h, 8h)"
            " | summarize n = count() by sid"
        )
        .to_df()
    )


@register(
    "partition_window_funcs",
    oracle="""
    SELECT event_id, user_id,
           CAST(row_number() OVER w AS INT) AS rn,
           lag(value) OVER w AS pv,
           sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def partition_window_funcs(spark, sf_dir):
    """Round-7: window functions inside `partition by` compile KEYED —
    row_number/prev/row_cumsum restart per partition key and shuffle on
    it (the scale path the partition-less serialize guard points at),
    exactly Kusto's per-partition subquery semantics
    (kql/translator.py ap_partition)."""
    return (
        _eng(spark, sf_dir)
        .kql(
            "events | partition by user_id ("
            " sort by ts asc, event_id asc"
            " | extend rn = row_number(), pv = prev(value),"
            "   cs = row_cumsum(value))"
            " | project event_id, user_id, rn, pv, cs"
        )
        .to_df()
    )
