"""Temporal operators suite: as-of join and range join, oracle-checked
against DuckDB (which has native ASOF JOIN — an exact semantic oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.engine import MeerkatEngine
from meerkat_spark.operators import asof_join, range_join
from meerkat_spark.suite import register


@register(
    "asof_join_events",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id, p.event_id, c.value AS value_asof, c.ts AS ts_asof
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def asof_join_events(spark, sf_dir):
    """For every purchase, the user's most recent prior click value —
    checked against DuckDB's native ASOF JOIN. Spark realization:
    union+window (operators/asof.py), one shuffle on the key."""
    e = MeerkatEngine(spark, sf_dir)
    ev = e.table("events").to_df()
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join(purchases, clicks, ts_col="ts", by="user_id", value_cols=["value"])
    return out.select("user_id", "event_id", "value_asof", "ts_asof")


@register(
    "salted_join_skew",
    oracle="""
    SELECT n_name, COUNT(*) AS n_cust, ROUND(SUM(c_acctbal), 2) AS bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def salted_join_skew(spark, sf_dir):
    """Salted skew-resistant join (operators/skew.py) — semantically
    identical to the plain equi-join (the oracle), with the fact side
    spread over 8 salt buckets per key."""
    from meerkat_spark.operators import salted_join

    e = MeerkatEngine(spark, sf_dir)
    cust = e.table("customer").to_df().withColumnRenamed("c_nationkey", "nk")
    nat = e.table("nation").to_df().withColumnRenamed("n_nationkey", "nk")
    joined = salted_join(cust, nat, on="nk", salt_buckets=8)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("bal"),
    )


@register(
    "range_join_price_bands",
    oracle="""
    WITH bands AS (
      SELECT x * 50000.0 AS lo, (x + 1) * 50000.0 - 0.01 AS hi,
             'band_' || CAST(x AS VARCHAR) AS band
      FROM generate_series(0, 11) t(x)
    )
    SELECT o_orderkey, band
    FROM orders JOIN bands ON o_totalprice BETWEEN lo AND hi
    """,
)
def range_join_price_bands(spark, sf_dir):
    """Points (order prices) joined to enclosing bands via the bucketed
    range join — equi-join on bucket instead of BroadcastNestedLoop."""
    e = MeerkatEngine(spark, sf_dir)
    orders = e.table("orders").to_df().select("o_orderkey", "o_totalprice")
    bands = spark.range(0, 12).select(
        (F.col("id") * 50000.0).alias("lo"),
        ((F.col("id") + 1) * 50000.0 - 0.01).alias("hi"),
        F.concat(F.lit("band_"), F.col("id").cast("string")).alias("band"),
    )
    joined = range_join(
        orders, bands, point_col="o_totalprice", lo_col="lo", hi_col="hi",
        bucket_width=50000.0,
    )
    return joined.select("o_orderkey", "band")


@register(
    "rows_near_errors",
    oracle="""
    WITH f AS (
      SELECT event_id, event_type,
             max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER (
               ORDER BY ts, event_id
               ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING) AS nearf
      FROM events
    )
    SELECT event_id, event_type FROM f WHERE nearf = 1 ORDER BY event_id
    """,
)
def rows_near_errors(spark, sf_dir):
    """Kusto `evaluate rows_near`: every event within 2 rows before or
    1 row after an error, on the (ts, event_id) serialization order —
    one bounded ROWS window (operators/temporalagg.py), frame
    [-after, +before] over the condition flag."""
    from meerkat_spark.operators.temporalagg import rows_near

    ev = MeerkatEngine(spark, sf_dir).table("events").to_df()
    out = rows_near(
        ev,
        F.col("event_type") == "error",
        ["ts", "event_id"],
        rows_before=2,
        rows_after=1,
    )
    return out.select("event_id", "event_type").orderBy("event_id")


@register(
    "sliding_window_counts_op",
    oracle="""
    WITH grid AS (
      SELECT g AS t
      FROM generate_series(TIMESTAMP '2024-01-08 00:00:00',
                           TIMESTAMP '2024-01-28 00:00:00',
                           INTERVAL 1 DAY) AS s(g)
    )
    SELECT grid.t,
           count(e.user_id) AS wnd_count,
           count(DISTINCT e.user_id) AS wnd_dcount
    FROM grid LEFT JOIN events e
      ON e.ts > grid.t - INTERVAL 7 DAY AND e.ts <= grid.t
    GROUP BY grid.t ORDER BY grid.t
    """,
)
def sliding_window_counts_op(spark, sf_dir):
    """Kusto `evaluate sliding_window_counts`: per daily grid point,
    events and distinct users in the trailing 7-day window. Spark path
    (operators/temporalagg.py) explodes each event to the ≤7 grid
    points covering it (exact integer-µs bin math) then aggregates on
    the bin key once — no events×grid range join, no per-bin rescan."""
    from meerkat_spark.operators.temporalagg import sliding_window_counts

    ev = MeerkatEngine(spark, sf_dir).table("events").to_df()
    out = sliding_window_counts(
        ev,
        id_col="user_id",
        time_col="ts",
        start="2024-01-08",
        end="2024-01-28",
        lookback_sec=7 * 86400,
        bin_sec=86400,
    )
    return out.select(
        "t",
        F.col("Count").alias("wnd_count"),
        F.col("Dcount").alias("wnd_dcount"),
    )


@register(
    "rolling_percentile_op",
    oracle="""
    WITH b AS (
      SELECT value,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS bb
      FROM events
    ), bounds AS (
      SELECT min(bb) AS lo, max(bb) AS hi FROM b
    ), ex AS (
      SELECT b.value, b.bb + s.j AS tb
      FROM b CROSS JOIN generate_series(0, 6) AS s(j)
    )
    SELECT make_timestamp(tb * 86400000000) AS t,
           round(quantile_cont(value, 0.5), 4) AS p50
    FROM ex, bounds
    WHERE tb BETWEEN bounds.lo AND bounds.hi
    GROUP BY tb ORDER BY t
    """,
)
def rolling_percentile_op(spark, sf_dir):
    """Kusto `evaluate rolling_percentile`: per daily bin, the exact
    interpolated median of `value` over the current + 6 preceding bins
    (explode-to-bins + one percentile aggregation; same linear-
    interpolation convention both engines, rounded 4dp)."""
    from meerkat_spark.operators.temporalagg import rolling_percentile

    ev = MeerkatEngine(spark, sf_dir).table("events").to_df()
    return rolling_percentile(
        ev,
        value_col="value",
        percentile=0.5,
        time_col="ts",
        bin_sec=86400,
        bins_per_window=7,
    )


@register(
    "activity_counts_metrics_op",
    oracle="""
    WITH binned AS (
      SELECT user_id,
             CAST(floor((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01'))
                        / 86400000000) AS BIGINT) AS k
      FROM events
    ), b AS (
      SELECT * FROM binned WHERE k BETWEEN 0 AND 29
    ), grid AS (
      SELECT unnest(range(0, 30)) AS k
    ), per_bin AS (
      SELECT k, count(*) AS cnt, count(distinct user_id) AS dc
      FROM b GROUP BY k
    ), fs AS (
      SELECT user_id, min(k) AS k FROM b GROUP BY user_id
    ), nd AS (
      SELECT k, count(*) AS ndc FROM fs GROUP BY k
    ), j AS (
      SELECT grid.k,
             coalesce(cnt, 0) AS n_events,
             coalesce(dc, 0) AS n_users,
             coalesce(ndc, 0) AS new_users
      FROM grid LEFT JOIN per_bin USING (k) LEFT JOIN nd USING (k)
    )
    SELECT make_timestamp(k * 86400000000
                          + epoch_us(TIMESTAMP '2024-01-01')) AS t,
           n_events, n_users, new_users,
           CAST(sum(new_users) OVER (ORDER BY k) AS BIGINT) AS agg_users
    FROM j ORDER BY t
    """,
)
def activity_counts_metrics_op(spark, sf_dir):
    """Kusto `evaluate activity_counts_metrics`: per daily bin —
    events, distinct users, first-time users, and the cumulative
    distinct-user curve (running sum of first appearances; exact
    without per-prefix re-counting). operators/temporalagg.py."""
    from meerkat_spark.operators.temporalagg import activity_counts_metrics

    ev = MeerkatEngine(spark, sf_dir).table("events").to_df()
    out = activity_counts_metrics(
        ev,
        id_col="user_id",
        time_col="ts",
        start="2024-01-01",
        end="2024-01-30",
        bin_sec=86400,
    )
    return out.select(
        "t",
        F.col("count").alias("n_events"),
        F.col("dcount").alias("n_users"),
        F.col("new_dcount").alias("new_users"),
        F.col("aggregated_dcount").alias("agg_users"),
    )


@register(
    "retention_matrix_op",
    oracle="""
    WITH binned AS (
      SELECT DISTINCT user_id,
             CAST(floor((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01'))
                        / 604800000000) AS BIGINT) AS k
      FROM events
    ), b AS (
      SELECT * FROM binned WHERE k BETWEEN 0 AND 4
    ), cohort AS (
      SELECT user_id, min(k) AS c FROM b GROUP BY user_id
    ), cell AS (
      SELECT c, k, count(*) AS retained
      FROM b JOIN cohort USING (user_id) GROUP BY c, k
    ), sz AS (
      SELECT c, count(*) AS cohort_size FROM cohort GROUP BY c
    )
    SELECT make_timestamp(c * 604800000000
                          + epoch_us(TIMESTAMP '2024-01-01')) AS cohort,
           make_timestamp(k * 604800000000
                          + epoch_us(TIMESTAMP '2024-01-01')) AS t,
           cohort_size, retained,
           round(retained * 1.0 / cohort_size, 4) AS retention_rate
    FROM cell JOIN sz USING (c)
    ORDER BY cohort, t
    """,
)
def retention_matrix_op(spark, sf_dir):
    """Weekly cohort retention triangle over events (Kusto
    new_activity_metrics' deterministic core): first-activity week ×
    activity week → retained users and retention rate
    (operators/temporalagg.py)."""
    from meerkat_spark.operators.temporalagg import retention_metrics

    ev = MeerkatEngine(spark, sf_dir).table("events").to_df()
    return retention_metrics(
        ev,
        id_col="user_id",
        time_col="ts",
        start="2024-01-01",
        end="2024-01-29",
        bin_sec=7 * 86400,
    )


@register(
    "active_users_count_op",
    oracle="""
    WITH grid AS (
      SELECT g AS t
      FROM generate_series(TIMESTAMP '2024-01-08',
                           TIMESTAMP '2024-01-28',
                           INTERVAL 1 DAY) AS s(g)
    ), hits AS (
      SELECT DISTINCT grid.t, e.user_id,
             CAST(floor((epoch_us(grid.t) - epoch_us(e.ts))
                        / 86400000000) AS BIGINT) AS j
      FROM grid JOIN events e
        ON e.ts > grid.t - INTERVAL 7 DAY AND e.ts <= grid.t
    ), per_id AS (
      SELECT t, user_id, count(*) AS nper FROM hits GROUP BY t, user_id
    ), act AS (
      SELECT t, count(*) AS active_users FROM per_id WHERE nper >= 3 GROUP BY t
    )
    SELECT grid.t, coalesce(act.active_users, 0) AS active_users
    FROM grid LEFT JOIN act USING (t) ORDER BY grid.t
    """,
)
def active_users_count_op(spark, sf_dir):
    """Kusto `evaluate active_users_count`: per day, users active on
    ≥3 distinct days of the trailing 7-day window (the fuzzy-MAU
    metric; operators/temporalagg.py — explode-to-bins + two keyed
    aggregations, no per-bin rescans)."""
    from meerkat_spark.operators.temporalagg import active_users_count

    ev = MeerkatEngine(spark, sf_dir).table("events").to_df()
    return active_users_count(
        ev,
        id_col="user_id",
        time_col="ts",
        start="2024-01-08",
        end="2024-01-28",
        lookback_sec=7 * 86400,
        period_sec=86400,
        min_active_periods=3,
        bin_sec=86400,
    )


@register(
    "funnel_sequence_op",
    oracle="""
    WITH base AS (
      SELECT user_id AS id, ts, event_type AS st FROM events
    ), dedup AS (
      SELECT id, ts, st FROM (
        SELECT id, ts, st,
               lag(st) OVER (PARTITION BY id ORDER BY ts, st) AS pst
        FROM base
      ) WHERE pst IS NULL OR st <> pst
    ), ext AS (
      SELECT id, ts, st,
             lead(st, 1) OVER w AS s1, lead(st, 2) OVER w AS s2,
             lag(st) OVER w AS prev, lead(st, 3) OVER w AS next,
             lead(ts, 1) OVER w AS t1, lead(ts, 2) OVER w AS t2
      FROM dedup WINDOW w AS (PARTITION BY id ORDER BY ts, st)
    ), hits AS (
      SELECT * FROM ext
      WHERE st = 'view' AND s1 = 'click' AND s2 = 'purchase'
        AND epoch_us(t1) - epoch_us(ts) <= 86400000000
        AND epoch_us(t2) - epoch_us(t1) <= 86400000000
    )
    SELECT prev, next, count(distinct id) AS dcount
    FROM hits GROUP BY prev, next
    ORDER BY dcount DESC, prev NULLS FIRST, next NULLS FIRST
    """,
)
def funnel_sequence_op(spark, sf_dir):
    """Kusto `evaluate funnel_sequence`: what users do immediately
    before and after the view→click→purchase funnel (≤1d between
    steps, consecutive duplicate states collapsed). One per-id window
    pass (operators/temporalagg.py), no self-joins."""
    from meerkat_spark.operators.temporalagg import funnel_sequence

    ev = MeerkatEngine(spark, sf_dir).table("events").to_df()
    return funnel_sequence(
        ev,
        id_col="user_id",
        time_col="ts",
        state_col="event_type",
        sequence=["view", "click", "purchase"],
        max_step_sec=86400,
    )


@register(
    "session_count_op",
    oracle="""
    WITH grid AS (
      SELECT g AS t
      FROM generate_series(TIMESTAMP '2024-01-02',
                           TIMESTAMP '2024-01-12',
                           INTERVAL 1 DAY) AS s(g)
    ), act AS (
      SELECT grid.t, count(DISTINCT e.user_id) AS count_sessions
      FROM grid JOIN events e
        ON e.ts > grid.t - INTERVAL 2 DAY AND e.ts <= grid.t
      GROUP BY grid.t
    )
    SELECT grid.t, coalesce(act.count_sessions, 0) AS count_sessions
    FROM grid LEFT JOIN act USING (t) ORDER BY grid.t
    """,
)
def session_count_op(spark, sf_dir):
    """Kusto `evaluate session_count`: active sessions per daily bin —
    an id's session is active at t iff it has an event in the trailing
    2-day lookback (operators/temporalagg.py, explode-to-bins +
    one keyed distinct aggregation; never events×grid)."""
    from meerkat_spark.operators.temporalagg import session_count

    ev = MeerkatEngine(spark, sf_dir).table("events").to_df()
    return session_count(
        ev, id_col="user_id", time_col="ts",
        start="2024-01-02", end="2024-01-12",
        bin_sec=86400, lookback_sec=2 * 86400,
    )


@register(
    "activity_engagement_op",
    oracle="""
    WITH grid AS (
      SELECT g AS t
      FROM generate_series(TIMESTAMP '2024-01-02',
                           TIMESTAMP '2024-01-15',
                           INTERVAL 1 DAY) AS s(g)
    ), i AS (
      SELECT grid.t, count(DISTINCT e.user_id) AS d
      FROM grid JOIN events e
        ON e.ts > grid.t - INTERVAL 1 DAY AND e.ts <= grid.t
      GROUP BY grid.t
    ), o AS (
      SELECT grid.t, count(DISTINCT e.user_id) AS d
      FROM grid JOIN events e
        ON e.ts > grid.t - INTERVAL 7 DAY AND e.ts <= grid.t
      GROUP BY grid.t
    )
    SELECT grid.t,
           coalesce(i.d, 0) AS dcount_activities_inner,
           coalesce(o.d, 0) AS dcount_activities_outer,
           CASE WHEN coalesce(o.d, 0) = 0 THEN 0.0
                ELSE round(coalesce(i.d, 0) * 1.0 / o.d, 6) END
             AS activity_ratio
    FROM grid LEFT JOIN i USING (t) LEFT JOIN o USING (t)
    ORDER BY grid.t
    """,
)
def activity_engagement_op(spark, sf_dir):
    """Kusto `evaluate activity_engagement` — the DAU/MAU ratio:
    daily timeline, 1-day inner window over a 7-day outer window
    (operators/temporalagg.py — one explode-to-bins pass per window
    length, amplification = outer/inner, keyed aggregations)."""
    from meerkat_spark.operators.temporalagg import activity_engagement

    ev = MeerkatEngine(spark, sf_dir).table("events").to_df()
    return activity_engagement(
        ev, id_col="user_id", time_col="ts",
        start="2024-01-01", end="2024-01-15",
        inner_sec=86400, outer_sec=7 * 86400,
    )


@register(
    "sequence_detect_op",
    oracle="""
    WITH e AS (
      SELECT user_id AS id, ts, event_type AS st FROM events
    ), s1 AS (
      SELECT id, ts AS view_t FROM e WHERE st = 'view'
    ), m2 AS (
      SELECT id, view_t,
             (SELECT min(x.ts) FROM e x
               WHERE x.id = s1.id AND x.st = 'click' AND x.ts > s1.view_t
                 AND epoch_us(x.ts) - epoch_us(s1.view_t) <= 43200000000)
               AS click_t
      FROM s1
    ), m3 AS (
      SELECT id, view_t, click_t,
             (SELECT min(x.ts) FROM e x
               WHERE x.id = m2.id AND x.st = 'purchase' AND x.ts > m2.click_t
                 AND epoch_us(x.ts) - epoch_us(m2.click_t) <= 43200000000)
               AS purchase_t
      FROM m2 WHERE click_t IS NOT NULL
    )
    SELECT id AS user_id, view_t, click_t, purchase_t,
           round((epoch_us(purchase_t) - epoch_us(view_t)) / 1000000.0, 6)
             AS duration
    FROM m3
    WHERE purchase_t IS NOT NULL
      AND epoch_us(purchase_t) - epoch_us(view_t) <= 64800000000
    ORDER BY user_id, view_t
    """,
)
def sequence_detect_op(spark, sf_dir):
    """Kusto `evaluate sequence_detect`: view→click→purchase chains,
    each step within 12h of the previous and the whole span within 18h
    (operators/temporalagg.py — K-1 forward as-of passes on the id
    key; the oracle's correlated min() subqueries are the same
    greedy-earliest chaining)."""
    from meerkat_spark.operators.temporalagg import sequence_detect

    ev = MeerkatEngine(spark, sf_dir).table("events").to_df()
    return sequence_detect(
        ev, id_col="user_id", time_col="ts",
        exprs=[
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        max_step_sec=12 * 3600, max_span_sec=18 * 3600,
        names=["view_t", "click_t", "purchase_t"],
    )


@register(
    "funnel_completion_op",
    oracle="""
    WITH e AS (
      SELECT user_id AS id, ts, event_type AS st FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-01-15'
    ), s1 AS (
      SELECT id, ts AS t1 FROM e WHERE st = 'view'
    ), m2 AS (
      SELECT id, t1,
             (SELECT min(x.ts) FROM e x
               WHERE x.id = s1.id AND x.st = 'click' AND x.ts > s1.t1) AS t2
      FROM s1
    ), m3 AS (
      SELECT id, t1, t2,
             (SELECT min(x.ts) FROM e x
               WHERE x.id = m2.id AND x.st = 'purchase' AND x.ts > m2.t2) AS t3
      FROM m2 WHERE t2 IS NOT NULL
    ), p1 AS (
      SELECT CAST(floor((epoch_us(t1)
               - epoch_us(TIMESTAMP '2024-01-01')) / 86400000000) AS BIGINT)
               AS k,
             'view' AS state, count(DISTINCT id) AS dcount
      FROM s1 GROUP BY 1
    ), p2 AS (
      SELECT CAST(floor((epoch_us(t1)
               - epoch_us(TIMESTAMP '2024-01-01')) / 86400000000) AS BIGINT)
               AS k,
             'click' AS state, count(DISTINCT id) AS dcount
      FROM m2
      WHERE t2 IS NOT NULL
        AND epoch_us(t2) - epoch_us(t1) <= 86400000000
      GROUP BY 1
    ), p3 AS (
      SELECT CAST(floor((epoch_us(t1)
               - epoch_us(TIMESTAMP '2024-01-01')) / 86400000000) AS BIGINT)
               AS k,
             'purchase' AS state, count(DISTINCT id) AS dcount
      FROM m3
      WHERE t3 IS NOT NULL
        AND epoch_us(t3) - epoch_us(t1) <= 172800000000
      GROUP BY 1
    ), u AS (
      SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3
    )
    SELECT make_timestamp(k * 86400000000
             + epoch_us(TIMESTAMP '2024-01-01')) AS t,
           state, dcount
    FROM u ORDER BY t, state
    """,
)
def funnel_completion_op(spark, sf_dir):
    """Kusto `evaluate funnel_sequence_completion`: per daily bin, the
    distinct users whose view→click→purchase funnel (started in the
    bin) completed each prefix within its window (1d, 1d, 2d from
    start; operators/temporalagg.py — the sequence_detect chain plus
    one keyed distinct aggregate per prefix)."""
    from meerkat_spark.operators.temporalagg import funnel_sequence_completion

    ev = MeerkatEngine(spark, sf_dir).table("events").to_df()
    return funnel_sequence_completion(
        ev, id_col="user_id", time_col="ts", state_col="event_type",
        sequence=["view", "click", "purchase"],
        max_window_sec=[86400, 86400, 2 * 86400],
        start="2024-01-01", end="2024-01-15", bin_sec=86400,
    )


@register(
    "activity_metrics_op",
    oracle="""
    WITH actives AS (
      SELECT DISTINCT user_id AS id,
             CAST(floor((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01'))
                        / 86400000000.0) AS BIGINT) AS k
      FROM events
    ), inrange AS (
      SELECT * FROM actives WHERE k BETWEEN 0 AND 14
    ), per_bin AS (
      SELECT k, COUNT(*)::BIGINT AS d FROM inrange GROUP BY k
    ), retained AS (
      SELECT a.k, COUNT(*)::BIGINT AS r
      FROM inrange a JOIN inrange b ON a.id = b.id AND b.k = a.k + 1
      GROUP BY a.k
    ), news AS (
      SELECT k, COUNT(*)::BIGINT AS nw
      FROM (SELECT id, MIN(k) AS k FROM inrange GROUP BY id) GROUP BY k
    ), grid AS (SELECT range AS k FROM range(0, 15))
    SELECT TIMESTAMP '2024-01-01' + to_microseconds(k * 86400000000) AS t,
           COALESCE(d, 0)::BIGINT AS dcount_values,
           COALESCE(nw, 0)::BIGINT AS dcount_newvalues,
           CASE WHEN k < 14 AND COALESCE(d, 0) > 0
                THEN round(COALESCE(r, 0) / d, 6) ELSE 0.0 END
             AS retention_rate,
           CASE WHEN k < 14 AND COALESCE(d, 0) > 0
                THEN round((d - COALESCE(r, 0)) / d, 6) ELSE 0.0 END
             AS churn_rate
    FROM grid LEFT JOIN per_bin USING (k)
              LEFT JOIN retained USING (k)
              LEFT JOIN news USING (k)
    ORDER BY t
    """,
)
def activity_metrics_op(spark, sf_dir):
    """evaluate activity_metrics (operators/temporalagg.py): per-bin
    distinct actives, first-ever ids, and next-bin retention/churn
    rates. Retained = ONE self-equi-join of the distinct (bin, id)
    table on (id, bin+1) — co-keyed shuffle, no set collection."""
    return (
        MeerkatEngine(spark, sf_dir)
        .kql(
            """events
               | evaluate activity_metrics(user_id, ts,
                   datetime(2024-01-01), datetime(2024-01-15), 1d)"""
        )
        .to_df()
    )


@register(
    "rollup_incremental",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS _rollup_day,
           event_type,
           COUNT(value)::BIGINT AS n,
           ROUND(SUM(CAST(value AS DOUBLE)), 4) AS s,
           -- avg = rounded-sum / count, UNROUNDED: the 4dp sums are
           -- engine-identical doubles, so the IEEE division is too —
           -- an outer ROUND would re-introduce exact-tie divergence
           -- (engines round shortest-repr vs true binary at .5)
           ROUND(SUM(CAST(value AS DOUBLE)), 4) / COUNT(value) AS a,
           MIN(CAST(value AS DOUBLE)) AS mn,
           MAX(CAST(value AS DOUBLE)) AS mx,
           ROUND(VAR_SAMP(CAST(value AS DOUBLE)), 2) AS v
    FROM events
    GROUP BY 1, 2
    """,
)
def rollup_incremental(spark, sf_dir):
    """Incremental rollup lifecycle (ingest/rollup.py): BUILD the
    stored merge states from half the corpus, EXTEND with the other
    half (only touched day partitions rewritten), QUERY the finalized
    aggregates — must equal one direct aggregation over everything.
    Merge states are associative, so the split is invisible modulo
    double summation order (4dp/2dp rounding per the determinism
    rules)."""
    import shutil
    import tempfile

    from meerkat_spark.ingest.rollup import (
        rollup_build,
        rollup_extend,
        rollup_query,
    )

    ev = MeerkatEngine(spark, sf_dir).table("events").to_df()
    path = tempfile.mkdtemp(prefix="mk_rollup_") + "/store"
    rollup_build(
        ev.filter(F.col("event_id") % 2 == 0), path, ["event_type"], "ts", "value"
    )
    rollup_extend(
        ev.filter(F.col("event_id") % 2 == 1), path, ["event_type"], "ts", "value"
    )
    out = rollup_query(spark, path).select(
        # the day partition column reads back as DATE — string for the
        # cross-engine compare
        F.col("_rollup_day").cast("string").alias("_rollup_day"),
        "event_type",
        F.col("count").alias("n"),
        F.round("sum", 4).alias("s"),
        (F.round("sum", 4) / F.col("count")).alias("a"),
        F.col("min").alias("mn"),
        F.col("max").alias("mx"),
        F.round("variance", 2).alias("v"),
    )
    # coalesce(1): the finalized rollup is (days x types) ~ 150 rows
    # read from one file per day partition — materializing it as 30
    # single-row cached partitions costs 30 task launches on every
    # downstream scan for zero parallelism benefit
    out = out.coalesce(1).cache()
    out.count()  # materialize before the temp store could be cleaned
    shutil.rmtree(path.rsplit("/", 1)[0], ignore_errors=True)
    return out


@register(
    "new_activity_metrics_op",
    oracle="""
    WITH b AS (
      SELECT DISTINCT user_id,
             CAST(floor((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01'))
                        / 604800000000) AS BIGINT) AS k
      FROM events
      WHERE epoch_us(ts) >= epoch_us(TIMESTAMP '2024-01-01')
        AND epoch_us(ts) <= epoch_us(TIMESTAMP '2024-02-05')
    ), cohort AS (
      SELECT user_id, min(k) AS f FROM b GROUP BY user_id
    ), sizes AS (
      SELECT f, count(*) AS n FROM cohort GROUP BY f
    ), ret AS (
      SELECT c.f, b.k AS t, count(*) AS r
      FROM cohort c JOIN b ON b.user_id = c.user_id AND b.k >= c.f
      GROUP BY c.f, b.k
    )
    SELECT make_timestamp(f * 604800000000 + epoch_us(TIMESTAMP '2024-01-01')) AS from_ts,
           make_timestamp(t * 604800000000 + epoch_us(TIMESTAMP '2024-01-01')) AS to_ts,
           CAST(n AS BIGINT) AS dcount_new_values,
           CAST(r AS BIGINT) AS dcount_retained_values,
           CAST(n - r AS BIGINT) AS dcount_churn_values,
           ROUND(CAST(r AS DOUBLE) / n, 6) AS retention_rate,
           ROUND(CAST(n - r AS DOUBLE) / n, 6) AS churn_rate
    FROM ret JOIN sizes USING (f)
    """,
)
def new_activity_metrics_op(spark, sf_dir):
    """Kusto `evaluate new_activity_metrics`: cohort retention — for
    every (from, to) weekly bin pair, the from-bin cohort (first-ever
    activity there), how many stayed active at to, and the churn
    complement (operators/temporalagg.py:new_activity_metrics)."""
    return (
        MeerkatEngine(spark, sf_dir)
        .kql(
            """events | evaluate new_activity_metrics(user_id, ts,
                 datetime(2024-01-01), datetime(2024-02-05), 7d)"""
        )
        .to_df()
    )
