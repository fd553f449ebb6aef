"""Known-answer tests for the Kusto time-series evaluate plugins
(operators/temporalagg.py): rows_near, sliding_window_counts,
rolling_percentile."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from meerkat_spark.operators.temporalagg import (
    rolling_percentile,
    rows_near,
    sliding_window_counts,
)


def _t(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def test_rows_near_window_and_defaults(spark):
    rows = [(i, "err" if i == 5 else "ok") for i in range(10)]
    df = spark.createDataFrame(rows, "i long, kind string")
    got = sorted(
        r.i
        for r in rows_near(
            df, F.col("kind") == "err", ["i"], rows_before=2, rows_after=1
        ).collect()
    )
    # condition at i=5 → rows [3, 6]: 2 before, itself, 1 after
    assert got == [3, 4, 5, 6]
    # rows_after defaults to rows_before
    sym = sorted(
        r.i
        for r in rows_near(df, F.col("kind") == "err", ["i"], rows_before=2).collect()
    )
    assert sym == [3, 4, 5, 6, 7]


def test_rows_near_partitioned(spark):
    rows = [(g, i, i == 2) for g in ("a", "b") for i in range(5)]
    df = spark.createDataFrame(rows, "g string, i long, hit boolean")
    got = {
        (r.g, r.i)
        for r in rows_near(
            df, F.col("hit"), ["i"], 1, 0, partition_by=["g"]
        ).collect()
    }
    assert got == {(g, i) for g in ("a", "b") for i in (1, 2)}


def test_sliding_window_counts_known(spark):
    # users 1,2 on day 2; user 1 again on day 5
    rows = [(1, _t(2)), (2, _t(2, 12)), (1, _t(5))]
    df = spark.createDataFrame(rows, "uid long, ts timestamp")
    out = {
        r.t: (r.Count, r.Dcount)
        for r in sliding_window_counts(
            df, "uid", "ts", _t(1), _t(7), lookback_sec=3 * 86400, bin_sec=86400
        ).collect()
    }
    assert len(out) == 7  # grid days 1..7 inclusive, empty bins present
    assert out[_t(1)] == (0, 0)
    assert out[_t(2)] == (1, 1)  # only 00:00 event ≤ day-2 boundary
    assert out[_t(3)] == (2, 2)
    assert out[_t(4)] == (2, 2)  # 3-day lookback still covers day 2
    # day-2 00:00 event ages out EXACTLY at day 5 (strict τ > t - L);
    # the 12:00 event and the day-5 event remain
    assert out[_t(5)] == (2, 2)
    assert out[_t(6)] == (1, 1)  # day-2 events aged out
    assert out[_t(7)] == (1, 1)


def test_rolling_percentile_known(spark):
    # one value per day, days 1..4; 2-bin window median
    rows = [(float(d), _t(d, 6)) for d in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "v double, ts timestamp")
    out = {
        r.t: r.p50
        for r in rolling_percentile(
            df, "v", 0.5, "ts", bin_sec=86400, bins_per_window=2
        ).collect()
    }
    assert out[_t(1)] == 1.0
    assert out[_t(2)] == 1.5  # median of {1, 2}
    assert out[_t(3)] == 2.5
    assert out[_t(4)] == 3.5


def test_activity_counts_metrics_known(spark):
    from meerkat_spark.operators.temporalagg import activity_counts_metrics

    # u1 on days 1+2, u2 on day 2 (twice), u3 on day 4
    rows = [(1, _t(1)), (1, _t(2)), (2, _t(2)), (2, _t(2, 6)), (3, _t(4))]
    df = spark.createDataFrame(rows, "uid long, ts timestamp")
    out = {
        r.t: (r["count"], r.dcount, r.new_dcount, r.aggregated_dcount)
        for r in activity_counts_metrics(
            df, "uid", "ts", _t(1), _t(4), bin_sec=86400
        ).collect()
    }
    assert out[_t(1)] == (1, 1, 1, 1)
    assert out[_t(2)] == (3, 2, 1, 2)  # u1 returns, u2 new (2 events)
    assert out[_t(3)] == (0, 0, 0, 2)  # quiet bin keeps the cumulative
    assert out[_t(4)] == (1, 1, 1, 3)


def test_retention_metrics_triangle(spark):
    from meerkat_spark.operators.temporalagg import retention_metrics

    # cohort day1 = {u1, u2}; u1 returns day2+day3, u2 never.
    # cohort day2 = {u3}; u3 returns day3.
    rows = [
        (1, _t(1)),
        (2, _t(1)),
        (1, _t(2)),
        (3, _t(2)),
        (1, _t(3)),
        (3, _t(3)),
        (1, _t(3, 12)),  # second same-day event must not double-count
    ]
    df = spark.createDataFrame(rows, "uid long, ts timestamp")
    out = {
        (r.cohort, r.t): (r.cohort_size, r.retained, r.retention_rate)
        for r in retention_metrics(
            df, "uid", "ts", _t(1), _t(3), bin_sec=86400
        ).collect()
    }
    assert out[(_t(1), _t(1))] == (2, 2, 1.0)
    assert out[(_t(1), _t(2))] == (2, 1, 0.5)
    assert out[(_t(1), _t(3))] == (2, 1, 0.5)
    assert out[(_t(2), _t(2))] == (1, 1, 1.0)
    assert out[(_t(2), _t(3))] == (1, 1, 1.0)
    # no cell for a bin where a cohort had zero activity before it
    assert (_t(2), _t(1)) not in out


def test_active_users_count_known(spark):
    from meerkat_spark.operators.temporalagg import active_users_count

    # u1 active on days 1,2,3; u2 has 3 events but all on day 1
    rows = [
        (1, _t(1)),
        (1, _t(2)),
        (1, _t(3)),
        (2, _t(1)),
        (2, _t(1, 6)),
        (2, _t(1, 12)),
    ]
    df = spark.createDataFrame(rows, "uid long, ts timestamp")
    out = {
        r.t: r.active_users
        for r in active_users_count(
            df,
            "uid",
            "ts",
            _t(1),
            _t(4),
            lookback_sec=3 * 86400,
            period_sec=86400,
            min_active_periods=2,
            bin_sec=86400,
        ).collect()
    }
    # Periods are 1d slices ending at the bin (Kusto semantics), NOT
    # calendar days: at t=Jan2 00:00, u2's Jan1 06:00/12:00 events fall
    # in period 0 ((Jan1,Jan2]) while Jan1 00:00 falls in period 1 —
    # so u2 spans 2 distinct periods despite one calendar day.
    assert out[_t(1)] == 0  # everyone has one period so far
    assert out[_t(2)] == 2  # u1 days 1+2; u2 periods {0,1}
    assert out[_t(3)] == 2
    # at t=Jan4 the window is (Jan1, Jan4]: u2's surviving events
    # (06:00, 12:00) both map to period 2 → only u1 qualifies
    assert out[_t(4)] == 1


def test_funnel_sequence_known(spark):
    from meerkat_spark.operators.temporalagg import funnel_sequence

    # u1: err → view → view → click → buy → home — the dup view
    #     collapses to its FIRST occurrence (1h), so the view→click
    #     gap is 2h: right at the cap
    # u2: view → click → buy (timeline edges → null prev/next)
    # u3: view → click ...11h gap... buy (violates the 2h step cap)
    rows = [
        (1, _t(1, 0), "err"),
        (1, _t(1, 1), "view"),
        (1, _t(1, 2), "view"),
        (1, _t(1, 3), "click"),
        (1, _t(1, 4), "buy"),
        (1, _t(1, 5), "home"),
        (2, _t(2, 0), "view"),
        (2, _t(2, 1), "click"),
        (2, _t(2, 2), "buy"),
        (3, _t(3, 0), "view"),
        (3, _t(3, 1), "click"),
        (3, _t(3, 12), "buy"),
    ]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, st string")
    out = {
        (r.prev, r.next): r.dcount
        for r in funnel_sequence(
            df, "uid", "ts", "st", ["view", "click", "buy"], max_step_sec=7200
        ).collect()
    }
    assert out == {("err", "home"): 1, (None, None): 1}


def test_session_count_known(spark):
    # uid 1: days 1 and 4; uid 2: day 2 — lookback 2d, daily bins 2..6
    rows = [(1, _t(1, 6)), (1, _t(4, 6)), (2, _t(2, 6))]
    df = spark.createDataFrame(rows, "uid long, ts timestamp")
    from meerkat_spark.operators.temporalagg import session_count

    out = {
        r.t: r.count_sessions
        for r in session_count(
            df, "uid", "ts", _t(2), _t(6), bin_sec=86400, lookback_sec=2 * 86400
        ).collect()
    }
    # t=d2: events in (d0,d2] → uid1@d1 → 1 ; t=d3: (d1,d3] → uid1? d1 6am
    # yes, uid2@d2 → 2 ; t=d4: (d2,d4] → uid2? d2 6am in range? 2024-01-02
    # 06:00 > 2024-01-02 00:00 → yes; uid1@d4 6am? d4 6am > d4 00:00 → no
    # (bin boundary t=d4 00:00) → {2} → 1 ; t=d5: (d3,d5] → uid1@d4 → 1 ;
    # t=d6: (d4,d6] → uid1@d4 6am → 1
    assert out == {
        _t(2): 1,
        _t(3): 2,
        _t(4): 1,
        _t(5): 1,
        _t(6): 1,
    }


def test_activity_engagement_known(spark):
    # inner 1d / outer 3d over days 1..5
    rows = [(1, _t(1, 6)), (2, _t(1, 8)), (1, _t(3, 6))]
    df = spark.createDataFrame(rows, "uid long, ts timestamp")
    from meerkat_spark.operators.temporalagg import activity_engagement

    out = {
        r.t: (r.dcount_activities_inner, r.dcount_activities_outer, r.activity_ratio)
        for r in activity_engagement(
            df, "uid", "ts", _t(1), _t(5), inner_sec=86400, outer_sec=3 * 86400
        ).collect()
    }
    # t=d2: inner (d1,d2] → {1,2}; outer (d-1,d2] → {1,2} → ratio 1.0
    # t=d3: inner (d2,d3] → ∅… uid1@d3 6am > d3 00:00? no (bin end d3) → 0
    #        outer (d0,d3] → {1,2} → 0/2 = 0
    # t=d4: inner (d3,d4] → uid1@d3 6am → {1}; outer (d1,d4] → {1,2}… uid2
    #        @d1 8am > d1 → yes → 0.5
    # t=d5: inner (d4,d5] → ∅ → 0; outer (d2,d5] → {1} → 0
    assert out == {
        _t(2): (2, 2, 1.0),
        _t(3): (0, 2, 0.0),
        _t(4): (1, 2, 0.5),
        _t(5): (0, 1, 0.0),
    }


def test_sequence_detect_greedy_earliest(spark):
    from meerkat_spark.operators.temporalagg import sequence_detect

    rows = [
        (1, _t(1, 0), "a"),
        (1, _t(1, 1), "b"),   # earliest b after the a
        (1, _t(1, 2), "b"),   # later b must NOT be picked
        (1, _t(1, 3), "c"),
        (2, _t(1, 0), "a"),   # no b afterwards → no row
        (3, _t(1, 0), "a"),
        (3, _t(2, 12), "b"),  # outside the 1d step window → no row
    ]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, st string")
    out = sequence_detect(
        df, "uid", "ts",
        [F.col("st") == "a", F.col("st") == "b", F.col("st") == "c"],
        max_step_sec=86400, max_span_sec=2 * 86400,
        names=["ta", "tb", "tc"],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.uid, r.ta, r.tb, r.tc) == (1, _t(1, 0), _t(1, 1), _t(1, 3))
    assert r.duration == 3 * 3600.0


def test_sequence_detect_span_window(spark):
    from meerkat_spark.operators.temporalagg import sequence_detect

    rows = [(1, _t(1, 0), "a"), (1, _t(1, 20), "b")]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, st string")
    # steps fit the step window but the total span (20h) busts max_span 12h
    out = sequence_detect(
        df, "uid", "ts", [F.col("st") == "a", F.col("st") == "b"],
        max_step_sec=86400, max_span_sec=12 * 3600,
    ).collect()
    assert out == []


def test_funnel_sequence_completion_known(spark):
    from meerkat_spark.operators.temporalagg import funnel_sequence_completion

    rows = [
        (1, _t(1, 1), "a"), (1, _t(1, 2), "b"), (1, _t(1, 3), "c"),
        (2, _t(1, 4), "a"), (2, _t(2, 10), "b"),  # b beyond the 1d window
        (3, _t(2, 1), "a"),
    ]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, st string")
    out = {
        (r.t, r.state): r.dcount
        for r in funnel_sequence_completion(
            df, "uid", "ts", "st", ["a", "b", "c"],
            max_window_sec=[86400, 86400, 2 * 86400],
            start=_t(1), end=_t(4), bin_sec=86400,
        ).collect()
    }
    assert out == {
        (_t(1), "a"): 2,   # uids 1, 2 started day1
        (_t(1), "b"): 1,   # only uid 1 reached b within 1d of start
        (_t(1), "c"): 1,
        (_t(2), "a"): 1,   # uid 3
    }


def test_sequence_detect_kql_grammar(spark):
    from meerkat_spark.engine import MeerkatEngine

    engine_small = MeerkatEngine(spark, "/root/testdata/sf0.001")
    got = engine_small.kql(
        "events | extend is_v = event_type == 'view', "
        "is_c = event_type == 'click' "
        "| evaluate sequence_detect(ts, 12h, 1d, is_v, is_c, user_id)"
    ).to_df()
    from meerkat_spark.operators.temporalagg import sequence_detect

    ev = engine_small.table("events").to_df()
    want = sequence_detect(
        ev, "user_id", "ts",
        [F.col("event_type") == "view", F.col("event_type") == "click"],
        max_step_sec=12 * 3600, max_span_sec=86400, names=["is_v", "is_c"],
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_session_count_kql_grammar(spark):
    from meerkat_spark.engine import MeerkatEngine

    engine_small = MeerkatEngine(spark, "/root/testdata/sf0.001")
    got = engine_small.kql(
        "events | evaluate session_count(user_id, ts, "
        "datetime(2024-01-02), datetime(2024-01-05), 1d, 2d)"
    ).to_df()
    from meerkat_spark.operators.temporalagg import session_count

    ev = engine_small.table("events").to_df()
    want = session_count(ev, "user_id", "ts", "2024-01-02", "2024-01-05",
                         bin_sec=86400, lookback_sec=2 * 86400)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_funnel_completion_kql_grammar(spark):
    from meerkat_spark.engine import MeerkatEngine

    engine_small = MeerkatEngine(spark, "/root/testdata/sf0.001")
    got = engine_small.kql(
        "events | evaluate funnel_sequence_completion(user_id, ts, "
        "datetime(2024-01-01), datetime(2024-01-08), 1d, event_type, "
        "dynamic(['view','click','purchase']), dynamic([1d, 1d, 2d]))"
    ).to_df()
    from meerkat_spark.operators.temporalagg import funnel_sequence_completion

    ev = engine_small.table("events").to_df()
    want = funnel_sequence_completion(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"],
        max_window_sec=[86400, 86400, 2 * 86400],
        start="2024-01-01", end="2024-01-08", bin_sec=86400,
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_ipv4_lookup_longest_prefix_and_unmatched(spark):
    from meerkat_spark.operators.iplookup import ipv4_lookup

    lookup = spark.createDataFrame(
        [("10.0.0.0/8", "ten"), ("10.1.0.0/16", "ten-one"),
         ("0.0.0.0/0", "default")],
        "network string, tag string",
    )
    # duplicate fact rows must each survive
    t = spark.createDataFrame(
        [(1, "10.1.2.3"), (1, "10.1.2.3"), (2, "10.9.9.9"), (3, "200.1.1.1")],
        "i long, ip string",
    )
    rows = sorted(
        (r.i, r.tag) for r in ipv4_lookup(t, lookup, "ip", "network").collect()
    )
    assert rows == [(1, "ten-one"), (1, "ten-one"), (2, "ten"), (3, "default")]

    # without the default route, 200.x drops unless return_unmatched
    lk2 = lookup.filter(F.col("tag") != "default")
    got = sorted(
        (r.i, r.tag)
        for r in ipv4_lookup(t, lk2, "ip", "network", True).collect()
    )
    assert got == [(1, "ten-one"), (1, "ten-one"), (2, "ten"), (3, None)]


def test_ipv4_lookup_kql_grammar(spark):
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    got = eng.kql(
        "let ipnets = datatable(network:string, tag:string)["
        "'10.0.0.0/8', 'ten', '0.0.0.0/1', 'low'];"
        "events | project event_id"
        " | extend ip = format_ipv4((event_id * 2654435761) % 4294967296)"
        " | evaluate ipv4_lookup(ipnets, ip, network)"
    ).to_df()
    assert set(got.columns) == {"event_id", "ip", "tag"}
    tags = {r.tag for r in got.collect()}
    assert tags == {"ten", "low"}


def test_ipv4_lookup_plan_is_broadcast(spark):
    from meerkat_spark.operators.iplookup import ipv4_lookup
    from meerkat_spark.functions.scalar import format_ipv4

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    fact = ev.select(
        "event_id",
        format_ipv4((F.col("event_id") * 2654435761) % 4294967296).alias("ip"),
    )
    lookup = spark.createDataFrame(
        [("10.0.0.0/8", "ten"), ("0.0.0.0/1", "low")], "network string, tag string"
    )
    plan = (
        ipv4_lookup(fact, lookup, "ip", "network")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_geohash_known_vectors(spark):
    from meerkat_spark.functions.scalar import (
        geo_geohash_to_central_point,
        geo_point_to_geohash,
    )

    df = spark.createDataFrame(
        [(10.40744, 57.64911), (-5.6, 42.6), (None, 1.0), (200.0, 0.0)],
        "lng double, lat double",
    )
    got = df.select(
        geo_point_to_geohash("lng", "lat", 11).alias("g11"),
        geo_point_to_geohash("lng", "lat", 5).alias("g5"),
    ).collect()
    assert got[0].g11 == "u4pruydqqvj"          # classic test vector
    assert got[1].g5 == "ezs42"                 # geohash.org example
    assert got[2].g5 is None and got[3].g5 is None  # null / out-of-range

    back = spark.createDataFrame(
        [("ezs42",), ("u4pruydqqvj",), ("",), ("a!c",)], "gh string"
    ).select(geo_geohash_to_central_point("gh").alias("pt")).collect()
    assert abs(back[0].pt.lng - (-5.60302734375)) < 1e-12
    assert abs(back[0].pt.lat - 42.60498046875) < 1e-12
    assert abs(back[1].pt.lng - 10.40744) < 1e-4  # 11 chars ≈ sub-mm cell
    assert back[2].pt is None and back[3].pt is None


def test_geohash_kql(spark):
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    got = eng.kql(
        "print gh = geo_point_to_geohash(-5.6, 42.6, 5)"
        " | extend pt = geo_geohash_to_central_point(gh)"
    ).to_df().collect()[0]
    assert got.gh == "ezs42"
    import json

    pt = json.loads(got.pt)
    assert pt["type"] == "Point"
    assert abs(pt["coordinates"][0] - (-5.60302734375)) < 1e-12


def test_activity_metrics_known_answer(spark):
    import datetime as dt

    from meerkat_spark.operators.temporalagg import activity_metrics

    base = dt.datetime(2024, 1, 1)
    rows = []
    for d, us in [(0, ["u1", "u2", "u3"]), (1, ["u2", "u3", "u4"]), (2, ["u4"])]:
        rows += [(u, base + dt.timedelta(days=d, hours=i)) for i, u in enumerate(us)]
    df = spark.createDataFrame(rows, "uid string, ts timestamp")
    got = {
        r.t.day: r
        for r in activity_metrics(
            df, "uid", "ts", base, base + dt.timedelta(days=3), 86400
        ).collect()
    }
    assert got[1].dcount_values == 3 and got[1].dcount_newvalues == 3
    # day1: u2,u3 of {u1,u2,u3} return on day2 -> retention 2/3
    assert got[1].retention_rate == 0.666667 and got[1].churn_rate == 0.333333
    assert got[2].dcount_newvalues == 1  # u4 first seen day2
    assert got[2].retention_rate == 0.333333  # only u4 of 3 returns
    assert got[3].dcount_values == 1 and got[3].churn_rate == 1.0
    assert got[4].dcount_values == 0 and got[4].retention_rate == 0.0


def test_new_activity_metrics_end_is_timestamp_bound(spark):
    """Round-7 ADVICE fix: events strictly after `end` must NOT count,
    even when they fall inside the trailing partial bin (the old
    bin-index clip admitted up to one full window past end). An event
    AT exactly `end` IS included (Kusto Timeline <= End)."""
    from meerkat_spark.operators.temporalagg import new_activity_metrics

    rows = [
        ("u1", _t(1)),          # cohort week 0
        ("u1", _t(8)),          # retained week 1
        ("u2", _t(1)),
        ("u2", _t(10, 12)),     # after end Jan 10 00:00 → excluded
        ("u3", _t(10)),         # exactly at end → included, week 1 cohort
    ]
    df = spark.createDataFrame(rows, "uid string, ts timestamp")
    got = {
        (r.from_ts.day, r.to_ts.day): (
            r.dcount_new_values,
            r.dcount_retained_values,
        )
        for r in new_activity_metrics(
            df, "uid", "ts", _t(1), _t(10), 7 * 86400
        ).collect()
    }
    # week0 cohort {u1,u2}: both active wk0; only u1 retained wk1.
    # week1 cohort {u3} (event at end exactly).
    assert got == {(1, 1): (2, 2), (1, 8): (2, 1), (8, 8): (1, 1)}
