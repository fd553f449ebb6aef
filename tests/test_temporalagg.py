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
