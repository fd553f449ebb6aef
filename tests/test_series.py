"""Series-function tests with known-answer inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meerkat_spark.functions import series as SR


@pytest.fixture()
def series_df(spark):
    return spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0, 4.0, 5.0]),
            (2, [10.0, 10.0, 10.0, 100.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0]),
            (3, []),
        ],
        "id int, s array<double>",
    )


def test_series_fir_moving_average(spark, series_df):
    out = {
        r.id: r.f
        for r in series_df.select(
            "id", SR.series_fir(F.col("s"), [1, 1, 1], center=True).alias("f")
        ).collect()
    }
    # centered 3-MA of [1..5]: edges use partial windows under 'same'
    assert out[1][1] == pytest.approx(2.0)
    assert out[1][2] == pytest.approx(3.0)
    assert out[1][3] == pytest.approx(4.0)
    assert out[3] == []


def test_series_fir_kusto_defaults(spark, series_df):
    """Kusto-exact r16 semantics: default is CAUSAL (center=false) and
    normalized; normalize=false gives the documented moving-sum
    example series_fir(x, [1,1,1], false, false) over [1..5] =
    [1,3,6,9,12] (zero-padded leading edge)."""
    row = (
        series_df.filter(F.col("id") == 1)
        .select(
            SR.series_fir(F.col("s"), [1, 1, 1], normalize=False).alias("msum"),
            SR.series_fir(F.col("s"), [1, 1]).alias("ma"),
        )
        .first()
    )
    assert row.msum == pytest.approx([1.0, 3.0, 6.0, 9.0, 12.0])
    # causal normalized 2-MA: y[i] = (x[i] + x[i-1]) / 2, x[-1] = 0
    assert row.ma == pytest.approx([0.5, 1.5, 2.5, 3.5, 4.5])
    # Kusto rule: normalize=true rejects negative coefficients
    with pytest.raises(ValueError, match="negative"):
        SR.series_fir(F.col("s"), [1, -1], normalize=True)


def test_series_outliers_flags_spike(spark, series_df):
    """r16 Kusto-exact Tukey scores: ctukey 10/90 over nine 10s and
    one 100 puts q90 between sorted[8]=10 and sorted[9]=100 (linear
    interpolation → 19), IQR 9, so the spike scores (100−19)/9 = 9 —
    a strong outlier (>3) — and every other point is inside the fence
    at exactly 0."""
    out = {
        r.id: r.o
        for r in series_df.select(
            "id", SR.series_outliers(F.col("s")).alias("o")
        ).collect()
    }
    assert out[2][3] == pytest.approx(9.0)  # the 100.0 spike
    assert all(v == 0.0 for i, v in enumerate(out[2]) if i != 3)
    assert out[3] == []
    # traditional tukey: q25 = q75 = 10 → degenerate IQR → all zero
    tuk = (
        series_df.filter(F.col("id") == 2)
        .select(SR.series_outliers(F.col("s"), kind="tukey").alias("o"))
        .first()
        .o
    )
    assert all(v == 0.0 for v in tuk)


def test_series_fit_line(spark, series_df):
    row = (
        series_df.filter(F.col("id") == 1)
        .select(SR.series_fit_line(F.col("s")).alias("fit"))
        .select("fit.*")
        .first()
    )
    assert row.slope == pytest.approx(1.0, abs=1e-6)
    assert row.interception == pytest.approx(1.0, abs=1e-6)
    assert row.rsquare == pytest.approx(1.0, abs=1e-6)
    # r14: full Kusto tuple — variance/rvariance/line_fit present
    assert row.rvariance == pytest.approx(0.0, abs=1e-6)
    assert len(row.line_fit) > 2


def test_series_over_make_series(spark):
    """End to end: make-series daily counts → smooth → outliers."""
    from meerkat_spark.engine import MeerkatEngine

    e = MeerkatEngine(spark, "/root/testdata/sf0.001")
    counts = (
        e.table("events")
        .extend(day=F.date_trunc("day", F.col("ts")))
        .summarize({"n": F.count(F.lit(1))}, by=["event_type", "day"])
        .to_df()
    )
    series = counts.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "n"))),
            lambda s: s.n.cast("double"),
        ).alias("s")
    )
    out = series.select(
        "event_type",
        SR.series_fir(F.col("s"), [1, 1, 1]).alias("smooth"),
        SR.series_outliers(F.col("s")).alias("outliers"),
        SR.series_fit_line(F.col("s")).alias("fit"),
    )
    rows = out.collect()
    assert len(rows) == 5
    for r in rows:
        assert len(r.smooth) == len(r.outliers)
        assert r.fit.rsquare is not None


def test_series_decompose_recovers_planted_seasonality(spark):
    """trend+seasonal+residual == input exactly; the planted period-4
    pattern lands in `seasonal`, the ramp in `trend`, and an injected
    spike is flagged only by the anomaly path."""
    import numpy as np

    from meerkat_spark.functions.series import (
        series_decompose,
        series_decompose_anomalies,
    )

    period = 4
    n = 32
    ramp = np.linspace(0, 10, n)
    season = np.tile([0.0, 5.0, 0.0, -5.0], n // period)
    x = (ramp + season).round(6)
    x[17] += 40.0  # spike
    df = spark.createDataFrame([(1, x.tolist())], "id int, s array<double>")
    row = df.select(
        series_decompose(F.col("s"), period).alias("d"),
        series_decompose_anomalies(F.col("s"), period).alias("an"),
    ).collect()[0]
    d = row.d
    recon = np.array(d.trend) + np.array(d.seasonal) + np.array(d.residual)
    assert np.allclose(recon, x, atol=1e-4)
    # seasonal profile has the planted amplitude ordering
    s = np.array(d.seasonal[:period])
    assert s[1] == max(d.seasonal[:period]) and s[3] == min(d.seasonal[:period])
    assert row.an[17] == 1 and sum(abs(v) for v in row.an) <= 3


def test_series_periods_detect_planted_cycle(spark):
    import numpy as np

    n = 64
    cyc = 10.0 * np.sin(2 * np.pi * np.arange(n) / 8)       # period 8
    ramp = np.linspace(0, 30, n)                              # must not fool it
    flat = np.ones(n)
    df = spark.createDataFrame(
        [(1, (cyc + ramp).tolist()), (2, flat.tolist())],
        "id int, s array<double>",
    )
    rows = {
        r.id: r.d
        for r in df.select(
            "id", SR.series_periods_detect(F.col("s")).alias("d")
        ).collect()
    }
    assert rows[1].period == 8 and rows[1].score > 0.5
    assert rows[2].period == 0 and rows[2].score == 0.0


def test_series_fill_family(spark):
    df = spark.createDataFrame(
        [(1, [None, 2.0, None, None, 8.0, None])],
        "id int, s array<double>",
    )
    row = df.select(
        SR.series_fill_forward(F.col("s")).alias("f"),
        SR.series_fill_backward(F.col("s")).alias("b"),
        SR.series_fill_const(F.col("s"), 0.0).alias("c"),
        SR.series_fill_linear(F.col("s")).alias("l"),
    ).collect()[0]
    assert row.f == [None, 2.0, 2.0, 2.0, 8.0, 8.0]
    assert row.b == [2.0, 2.0, 8.0, 8.0, 8.0, None]
    assert row.c == [0.0, 2.0, 0.0, 0.0, 8.0, 0.0]
    assert row.l == [2.0, 2.0, 4.0, 6.0, 8.0, 8.0]


def test_series_fit_2lines_changepoint(spark):
    """Piecewise series with a level jump: the split lands at the jump,
    both segments recover slope 1, and the two-line fit is near-exact
    while the single line is not."""
    from pyspark.sql import functions as F

    from meerkat_spark.functions.series import series_fit_2lines, series_fit_line

    df = spark.createDataFrame(
        [([0.0, 1.0, 2.0, 3.0, 10.0, 11.0, 12.0, 13.0],)], "s array<double>"
    )
    row = df.select(
        series_fit_2lines(F.col("s")).alias("f2"),
        series_fit_line(F.col("s")).alias("f1"),
    ).collect()[0]
    assert row.f2.split_idx == 4
    assert abs(row.f2.left_slope - 1.0) < 1e-9
    assert abs(row.f2.right_slope - 1.0) < 1e-9
    assert abs(row.f2.left_intercept - 0.0) < 1e-9
    assert abs(row.f2.right_intercept - 6.0) < 1e-9
    assert row.f2.rsquare > 0.999 and row.f2.rsquare > row.f1.rsquare
    short = spark.createDataFrame([([1.0, 2.0],)], "s array<double>")
    assert short.select(series_fit_2lines("s").alias("f")).collect()[0].f.rsquare is None


def test_series_decompose_forecast_analytic(spark):
    """Linear trend + exact period-4 seasonality must forecast within
    the half-sample moving-average shift (0.25 * slope * window)."""
    import numpy as np
    from pyspark.sql import functions as F
    from meerkat_spark.functions.series import series_decompose_forecast

    t = np.arange(24)
    season = np.array([10.0, 0.0, -10.0, 0.0])
    y = (0.5 * t + season[t % 4]).tolist()
    df = spark.createDataFrame([(y,)], "s array<double>")
    out = df.select(
        series_decompose_forecast(F.col("s"), 8, 4).alias("f")
    ).collect()[0].f
    assert len(out) == 32
    expect = [0.5 * (24 + i) + season[(24 + i) % 4] for i in range(8)]
    assert max(abs(a - b) for a, b in zip(out[24:], expect)) <= 0.3
    # degenerate inputs survive
    deg = spark.createDataFrame([([],), ([5.0],)], "s array<double>")
    rows = deg.select(series_decompose_forecast(F.col("s"), 3, 4).alias("f")).collect()
    assert rows[0].f == [] and len(rows[1].f) == 4


def test_series_decompose_forecast_kql(spark):
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    got = eng.kql(
        "print s = dynamic([1.0,2.0,3.0,4.0,5.0,6.0,7.0,8.0])"
        " | extend f = series_decompose_forecast(s, 2, 1)"
    ).to_df().collect()[0]
    assert len(got.f) == 10
    # pure linear, period 1: forecast continues the line
    assert abs(got.f[-1] - 10.0) < 0.5


def test_series_elementwise_family(spark, series_df):
    r = (
        series_df.where("id = 1")
        .select(
            SR.series_add("s", 1.0).alias("a"),
            SR.series_subtract("s", "s").alias("z"),
            SR.series_multiply("s", "s").alias("sq"),
            SR.series_divide("s", 0.0).alias("d0"),
            SR.series_pow("s", 2.0).alias("p2"),
            SR.series_abs(SR.series_subtract("s", 3.0)).alias("ab"),
            SR.series_sign(SR.series_subtract("s", 3.0)).alias("sg"),
            SR.series_sum("s").alias("ssum"),
            SR.series_product("s").alias("sprod"),
            SR.series_magnitude([3.0, 4.0]).alias("mag"),
            SR.series_equals("s", "s").alias("eq"),
            SR.series_not_equals("s", 3.0).alias("ne"),
            SR.series_less("s", 3.0).alias("lt"),
            SR.series_less_equals("s", 3.0).alias("le"),
            SR.series_greater_equals("s", 3.0).alias("ge"),
            SR.series_ceiling(SR.series_divide("s", 2.0)).alias("ce"),
            SR.series_exp([0.0]).alias("ex"),
            SR.series_log([1.0]).alias("lg"),
        )
        .collect()[0]
    )
    assert r.a == [2.0, 3.0, 4.0, 5.0, 6.0]
    assert r.z == [0.0] * 5
    assert r.sq == [1.0, 4.0, 9.0, 16.0, 25.0]
    assert r.d0 == [None] * 5
    assert r.p2 == [1.0, 4.0, 9.0, 16.0, 25.0]
    assert r.ab == [2.0, 1.0, 0.0, 1.0, 2.0]
    assert r.sg == [-1.0, -1.0, 0.0, 1.0, 1.0]
    assert r.ssum == 15.0
    assert r.sprod == 120.0
    assert r.mag == pytest.approx(5.0)
    assert r.eq == [True] * 5
    assert r.ne == [True, True, False, True, True]
    assert r.lt == [True, True, False, False, False]
    assert r.le == [True, True, True, False, False]
    assert r.ge == [False, False, True, True, True]
    assert r.ce == [1.0, 1.0, 2.0, 2.0, 3.0]
    assert r.ex == [1.0]
    assert r.lg == [0.0]


def test_series_pearson_and_kernels(spark, series_df):
    r = (
        series_df.where("id = 1")
        .select(
            SR.series_pearson_correlation(
                "s", SR.series_multiply("s", -2.0)
            ).alias("rneg"),
            SR.series_pearson_correlation("s", [1.0, 1.0, 1.0, 1.0, 1.0]).alias(
                "rflat"
            ),
            SR.series_iir("s", [1.0], [1.0, -1.0]).alias("cum"),
            # y[n] = 0.5*x[n] + 0.5*y[n-1]: exponential smoothing
            SR.series_iir([1.0, 1.0, 1.0], [0.5], [1.0, -0.5]).alias("ema"),
            SR.series_seasonal([1.0, 9.0, 1.0, 9.0, 1.0, 9.0], 2).alias("seas"),
            SR.series_seasonal([1.0, 9.0, 1.0, 9.0, 1.0, 9.0], -1).alias(
                "seas_auto"
            ),
            SR.series_seasonal([5.0, 5.0], 0).alias("seas_zero"),
        )
        .collect()[0]
    )
    assert r.rneg == pytest.approx(-1.0)
    assert r.rflat is None  # zero variance -> undefined
    assert r.cum == [1.0, 3.0, 6.0, 10.0, 15.0]
    assert r.ema == pytest.approx([0.5, 0.75, 0.875])
    assert r.seas == [1.0, 9.0, 1.0, 9.0, 1.0, 9.0]
    assert r.seas_auto == [1.0, 9.0, 1.0, 9.0, 1.0, 9.0]
    assert r.seas_zero == [0.0, 0.0]


def test_series_elementwise_kql(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    df = (
        MeerkatEngine(spark, SF_ORACLE)
        .kql(
            """range i from 1 to 2 step 1
               | extend s = pack_array(3.0, 4.0)
               | project i,
                         mag = series_magnitude(s),
                         tot = series_sum(series_pow(s, 2.0)),
                         gt = series_greater(s, 3.5),
                         seas = series_seasonal(s, 2),
                         sm = series_iir(s, dynamic([1.0]), dynamic([1.0, -1.0]))"""
        )
        .to_df()
    )
    r = df.orderBy("i").collect()[0]
    assert r.mag == pytest.approx(5.0)
    assert r.tot == 25.0
    assert r.gt == [False, True]
    assert r.seas == [3.0, 4.0]
    assert r.sm == [3.0, 7.0]


def test_series_fit_poly_and_fft(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    r = (
        MeerkatEngine(spark, SF_ORACLE)
        .kql(
            """print s = pack_array(1.0, 4.0, 9.0, 16.0, 25.0)
               | extend p = series_fit_poly(s, 2), l = series_fit_poly(s)
               | extend f = series_fft(s)
               | extend back = series_ifft(f.real, f.imag)
               | project r2 = p.rsquare, c = p.coefficients,
                         lr2 = l.rsquare, back"""
        )
        .to_df()
        .collect()[0]
    )
    # (x+1)^2 fits degree 2 exactly: coefficients [1, 2, 1] high->low
    assert r.r2 == pytest.approx(1.0)
    assert r.c == pytest.approx([1.0, 2.0, 1.0], abs=1e-6)
    assert r.lr2 < 1.0  # a line can't fit the parabola exactly
    # fft -> ifft roundtrips the series
    assert r.back == pytest.approx([1.0, 4.0, 9.0, 16.0, 25.0], abs=1e-6)


def test_series_decompose_autodetect_period(spark):
    """period=-1 (Kusto's default) autodetects per series via the
    periodogram: a planted period-4 pattern decomposes identically to
    the explicit period=4 call; a flat series degrades to trend-only
    (w=1) instead of erroring. KQL surface: the period argument is
    optional everywhere."""
    import numpy as np

    from meerkat_spark.functions.series import series_decompose

    n = 64
    ramp = np.linspace(0, 10, n)
    season = np.tile([0.0, 5.0, 0.0, -5.0], n // 4)
    x = (ramp + season).round(6).tolist()
    flat = [3.0] * n
    df = spark.createDataFrame([(1, x), (2, flat)], "id int, s array<double>")
    rows = {
        r.id: r
        for r in df.select(
            "id",
            series_decompose(F.col("s"), -1).alias("auto"),
            series_decompose(F.col("s"), 4).alias("explicit"),
        ).collect()
    }
    assert rows[1].auto.seasonal == rows[1].explicit.seasonal
    assert rows[1].auto.trend == rows[1].explicit.trend
    # flat series: no cycle -> trend-only, seasonal all zero
    assert all(v == 0.0 for v in rows[2].auto.seasonal)
    assert np.allclose(rows[2].auto.trend, 3.0)

    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)
    r = eng.kql(
        "print s = dynamic([0.0,5.0,0.0,-5.0,0.0,5.0,0.0,-5.0,"
        "0.0,5.0,0.0,-5.0,0.0,5.0,0.0,-5.0])"
        " | extend d = series_decompose(s)"
        " | project top = d.seasonal[1]"
    ).to_df().collect()[0]
    assert float(r.top) > 3.0


def test_series_dynamic_fit_and_periods_validate(spark):
    """Round-7: dynamic-bag fit variants agree with the struct forms
    field-for-field; series_periods_validate scores the true period of
    a synthetic sine near detect's score and an off period at ~0."""
    import json

    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)
    r = eng.kql(
        "range i from 0 to 47 step 1"
        " | extend y = 2.5 * todouble(i) + 7.0 + iff(i % 2 == 0, 0.5, -0.5)"
        " | summarize ys = make_list(y)"
        " | extend f = series_fit_line(ys), d = series_fit_line_dynamic(ys)"
        " | project slope = f.slope, rsq = f.rsquare, d"
    ).to_df().collect()[0]
    d = json.loads(r.d)
    assert d["slope"] == r.slope and d["rsquare"] == r.rsq
    assert len(d["line_fit"]) == 48 and abs(d["interception"] - 7.0) < 0.2

    r = eng.kql(
        "range i from 0 to 95 step 1"
        " | extend y = sin(2.0 * pi() * todouble(i) / 12.0)"
        " | summarize ys = make_list(y)"
        " | extend det = series_periods_detect(ys),"
        "   val = series_periods_validate(ys, 12, 5)"
        " | project p = det.period, s = det.score, val"
    ).to_df().collect()[0]
    v = json.loads(r.val)
    assert r.p == 12 and v["periods"] == [12, 5]
    assert v["scores"][0] == r.s and v["scores"][0] > 0.9
    assert v["scores"][1] < 0.05

    r = eng.kql(
        "range i from 0 to 39 step 1"
        " | extend y = iff(i < 20, todouble(i), 100.0 - 3.0 * todouble(i))"
        " | summarize ys = make_list(y)"
        " | extend f = series_fit_2lines(ys),"
        "   d = series_fit_2lines_dynamic(ys)"
        " | project si = f.split_idx, d"
    ).to_df().collect()[0]
    d = json.loads(r.d)
    assert d["split_idx"] == r.si
    assert abs(d["left"]["slope"] - 1.0) < 0.05
    assert abs(d["right"]["slope"] + 3.0) < 0.05


def test_series_stats_multi_assign(spark):
    """r8: series_stats multi-assign form (Kusto column order min,
    min_idx, max, max_idx, avg, variance, stdev) via the extend
    multi-assign struct machinery; the _dynamic bag form is unchanged."""
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    r = eng.kql(
        "range x from 1 to 1 step 1 | extend s = dynamic([1.0, 5.0, 3.0])"
        " | extend (mn, mni, mx, mxi, av, va, sd) = series_stats(s)"
        " | project mn, mni, mx, mxi, av, va, sd"
    ).to_df().collect()[0]
    assert (r.mn, r.mni, r.mx, r.mxi, r.av, r.va, r.sd) == (
        1.0, 0, 5.0, 1, 3.0, 4.0, 2.0
    )
