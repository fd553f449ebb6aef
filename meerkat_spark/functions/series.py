"""Series functions over make-series dense arrays (KQL series_* —
SURVEY.md §2.2.3 T3): FIR filter (moving average/convolution), z-score
outliers, simple linear-trend fit. Arrow-vectorized pandas UDFs — the
sanctioned slow-path for numeric kernels Spark expressions can't state
cleanly; one array in, one array out, row-local (no shuffle)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def series_fir(col: Column, weights: list[float], center: bool = True) -> Column:
    """KQL series_fir: finite-impulse-response filter (e.g. weights
    [1,1,1,1,1]/5 = centered moving average)."""
    w = np.asarray(weights, dtype=np.float64)
    w = w / w.sum()

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def fir(series: pd.Series) -> pd.Series:
        out = []
        for arr in series:
            if arr is None or len(arr) == 0:
                out.append([])
                continue
            x = np.asarray(arr, dtype=np.float64)
            mode = "same" if center else "full"
            y = np.convolve(x, w, mode=mode)
            if not center:
                y = y[: len(x)]
            out.append(y.round(6).tolist())
        return pd.Series(out)

    return fir(col)


def series_outliers(col: Column, threshold: float = 2.5) -> Column:
    """KQL series_outliers-style flags: |z-score| per point; points with
    |z| > threshold marked ±1 (sign of deviation), else 0."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def outliers(series: pd.Series) -> pd.Series:
        out = []
        for arr in series:
            if arr is None or len(arr) == 0:
                out.append([])
                continue
            x = np.asarray(arr, dtype=np.float64)
            sd = x.std()
            if sd == 0:
                out.append([0] * len(x))
                continue
            z = (x - x.mean()) / sd
            flags = np.where(z > threshold, 1, np.where(z < -threshold, -1, 0))
            out.append(flags.astype(int).tolist())
        return pd.Series(out)

    return outliers(col)


def series_fit_line(col: Column) -> Column:
    """KQL series_fit_line: least-squares line fit per series → struct
    (slope, intercept, rsquare)."""

    @F.pandas_udf("slope double, intercept double, rsquare double")
    def fit(series: pd.Series) -> pd.DataFrame:
        slopes, intercepts, r2s = [], [], []
        for arr in series:
            if arr is None or len(arr) < 2:
                slopes.append(None)
                intercepts.append(None)
                r2s.append(None)
                continue
            y = np.asarray(arr, dtype=np.float64)
            x = np.arange(len(y), dtype=np.float64)
            slope, intercept = np.polyfit(x, y, 1)
            pred = slope * x + intercept
            ss_res = float(((y - pred) ** 2).sum())
            ss_tot = float(((y - y.mean()) ** 2).sum())
            r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 1.0
            slopes.append(round(float(slope), 6))
            intercepts.append(round(float(intercept), 6))
            r2s.append(round(r2, 6))
        return pd.DataFrame({"slope": slopes, "intercept": intercepts, "rsquare": r2s})

    return fit(col)


def series_decompose(col: Column, period: int) -> Column:
    """KQL series_decompose (moving-average STL-lite): per series →
    struct (baseline, seasonal, trend, residual), each an array the
    length of the input. trend = centered moving average over one
    period; seasonal = per-phase mean of the detrended series (zero
    when period <= 1 or the series is shorter than two periods);
    residual = series - trend - seasonal; baseline = trend + seasonal.
    Deterministic numpy per row — row-local, shuffle-free."""

    @F.pandas_udf(
        "baseline array<double>, seasonal array<double>, "
        "trend array<double>, residual array<double>"
    )
    def decomp(series: pd.Series) -> pd.DataFrame:
        bases, seas, trends, resids = [], [], [], []
        for arr in series:
            if arr is None or len(arr) == 0:
                bases.append([]); seas.append([]); trends.append([]); resids.append([])
                continue
            x = np.asarray(arr, dtype=np.float64)
            n = len(x)
            w = max(int(period), 1)
            # centered moving average with edge padding (window w)
            pad = np.pad(x, (w // 2, w - 1 - w // 2), mode="edge")
            trend = np.convolve(pad, np.full(w, 1.0 / w), mode="valid")
            if w > 1 and n >= 2 * w:
                detr = x - trend
                phase = np.arange(n) % w
                smeans = np.array([detr[phase == p].mean() for p in range(w)])
                smeans -= smeans.mean()  # seasonal sums to ~zero
                seasonal = smeans[phase]
            else:
                seasonal = np.zeros(n)
            resid = x - trend - seasonal
            bases.append((trend + seasonal).round(6).tolist())
            seas.append(seasonal.round(6).tolist())
            trends.append(trend.round(6).tolist())
            resids.append(resid.round(6).tolist())
        return pd.DataFrame(
            {"baseline": bases, "seasonal": seas, "trend": trends, "residual": resids}
        )

    return decomp(col)


def series_decompose_anomalies(col: Column, period: int, threshold: float = 2.5) -> Column:
    """KQL series_decompose_anomalies: z-score flags (±1) over the
    decomposition residual — seasonal spikes don't false-positive."""
    dec = series_decompose(col, period)
    return series_outliers(dec.getField("residual"), threshold)


def series_periods_detect(col: Column, max_period: int = 0) -> Column:
    """KQL series_periods_detect: dominant cycle length per series →
    struct (period, score). Periodogram over the detrended series
    (rfft power spectrum; score = candidate power / total power),
    period rounded to the nearest integer lag, 0 when nothing beats
    the flat spectrum. Deterministic numpy per row — row-local."""

    @F.pandas_udf("period long, score double")
    def detect(series: pd.Series) -> pd.DataFrame:
        periods, scores = [], []
        for arr in series:
            if arr is None or len(arr) < 4:
                periods.append(0)
                scores.append(0.0)
                continue
            x = np.asarray(arr, dtype=np.float64)
            n = len(x)
            # detrend (least-squares line) so the ramp doesn't read as a cycle
            t = np.arange(n, dtype=np.float64)
            slope, intercept = np.polyfit(t, x, 1)
            d = x - (slope * t + intercept)
            power = np.abs(np.fft.rfft(d)) ** 2
            power[0] = 0.0  # DC
            total = power.sum()
            if total <= 0:
                periods.append(0)
                scores.append(0.0)
                continue
            k = int(power.argmax())
            period = int(round(n / k)) if k > 0 else 0
            cap = max_period if max_period > 0 else n // 2
            if period > cap or period < 2:
                periods.append(0)
                scores.append(0.0)
                continue
            periods.append(period)
            scores.append(round(float(power[k] / total), 6))
        return pd.DataFrame({"period": periods, "score": scores})

    return detect(col)


def _fill_kernel(mode: str, const: float | None = None):
    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def fill(series: pd.Series) -> pd.Series:
        out = []
        for arr in series:
            if arr is None or len(arr) == 0:
                out.append([])
                continue
            x = np.asarray(
                [np.nan if v is None else float(v) for v in arr], dtype=np.float64
            )
            s = pd.Series(x)
            if mode == "forward":
                s = s.ffill()
            elif mode == "backward":
                s = s.bfill()
            elif mode == "const":
                s = s.fillna(const)
            elif mode == "linear":
                s = s.interpolate(method="linear", limit_direction="both")
            y = s.to_numpy()
            out.append([None if np.isnan(v) else round(float(v), 6) for v in y])
        return pd.Series(out)

    return fill


def series_fill_forward(col: Column) -> Column:
    """KQL series_fill_forward: nulls take the previous non-null value
    (leading nulls remain null)."""
    return _fill_kernel("forward")(col)


def series_fill_backward(col: Column) -> Column:
    """KQL series_fill_backward: nulls take the next non-null value."""
    return _fill_kernel("backward")(col)


def series_fill_const(col: Column, value: float = 0.0) -> Column:
    """KQL series_fill_const."""
    return _fill_kernel("const", value)(col)


def series_fill_linear(col: Column) -> Column:
    """KQL series_fill_linear: linear interpolation across null gaps,
    edges extended from the nearest non-null."""
    return _fill_kernel("linear")(col)


def series_fit_2lines(col: Column) -> Column:
    """KQL series_fit_2lines: best two-segment least-squares fit per
    series → struct (rsquare, split_idx, left/right slope+intercept).
    All splits evaluated at once from prefix sums (O(n) per series,
    vectorized over split points); x is the global 0..n−1 index for
    both segments, matching series_fit_line's axis."""

    @F.pandas_udf(
        "rsquare double, split_idx long, left_slope double,"
        " left_intercept double, right_slope double, right_intercept double"
    )
    def fit2(series: pd.Series) -> pd.DataFrame:
        rows = []
        for arr in series:
            if arr is None or len(arr) < 4:
                rows.append((None, None, None, None, None, None))
                continue
            y = np.asarray(arr, dtype=np.float64)
            n = len(y)
            x = np.arange(n, dtype=np.float64)
            cx, cxx = np.cumsum(x), np.cumsum(x * x)
            cy, cxy, cyy = np.cumsum(y), np.cumsum(x * y), np.cumsum(y * y)
            ks = np.arange(2, n - 1)  # left = [0,k), right = [k,n)
            m_l = ks.astype(np.float64)
            Sx_l, Sxx_l = cx[ks - 1], cxx[ks - 1]
            Sy_l, Sxy_l, Syy_l = cy[ks - 1], cxy[ks - 1], cyy[ks - 1]
            m_r = n - m_l
            Sx_r, Sxx_r = cx[-1] - Sx_l, cxx[-1] - Sxx_l
            Sy_r, Sxy_r, Syy_r = cy[-1] - Sy_l, cxy[-1] - Sxy_l, cyy[-1] - Syy_l

            def seg_fit(m, Sx, Sxx, Sy, Sxy, Syy):
                den = m * Sxx - Sx * Sx
                with np.errstate(divide="ignore", invalid="ignore"):
                    a = np.where(den != 0, (m * Sxy - Sx * Sy) / den, 0.0)
                    b = (Sy - a * Sx) / m
                rss = (
                    Syy + a * a * Sxx + b * b * m
                    - 2 * a * Sxy - 2 * b * Sy + 2 * a * b * Sx
                )
                return a, b, np.maximum(rss, 0.0)

            a_l, b_l, rss_l = seg_fit(m_l, Sx_l, Sxx_l, Sy_l, Sxy_l, Syy_l)
            a_r, b_r, rss_r = seg_fit(m_r, Sx_r, Sxx_r, Sy_r, Sxy_r, Syy_r)
            total = rss_l + rss_r
            best = int(np.argmin(total))
            ss_tot = float(((y - y.mean()) ** 2).sum())
            r2 = 1.0 - float(total[best]) / ss_tot if ss_tot > 0 else 1.0
            rows.append(
                (
                    round(r2, 6),
                    int(ks[best]),
                    round(float(a_l[best]), 6),
                    round(float(b_l[best]), 6),
                    round(float(a_r[best]), 6),
                    round(float(b_r[best]), 6),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "rsquare", "split_idx", "left_slope",
                "left_intercept", "right_slope", "right_intercept",
            ],
        )

    return fit2(col)


def series_decompose_forecast(col: Column, points: int, period: int) -> Column:
    """KQL series_decompose_forecast: decompose the series (same
    STL-lite as series_decompose) and extend the baseline `points`
    steps ahead — linear extrapolation of the trend (least-squares
    slope over the last two periods, falling back to the whole trend)
    plus the repeating seasonal component. Returns one array of length
    len(series) + points (in-sample baseline ‖ forecast), 6dp. Arrow
    batch kernel, row-local — the forecast of a million series is one
    narrow stage."""

    @F.pandas_udf("array<double>")
    def forecast(series: pd.Series) -> pd.Series:
        out = []
        for arr in series:
            if arr is None or len(arr) == 0:
                out.append([])
                continue
            x = np.asarray(arr, dtype=np.float64)
            n = len(x)
            w = max(int(period), 1)
            pad = np.pad(x, (w // 2, w - 1 - w // 2), mode="edge")
            trend = np.convolve(pad, np.full(w, 1.0 / w), mode="valid")
            if w > 1 and n >= 2 * w:
                detr = x - trend
                phase = np.arange(n) % w
                # per-phase means over INTERIOR samples only — the
                # edge-padded trend samples are biased and would leak
                # trend error into the seasonal profile
                lo, hi = w // 2, n - (w - 1 - w // 2)
                use = np.zeros(n, dtype=bool)
                use[lo:hi] = True
                smeans = np.array(
                    [
                        detr[use & (phase == p)].mean()
                        if (use & (phase == p)).any()
                        else detr[phase == p].mean()
                        for p in range(w)
                    ]
                )
                smeans -= smeans.mean()
                seasonal = smeans[phase]
            else:
                smeans = np.zeros(w)
                seasonal = np.zeros(n)
            # Extrapolate from the INTERIOR trend only: the first/last
            # ⌈w/2⌉ moving-average samples lean on edge padding and are
            # biased toward flat, which would systematically bend the
            # forecast. Anchor = last interior sample; slope = LSQ over
            # the interior (whole-series fallback when too short).
            a, b = w // 2, w - 1 - w // 2
            if n - a - b >= 2:
                interior = trend[a:n - b] if b else trend[a:]
                anchor_idx = n - b - 1
            else:
                interior = trend
                anchor_idx = n - 1
            xs = np.arange(len(interior), dtype=np.float64)
            slope = np.polyfit(xs, interior, 1)[0] if len(interior) >= 2 else 0.0
            base_in = trend + seasonal
            fut_idx = np.arange(n, n + int(points), dtype=np.float64)
            fut_trend = interior[-1] + slope * (fut_idx - anchor_idx)
            fut_seasonal = smeans[(n + np.arange(int(points))) % w]
            out.append(
                np.concatenate([base_in, fut_trend + fut_seasonal])
                .round(6)
                .tolist()
            )
        return pd.Series(out)

    return forecast(col)
