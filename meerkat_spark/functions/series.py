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
