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


def series_fir(
    col: Column,
    weights: list[float],
    normalize: bool | None = None,
    center: bool = False,
) -> Column:
    """KQL series_fir — Kusto-exact signature (r16):
    `series_fir(series, filter [, normalize [, center]])`. `normalize`
    defaults to true when every coefficient is non-negative (Kusto's
    rule) and may not be true for filters with negative coefficients;
    `center` defaults to FALSE (causal: y[i] = Σ f[k]·x[i-k], zero-
    padded leading edge — Kusto's documented moving-sum example
    series_fir([1..], [1,1,1], false, false) = [1,3,6,...]), true
    applies the window symmetrically (np 'same')."""
    w = np.asarray(weights, dtype=np.float64)
    if normalize is None:
        normalize = bool((w >= 0).all())
    if normalize:
        if (w < 0).any():
            raise ValueError(
                "series_fir: normalize=true is invalid for filters with "
                "negative coefficients (Kusto rule) — pass normalize=false"
            )
        s = w.sum()
        if s != 0:
            w = w / s

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


def series_outliers(
    col: Column,
    kind: str = "ctukey",
    ignore_val: float | None = None,
    min_percentile: float = 10.0,
    max_percentile: float = 90.0,
) -> Column:
    """KQL series_outliers — Kusto-exact Tukey's fence scores (r16):
    `series_outliers(series [, kind [, ignore_val [, min_percentile
    [, max_percentile]]]])`. kind='ctukey' (Kusto default) fences on
    the custom [min_percentile, max_percentile] quantiles (default
    10/90); kind='tukey' uses the traditional 25/75. Scores are
    (x − q_hi)/IQR above the high fence, (x − q_lo)/IQR below the low
    one, 0 inside — so |score| > 1.5 is Kusto's mild outlier and
    > 3.0 a strong one. NaNs and `ignore_val` points are excluded
    from the quantiles and score 0; a degenerate IQR of 0 scores the
    whole series 0."""
    if kind not in ("tukey", "ctukey"):
        raise ValueError("series_outliers kind must be 'tukey' or 'ctukey'")
    lo_p, hi_p = (25.0, 75.0) if kind == "tukey" else (
        float(min_percentile),
        float(max_percentile),
    )

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def outliers(series: pd.Series) -> pd.Series:
        out = []
        for arr in series:
            if arr is None or len(arr) == 0:
                out.append([])
                continue
            x = np.asarray(arr, dtype=np.float64)
            mask = ~np.isnan(x)
            if ignore_val is not None:
                mask &= x != ignore_val
            valid = x[mask]
            if len(valid) == 0:
                out.append([0.0] * len(x))
                continue
            q_lo, q_hi = np.percentile(valid, [lo_p, hi_p])
            iqr = q_hi - q_lo
            if iqr == 0:
                out.append([0.0] * len(x))
                continue
            score = np.where(
                x > q_hi, (x - q_hi) / iqr, np.where(x < q_lo, (x - q_lo) / iqr, 0.0)
            )
            score = np.where(mask, score, 0.0)
            out.append(np.round(score, 6).tolist())
        return pd.Series(out)

    return outliers(col)


def _zscore_flags(col: Column, threshold: float = 2.5) -> Column:
    """±1 z-score flags (the pre-r16 series_outliers body) — kept as
    the residual-flagging kernel of series_decompose_anomalies, whose
    documented contract is flag output robust to exactly-zero residual
    IQRs (a decomposition that reconstructs exactly would zero a Tukey
    fence's IQR and mask real spikes)."""

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
    """KQL series_fit_line: least-squares line fit per series → the
    documented 6-field Kusto tuple, IN KUSTO ORDER so multi-assign
    extend binds positionally like the real engine (r14 — the struct
    was a 3-field subset before): (rsquare, slope, variance,
    rvariance, interception, line_fit). variance = population variance
    of the input, rvariance = residual variance, line_fit = the
    fitted values."""

    @F.pandas_udf(
        "rsquare double, slope double, variance double, "
        "rvariance double, interception double, line_fit array<double>"
    )
    def fit(series: pd.Series) -> pd.DataFrame:
        rows = {
            "rsquare": [], "slope": [], "variance": [],
            "rvariance": [], "interception": [], "line_fit": [],
        }
        for arr in series:
            if arr is None or len(arr) < 2:
                for k in rows:
                    rows[k].append(None)
                continue
            y = np.asarray(arr, dtype=np.float64)
            x = np.arange(len(y), dtype=np.float64)
            slope, intercept = np.polyfit(x, y, 1)
            pred = slope * x + intercept
            ss_res = float(((y - pred) ** 2).sum())
            ss_tot = float(((y - y.mean()) ** 2).sum())
            r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 1.0
            rows["rsquare"].append(round(r2, 6))
            rows["slope"].append(round(float(slope), 6))
            rows["variance"].append(round(float(y.var()), 6))
            rows["rvariance"].append(round(ss_res / len(y), 6))
            rows["interception"].append(round(float(intercept), 6))
            rows["line_fit"].append([round(float(v), 6) for v in pred])
        return pd.DataFrame(
            {k: pd.Series(v, dtype="object") for k, v in rows.items()}
        )

    return fit(col)


def _detect_period_np(x: "np.ndarray", max_period: int = 0) -> tuple[int, float]:
    """Dominant cycle of one series: periodogram over the least-squares
    detrended values (rfft power spectrum), period = n/argmax rounded
    to the nearest integer lag, score = candidate power / total power.
    (0, 0.0) when nothing beats the flat spectrum or the candidate
    falls outside [2, cap]. Shared by series_periods_detect and the
    period=-1 autodetect mode of decompose/anomalies/forecast."""
    n = len(x)
    if n < 4:
        return 0, 0.0
    t = np.arange(n, dtype=np.float64)
    slope, intercept = np.polyfit(t, x, 1)
    d = x - (slope * t + intercept)
    power = np.abs(np.fft.rfft(d)) ** 2
    power[0] = 0.0  # DC
    total = power.sum()
    if total <= 0:
        return 0, 0.0
    k = int(power.argmax())
    period = int(round(n / k)) if k > 0 else 0
    cap = max_period if max_period > 0 else n // 2
    if period > cap or period < 2:
        return 0, 0.0
    return period, round(float(power[k] / total), 6)


def _resolve_period(x: "np.ndarray", period: int) -> int:
    """Kusto period semantics: -1 = autodetect (periodogram; 1 when no
    cycle is found → trend-only decomposition), else the explicit
    value floored at 1."""
    if period == -1:
        return _detect_period_np(x)[0] or 1
    return max(int(period), 1)


def series_decompose(col: Column, period: int = -1) -> Column:
    """KQL series_decompose (moving-average STL-lite): per series →
    struct (baseline, seasonal, trend, residual), each an array the
    length of the input. trend = centered moving average over one
    period; seasonal = per-phase mean of the detrended series (zero
    when period <= 1 or the series is shorter than two periods);
    residual = series - trend - seasonal; baseline = trend + seasonal.
    period=-1 (Kusto's default) autodetects per series via the
    series_periods_detect periodogram. Deterministic numpy per row —
    row-local, shuffle-free."""

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
            w = _resolve_period(x, period)
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


def series_decompose_anomalies(col: Column, period: int = -1, threshold: float = 2.5) -> Column:
    """KQL series_decompose_anomalies: z-score flags (±1) over the
    decomposition residual — seasonal spikes don't false-positive.
    period=-1 autodetects (Kusto default)."""
    dec = series_decompose(col, period)
    return _zscore_flags(dec.getField("residual"), threshold)


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
            if arr is None:
                periods.append(0)
                scores.append(0.0)
                continue
            p, s = _detect_period_np(
                np.asarray(arr, dtype=np.float64), max_period
            )
            periods.append(p)
            scores.append(s)
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
            w = _resolve_period(x, period)
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


# ------------------------------------------------- elementwise arithmetic
# KQL's series arithmetic family (series_add .. series_not_equals,
# series_sum/product/magnitude, series_pearson_correlation). These are
# pure JVM higher-order functions (transform / zip_with / aggregate) —
# no Python in the hot path, so a million-series column stays inside
# whole-stage codegen. Null elements propagate to null outputs;
# length-mismatched pairs follow zip_with (short side null-padded)
# where Kusto errors — documented delta, COVERAGE.md.


def _acol(x) -> Column:
    return x if isinstance(x, Column) else F.col(x) if isinstance(x, str) else F.lit(x)


def _map1(x, fn) -> Column:
    return F.transform(_acol(x), lambda v: fn(v.cast("double")))


def _map2(a, b, fn) -> Column:
    """series ⊗ series when both are array columns, series ⊗ scalar when
    `b` is a number (Kusto allows either operand scalar; scalar-first
    callers can rely on the symmetric wrappers below)."""
    if isinstance(b, (int, float)) and not isinstance(b, bool):
        s = F.lit(float(b))
        return F.transform(_acol(a), lambda v: fn(v.cast("double"), s))
    return F.zip_with(
        _acol(a), _acol(b), lambda u, v: fn(u.cast("double"), v.cast("double"))
    )


def series_add(a, b) -> Column:
    """KQL series_add — elementwise a + b."""
    return _map2(a, b, lambda u, v: u + v)


def series_subtract(a, b) -> Column:
    """KQL series_subtract — elementwise a − b."""
    return _map2(a, b, lambda u, v: u - v)


def series_multiply(a, b) -> Column:
    """KQL series_multiply — elementwise a · b."""
    return _map2(a, b, lambda u, v: u * v)


def series_divide(a, b) -> Column:
    """KQL series_divide — elementwise a / b; division by zero yields
    null (try_divide — ANSI-safe; Kusto renders ±inf, a documented
    delta since the engine's doubles avoid non-finite values)."""
    return _map2(a, b, lambda u, v: F.try_divide(u, v))


def series_pow(a, b) -> Column:
    """KQL series_pow — elementwise a^b."""
    return _map2(a, b, lambda u, v: F.pow(u, v))


def series_greater(a, b) -> Column:
    """KQL series_greater — elementwise a > b (array<boolean>)."""
    return _map2(a, b, lambda u, v: u > v)


def series_greater_equals(a, b) -> Column:
    return _map2(a, b, lambda u, v: u >= v)


def series_less(a, b) -> Column:
    return _map2(a, b, lambda u, v: u < v)


def series_less_equals(a, b) -> Column:
    return _map2(a, b, lambda u, v: u <= v)


def series_equals(a, b) -> Column:
    return _map2(a, b, lambda u, v: u == v)


def series_not_equals(a, b) -> Column:
    return _map2(a, b, lambda u, v: u != v)


def series_abs(x) -> Column:
    """KQL series_abs — elementwise |x|."""
    return _map1(x, F.abs)


def series_sign(x) -> Column:
    return _map1(x, F.signum)


def series_exp(x) -> Column:
    return _map1(x, F.exp)


def series_log(x) -> Column:
    """KQL series_log — natural log; non-positive elements → null
    (Spark ln semantics)."""
    return _map1(x, F.log)


def series_sin(x) -> Column:
    return _map1(x, F.sin)


def series_cos(x) -> Column:
    return _map1(x, F.cos)


def series_tan(x) -> Column:
    return _map1(x, F.tan)


def series_asin(x) -> Column:
    return _map1(x, F.asin)


def series_acos(x) -> Column:
    return _map1(x, F.acos)


def series_atan(x) -> Column:
    return _map1(x, F.atan)


def series_floor(x) -> Column:
    return _map1(x, lambda v: F.floor(v).cast("double"))


def series_ceiling(x) -> Column:
    return _map1(x, lambda v: F.ceiling(v).cast("double"))


def series_sum(x) -> Column:
    """KQL series_sum — Σxᵢ, left-to-right fold (deterministic order,
    matches a sequential SQL expression term-for-term)."""
    return F.aggregate(
        _acol(x), F.lit(0.0), lambda acc, v: acc + v.cast("double")
    )


def series_product(x) -> Column:
    """KQL series_product — Πxᵢ, left-to-right fold."""
    return F.aggregate(
        _acol(x), F.lit(1.0), lambda acc, v: acc * v.cast("double")
    )


def series_magnitude(x) -> Column:
    """KQL series_magnitude — L2 norm √Σxᵢ²."""
    return F.sqrt(
        F.aggregate(
            _acol(x),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def series_pearson_correlation(a, b) -> Column:
    """KQL series_pearson_correlation — r over the two arrays:
    (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)); null when either
    variance is zero. All folds are left-to-right JVM aggregates, so
    the arithmetic is reproducible term-for-term in an oracle that
    writes the same association order."""
    ac, bc = _acol(a), _acol(b)
    n = F.size(ac).cast("double")
    fold = lambda arr, f: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, v: acc + f(v.cast("double"))
    )
    sx = fold(ac, lambda v: v)
    sy = fold(bc, lambda v: v)
    sxx = fold(ac, lambda v: v * v)
    syy = fold(bc, lambda v: v * v)
    sxy = F.aggregate(
        F.zip_with(ac, bc, lambda u, v: u.cast("double") * v.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return F.when(den > 0, (n * sxy - sx * sy) / den)


def series_iir(col: Column, b: list[float], a: list[float]) -> Column:
    """KQL series_iir — infinite-impulse-response filter with feed-
    forward coefficients `b` and feedback `a` (a[0] normalizes):
    y[n] = (Σₖ b[k]·x[n−k] − Σ_{k≥1} a[k]·y[n−k]) / a[0].
    The recurrence is inherently sequential per series, so this is the
    sanctioned Arrow kernel path (row-local, no shuffle); e.g.
    b=[1], a=[1,-1] gives the cumulative sum."""
    bv = [float(v) for v in b]
    av = [float(v) for v in a]
    if not av or av[0] == 0:
        raise ValueError("series_iir: a[0] must be non-zero")

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def iir(series: pd.Series) -> pd.Series:
        out = []
        for arr in series:
            if arr is None or len(arr) == 0:
                out.append([])
                continue
            x = np.asarray(arr, dtype=np.float64)
            n = len(x)
            y = np.zeros(n)
            for i in range(n):
                acc = 0.0
                for k, bk in enumerate(bv):
                    if i - k >= 0:
                        acc += bk * x[i - k]
                for k in range(1, len(av)):
                    if i - k >= 0:
                        acc -= av[k] * y[i - k]
                y[i] = acc / av[0]
            out.append(y.round(6).tolist())
        return pd.Series(out)

    return iir(_acol(col))


def series_seasonal(col: Column, period: int = -1) -> Column:
    """KQL series_seasonal — the repeating seasonal profile: per-phase
    MEDIAN of the values at each period offset (Kusto's definition),
    tiled to the series length. period=-1 autodetects via the
    series_periods_detect periodogram; detection failure (or period
    <= 0) yields an all-zero series, matching Kusto."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def seasonal(series: pd.Series) -> pd.Series:
        out = []
        for arr in series:
            if arr is None or len(arr) == 0:
                out.append([])
                continue
            x = np.asarray(arr, dtype=np.float64)
            n = len(x)
            w = int(period)
            if w == -1 and n >= 4:
                t = np.arange(n, dtype=np.float64)
                slope, intercept = np.polyfit(t, x, 1)
                power = np.abs(np.fft.rfft(x - (slope * t + intercept))) ** 2
                power[0] = 0.0
                k = int(power.argmax()) if power.sum() > 0 else 0
                w = int(round(n / k)) if k > 0 else 0
                if w < 2 or w > n // 2:
                    w = 0
            if w < 2 or n < w:
                out.append([0.0] * n)
                continue
            phase = np.arange(n) % w
            med = np.array([float(np.median(x[phase == p])) for p in range(w)])
            out.append(med[phase].round(6).tolist())
        return pd.Series(out)

    return seasonal(_acol(col))


def series_fit_poly(col: Column, degree: int = 1) -> Column:
    """KQL series_fit_poly — least-squares polynomial fit per series →
    struct (rsquare, coefficients) with coefficients ordered from the
    highest power down (Kusto's order; x axis = 0..n−1). Deterministic
    numpy per row, row-local."""
    deg = int(degree)

    @F.pandas_udf("rsquare double, coefficients array<double>")
    def fitp(series: pd.Series) -> pd.DataFrame:
        r2s, coefs = [], []
        for arr in series:
            if arr is None or len(arr) <= deg:
                r2s.append(None)
                coefs.append(None)
                continue
            y = np.asarray(arr, dtype=np.float64)
            x = np.arange(len(y), dtype=np.float64)
            c = np.polyfit(x, y, deg)
            pred = np.polyval(c, x)
            ss_res = float(((y - pred) ** 2).sum())
            ss_tot = float(((y - y.mean()) ** 2).sum())
            r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 1.0
            r2s.append(round(r2, 6))
            coefs.append([round(float(v), 6) for v in c])
        return pd.DataFrame({"rsquare": r2s, "coefficients": coefs})

    return fitp(_acol(col))


def series_stats_dynamic(col: Column) -> Column:
    """KQL series_stats_dynamic: per-series summary bag — min/min_idx,
    max/max_idx, avg, stdev, variance (sample), sum. Indexes are
    0-based first occurrences (Kusto). Pure JVM HOF arithmetic —
    row-local, codegen, no Python. Null for empty/null series."""
    c = col if isinstance(col, Column) else F.col(col)
    arr = F.transform(c, lambda x: x.cast("double"))
    n = F.size(arr)
    mn = F.array_min(arr)
    mx = F.array_max(arr)
    s = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)
    avg = s / n
    ss = F.aggregate(arr, F.lit(0.0), lambda a, x: a + (x - avg) * (x - avg))
    var = F.when(n > 1, ss / (n - 1)).otherwise(F.lit(0.0))
    return F.when(
        n > 0,
        F.struct(
            mn.alias("min"),
            (F.array_position(arr, mn) - 1).cast("long").alias("min_idx"),
            mx.alias("max"),
            (F.array_position(arr, mx) - 1).cast("long").alias("max_idx"),
            avg.alias("avg"),
            F.sqrt(var).alias("stdev"),
            var.alias("variance"),
            s.alias("sum"),
        ),
    )


def series_fft(col: Column) -> Column:
    """KQL series_fft — discrete Fourier transform of a real series →
    struct (real, imag) arrays. numpy FFT per row (row-local)."""

    @F.pandas_udf("real array<double>, imag array<double>")
    def fft(series: pd.Series) -> pd.DataFrame:
        res, ims = [], []
        for arr in series:
            if arr is None or len(arr) == 0:
                res.append([])
                ims.append([])
                continue
            z = np.fft.fft(np.asarray(arr, dtype=np.float64))
            res.append(z.real.round(9).tolist())
            ims.append(z.imag.round(9).tolist())
        return pd.DataFrame({"real": res, "imag": ims})

    return fft(_acol(col))


def series_ifft(real_col, imag_col) -> Column:
    """KQL series_ifft — inverse DFT from (real, imag) arrays back to
    the real series (imaginary residue discarded after rounding, the
    roundtrip contract series_fft(series_ifft(x)) ≈ x)."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def ifft(re: pd.Series, im: pd.Series) -> pd.Series:
        out = []
        for r, i in zip(re, im):
            if r is None or len(r) == 0:
                out.append([])
                continue
            z = np.asarray(r, dtype=np.float64) + 1j * np.asarray(
                i if i is not None else np.zeros(len(r)), dtype=np.float64
            )
            out.append(np.fft.ifft(z).real.round(9).tolist())
        return pd.Series(out)

    return ifft(_acol(real_col), _acol(imag_col))


# ---------------------------------------------------------------- round 7
def series_fit_line_dynamic(col: Column) -> Column:
    """KQL series_fit_line_dynamic — the dynamic-bag form of
    series_fit_line: {rsquare, slope, variance, rvariance,
    interception, line_fit[]} (same least-squares math; variance =
    population variance of the series, rvariance of the residuals,
    Kusto's documented fields)."""
    import json

    @F.pandas_udf("string")
    def fitd(series: pd.Series) -> pd.Series:
        out = []
        for arr in series:
            if arr is None or len(arr) < 2:
                out.append(None)
                continue
            y = np.asarray(arr, dtype=np.float64)
            x = np.arange(len(y), dtype=np.float64)
            slope, intercept = np.polyfit(x, y, 1)
            pred = slope * x + intercept
            ss_res = float(((y - pred) ** 2).sum())
            ss_tot = float(((y - y.mean()) ** 2).sum())
            r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 1.0
            out.append(
                json.dumps(
                    {
                        "rsquare": round(r2, 6),
                        "slope": round(float(slope), 6),
                        "variance": round(float(y.var()), 6),
                        "rvariance": round(ss_res / len(y), 6),
                        "interception": round(float(intercept), 6),
                        "line_fit": [round(float(v), 6) for v in pred],
                    },
                    separators=(",", ":"),
                )
            )
        return pd.Series(out)

    return fitd(col)


def series_fit_2lines_dynamic(col: Column) -> Column:
    """KQL series_fit_2lines_dynamic — dynamic-bag form of
    series_fit_2lines: {rsquare, split_idx, variance, rvariance,
    line_fit[], left: {...}, right: {...}} (documented-subset fields;
    same prefix-sum split search as the struct form)."""
    import json

    @F.pandas_udf("string")
    def fit2d(series: pd.Series) -> pd.Series:
        out = []
        for arr in series:
            if arr is None or len(arr) < 4:
                out.append(None)
                continue
            y = np.asarray(arr, dtype=np.float64)
            n = len(y)
            x = np.arange(n, dtype=np.float64)
            best = (None, 1e300)
            for k in range(2, n - 1):
                a1, b1 = np.polyfit(x[:k], y[:k], 1)
                a2, b2 = np.polyfit(x[k:], y[k:], 1)
                p = np.concatenate([a1 * x[:k] + b1, a2 * x[k:] + b2])
                rss = float(((y - p) ** 2).sum())
                if rss < best[1]:
                    best = ((k, a1, b1, a2, b2, p), rss)
            (k, a1, b1, a2, b2, pred), ss_res = best
            ss_tot = float(((y - y.mean()) ** 2).sum())
            r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 1.0

            def seg(a, b, ys, ps):
                st = float(((ys - ys.mean()) ** 2).sum())
                sr = float(((ys - ps) ** 2).sum())
                return {
                    "slope": round(float(a), 6),
                    "interception": round(float(b), 6),
                    "rsquare": round(1.0 - sr / st if st > 0 else 1.0, 6),
                }

            out.append(
                json.dumps(
                    {
                        "rsquare": round(r2, 6),
                        "split_idx": k,
                        "variance": round(float(y.var()), 6),
                        "rvariance": round(ss_res / n, 6),
                        "line_fit": [round(float(v), 6) for v in pred],
                        "left": seg(a1, b1, y[:k], pred[:k]),
                        "right": seg(a2, b2, y[k:], pred[k:]),
                    },
                    separators=(",", ":"),
                )
            )
        return pd.Series(out)

    return fit2d(col)


def series_periods_validate(col: Column, *periods: int) -> Column:
    """KQL series_periods_validate — score the GIVEN candidate periods
    with the same detrended-periodogram metric series_periods_detect
    uses (score = spectral power at the candidate frequency / total;
    0 for periods outside [2, n/2])."""
    import json

    plist = [int(p) for p in periods]

    @F.pandas_udf("string")
    def validate(series: pd.Series) -> pd.Series:
        out = []
        for arr in series:
            if arr is None or len(arr) < 4:
                out.append(
                    json.dumps(
                        {"periods": plist, "scores": [0.0] * len(plist)},
                        separators=(",", ":"),
                    )
                )
                continue
            y = np.asarray(arr, dtype=np.float64)
            n = len(y)
            t = np.arange(n, dtype=np.float64)
            slope, intercept = np.polyfit(t, y, 1)
            d = y - (slope * t + intercept)
            power = np.abs(np.fft.rfft(d)) ** 2
            power[0] = 0.0
            total = float(power.sum())
            scores = []
            for p in plist:
                if total <= 0 or p < 2 or p > n // 2:
                    scores.append(0.0)
                    continue
                k = int(round(n / p))
                scores.append(
                    round(float(power[k] / total), 6)
                    if 0 < k < len(power)
                    else 0.0
                )
            out.append(
                json.dumps(
                    {"periods": plist, "scores": scores},
                    separators=(",", ":"),
                )
            )
        return pd.Series(out)

    return validate(col)
