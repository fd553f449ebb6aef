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
