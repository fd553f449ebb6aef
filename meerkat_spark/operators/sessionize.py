"""Greedy max-duration sessionization — the exact Kusto
`row_window_session` MaxWindowDuration semantics (reference KQL surface;
the reference repo ships no session operator — this follows the public
Kusto definition): within an idle-bounded segment, a session restarts
at the FIRST row whose time exceeds session_start + MaxDuration, with
the restart point data-dependent (greedy from the breaking row), not an
aligned sub-bucket of the segment start.

Scale shape: the idle/restart segmentation is a window pass (the
serialize-context cost the translator already guards); the greedy
refinement here is ONE applyInPandas over segment groups — segments
shuffle-distribute across executors, and the per-segment walk touches
only session boundaries (numpy searchsorted per session) when times are
monotone, so work is O(rows) + O(sessions · log seg_len) per segment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def greedy_session_first(
    df: DataFrame,
    seg_col: str | list[str],
    ord_col: str,
    us_col: str,
    val_col: str,
    out_name: str,
    max_us: int,
) -> DataFrame:
    """Append `out_name` = the session-FIRST value of `val_col`, where
    sessions split `seg_col` segments greedily: a new session starts at
    the first row with time > session_start + max_us (duration up to
    and including max_us stays in-session — "exceeds" is strict).

    Rows are ordered by `ord_col` within each segment; `us_col` is the
    epoch-microsecond time driving the duration cap."""
    out_field = df.schema[val_col]
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_name, out_field.dataType)]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ord_col).reset_index(drop=True)
        # null times: the translator's idle-break coalesces a null gap
        # to TRUE, so null-ts rows always arrive as single-row segments
        # — the fill value never influences a multi-row walk
        us = (
            pd.to_numeric(pdf[us_col], errors="coerce")
            .fillna(0)
            .to_numpy(dtype="int64")
        )
        vals = pdf[val_col]
        n = len(us)
        out = np.empty(n, dtype=object)
        if n:
            if bool(np.all(np.diff(us) >= 0)):
                # monotone times: jump session-boundary to boundary
                i = 0
                while i < n:
                    j = int(np.searchsorted(us, us[i] + max_us, side="right"))
                    out[i:j] = vals.iloc[i]
                    i = j
            else:
                # non-monotone Expr (legal after arbitrary serialize
                # orders): literal greedy recurrence
                start, sv = us[0], vals.iloc[0]
                for k in range(n):
                    if us[k] - start > max_us:
                        start, sv = us[k], vals.iloc[k]
                    out[k] = sv
        pdf[out_name] = pd.Series(out, index=pdf.index)
        return pdf

    seg_cols = [seg_col] if isinstance(seg_col, str) else list(seg_col)
    return df.groupBy(*seg_cols).applyInPandas(fn, schema)
