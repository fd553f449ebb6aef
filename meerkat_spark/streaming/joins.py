"""Stream-stream joins (SURVEY.md §2.2.6 streaming semantics): the
impression↔click shape — two unbounded sources correlated on a key
within a bounded event-time interval. Spark's watermark + time-range
join condition lets the state store evict rows once they can no longer
match, so state stays bounded no matter how long the streams run — the
property that matters on an unbounded 100 TB/day feed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING DataFrames on equality keys `on` plus the
    event-time band right_ts ∈ [left_ts + lower, left_ts + upper].
    Both sides get `watermark`; lower/upper are interval strings
    (lower may be negative: '-5 minutes'). `how` inner or left-outer
    (outer emits unmatched left rows once the watermark passes —
    Spark's required condition for outer stream-stream joins).

    Right-side columns are suffixed '_r' (join keys excluded) so the
    result schema is collision-free."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    keys = list(on)
    ren = {
        c: f"{c}_r" for c in rw.columns if c not in keys and c in lw.columns
    }
    for old, new in ren.items():
        rw = rw.withColumnRenamed(old, new)
    rts = ren.get(right_ts, right_ts)
    cond: Column | None = None
    for k in keys:
        c = lw[k] == rw[k]
        cond = c if cond is None else (cond & c)
    band = (
        F.col(rts)
        >= F.col(left_ts) + F.expr(f"INTERVAL {lower.lstrip('+')}")
    ) & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    cond = band if cond is None else (cond & band)
    joined = lw.join(rw, on=cond, how=how)
    # equality keys appear on both sides after a condition join — keep
    # the left copy only
    for k in keys:
        joined = joined.drop(rw[k])
    return joined
