"""Bucketed range join: `left.point BETWEEN right.lo AND right.hi`.

A naive inequality join plans BroadcastNestedLoopJoin — O(|L|·|R|) and
a cluster-killer at scale. The bucketed formulation assigns each point
to one bucket of width `w` and explodes each interval into the buckets
it overlaps, then EQUI-joins on (key?, bucket) and re-filters exactly.
Cost: |L| + Σ interval_len/w right rows through one hash join — the
standard trick Spark users apply manually (and Databricks' range-join
hint automates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join points to enclosing intervals (inclusive bounds).

    `bucket_width` should be on the order of the typical interval
    length: too small explodes intervals into many buckets, too large
    degrades the equi-join into a near-cross within buckets.
    """
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    joined = p.join(i, "__bucket", how).filter(
        F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    )
    return joined.drop("__bucket")
