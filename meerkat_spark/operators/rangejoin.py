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

from pyspark.sql import DataFrame, Window
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
    outer_right = how in (
        "right", "rightouter", "right_outer",
        "full", "fullouter", "full_outer", "outer",
    )
    p = points.withColumn(
        "__pb", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    ).withColumn("__pmark", F.lit(1))
    first_bucket = F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long")
    i = intervals
    if outer_right:
        # interval identity, assigned BEFORE the explode so every bucket
        # replica of one interval carries the same id (used below to
        # decide "matched nowhere" globally, not per replica)
        i = i.withColumn("__iid", F.monotonically_increasing_id())
    i = i.withColumn(
        "__ib",
        F.explode_outer(  # outer: null-bounded intervals survive for right/full
            F.sequence(
                first_bucket,
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    # The exact range predicate must live IN the join condition — a
    # post-join filter would drop the null-extended rows of outer kinds
    # (silently degrading left/right/full to inner). Catalyst still
    # hash-joins on the bucket equality; the range check is the join's
    # residual condition.
    cond = (F.col("__pb") == F.col("__ib")) & F.col(point_col).between(
        F.col(lo_col), F.col(hi_col)
    )
    joined = p.join(i, cond, how)
    if outer_right:
        # An interval spanning k buckets yields k replicas; replicas that
        # find no point in THEIR bucket come back null-extended even when
        # a sibling replica matched. Emitting "unmatched interval" per
        # replica is therefore wrong (spurious null rows) — decide it
        # globally: an interval gets its single null-extended row (the
        # first-bucket replica, or the null-bucket replica of
        # null-bounded intervals) only if NO replica matched anywhere.
        #
        # The matched-anywhere flag is a window over the interval id —
        # but ONLY over interval-side rows (__iid non-null), so a full
        # join's left-only rows (all-null interval side) never funnel
        # into one null-key window partition; they bypass via the second
        # branch. Critically, __iid (monotonically_increasing_id, NOT
        # stable across re-evaluations) is generated and consumed inside
        # the single window branch — the bypass branch never reads it,
        # so no cross-branch id consistency is required.
        matched_any = F.max("__pmark").over(Window.partitionBy("__iid"))
        interval_side = (
            joined.filter(F.col("__iid").isNotNull())
            .withColumn("__ima", matched_any)
            .filter(
                F.col("__pmark").isNotNull()
                | (
                    F.col("__ima").isNull()
                    & (F.col("__ib").isNull() | (F.col("__ib") == first_bucket))
                )
            )
            .drop("__ima")
        )
        left_only = joined.filter(F.col("__iid").isNull())  # full joins only
        joined = interval_side.unionByName(left_only).drop("__iid")
    return joined.drop("__pb", "__ib", "__pmark")
