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
        # Shape chosen for scale: matched rows (and full-outer's
        # left-only rows, whose interval id is null) pass through with
        # no extra shuffle; only the ≤|intervals| candidate replicas go
        # through an anti-join against the matched interval ids. A
        # window over the interval id instead would hash every left-only
        # row of a full join into one null-key partition — a
        # single-task straggler at exactly the scale this module
        # exists for.
        matched_ids = (
            joined.filter(F.col("__pmark").isNotNull() & F.col("__iid").isNotNull())
            .select("__iid")
            .distinct()
        )
        unmatched_candidates = joined.filter(
            F.col("__pmark").isNull()
            & (F.col("__ib").isNull() | (F.col("__ib") == first_bucket))
        )
        joined = joined.filter(F.col("__pmark").isNotNull()).unionByName(
            unmatched_candidates.join(matched_ids, "__iid", "left_anti")
        )
        joined = joined.drop("__iid")
    return joined.drop("__pb", "__ib", "__pmark")
