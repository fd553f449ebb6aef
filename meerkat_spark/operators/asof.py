"""As-of join: for each left row, the most recent right row with
right.ts <= left.ts (per key) — THE temporal enrich for an event store
(the reference is "columnar storage for events and timeseries",
reference README.md:3; Spark has no native as-of join).

Union+window formulation (scale-correct):
  tag left/right → unionByName → per-key window ordered by (ts, tag)
  carrying last non-null right values forward → keep left rows.

ONE shuffle (the window partition on the key), no pairwise join blowup,
no BroadcastNestedLoop — wall-clock is a sort within key partitions.
The alternative applyInPandas+merge_asof needs the same shuffle plus
Arrow transfer, so the pure-JVM window wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: list[str] | str = "user_id",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. Right rows at ts' <= left.ts match (latest wins,
    ties include equal timestamps). Unmatched left rows keep nulls.

    Output: all left columns + `<value><suffix>` for each right value
    column + `<ts_col><suffix>` (the matched right timestamp).
    """
    keys = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys + [ts_col]]

    # tag: right rows sort BEFORE left rows at equal ts (<= semantics)
    l_tagged = left.withColumn("__tag", F.lit(1))
    # All matched values ride in ONE struct so they come from the SAME
    # (latest) right row — per-column last(ignorenulls) would skip over
    # a legitimately-NULL value in the latest row and resurrect an older
    # row's value (and could mix columns from different rows).
    r_tagged = right.select(
        *keys,
        F.col(ts_col),
        F.struct(
            F.col(ts_col).alias(f"{ts_col}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        ).alias("__rvals"),
    ).withColumn("__tag", F.lit(0))

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__tag").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn(
        "__rvals", F.last("__rvals", ignorenulls=True).over(w)
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"__rvals.{v}{suffix}").alias(f"{v}{suffix}") for v in value_cols
    ] + [F.col(f"__rvals.{ts_col}{suffix}").alias(f"{ts_col}{suffix}")]
    return carried.filter(F.col("__tag") == 1).select(*out_cols)
