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
    r_tagged = right.select(
        *keys,
        F.col(ts_col),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("__tag", F.lit(0))
    r_tagged = r_tagged.withColumn(f"{ts_col}{suffix}", F.col(ts_col))

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__tag").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned
    for c in [f"{v}{suffix}" for v in value_cols] + [f"{ts_col}{suffix}"]:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return carried.filter(F.col("__tag") == 1).drop("__tag")
