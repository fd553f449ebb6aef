"""Incremental rollup tables — the continuous-aggregate / hypertable-
rollup pattern: a stored aggregate that new batches EXTEND without
re-reading the raw corpus. The reference's storage layer stops at
segments (src/store/, reference README.md:20-22); this supplies the
maintenance dataflow its design implies, in the same build-once/
extend-many shape as the persisted MinHash and IVF indexes
(text/dedup_index.py, similarity/ivf_index.py).

Design: the stored table holds MERGE STATES, not final values — count,
sum, sum-of-squares, min, max per (time bucket, dims). States are
associative/commutative, so extending is: aggregate the NEW batch
(partial agg only — map-side combine), read back ONLY the time
partitions the batch touches (partition pruning via the day layout),
merge, and dynamically overwrite those partitions. A year of history
never gets re-read because today's batch arrived. Finalization
(avg/variance) happens at query time from the states.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TIME_COL = "_rollup_day"
STATE_COLS = ("_n", "_sum", "_sumsq", "_min", "_max")


def _states(value_col: str) -> list:
    v = F.col(value_col).cast("double")
    return [
        F.count(v).alias("_n"),
        F.sum(v).alias("_sum"),
        F.sum(v * v).alias("_sumsq"),
        F.min(v).alias("_min"),
        F.max(v).alias("_max"),
    ]


def _aggregate(df: DataFrame, keys: list[str], ts_col: str, value_col: str) -> DataFrame:
    day = F.date_format(F.col(ts_col).cast("timestamp"), "yyyy-MM-dd").alias(TIME_COL)
    return df.groupBy(day, *[F.col(k) for k in keys]).agg(*_states(value_col))


def _merge(df: DataFrame, keys: list[str]) -> DataFrame:
    return df.groupBy(TIME_COL, *keys).agg(
        F.sum("_n").alias("_n"),
        F.sum("_sum").alias("_sum"),
        F.sum("_sumsq").alias("_sumsq"),
        F.min("_min").alias("_min"),
        F.max("_max").alias("_max"),
    )


def rollup_build(
    df: DataFrame, path: str, keys: list[str], ts_col: str, value_col: str
) -> None:
    """Create the rollup store: one partial-aggregate pass, written
    partitioned by day (the partition layout IS the incremental-merge
    index)."""
    _aggregate(df, keys, ts_col, value_col).write.partitionBy(
        TIME_COL
    ).mode("overwrite").parquet(path)


def rollup_extend(
    batch: DataFrame, path: str, keys: list[str], ts_col: str, value_col: str
) -> None:
    """Merge a new batch into the store. Only the day partitions the
    batch touches are read back and rewritten (dynamic partition
    overwrite); the touched-day list is a bounded collect (distinct
    days in ONE batch)."""
    spark = batch.sparkSession
    # eager localCheckpoint, not cache: the batch aggregate is consumed
    # twice (touched-day probe + merge), and a cached plan pins its
    # uncoalesced shuffle partitioning for every consumer (AQE cannot
    # re-plan through InMemoryRelation), so the probe and the merge each
    # re-shuffled the full partition width. The checkpoint materializes
    # the AQE-coalesced partial aggregate once; both consumers read it.
    fresh = _aggregate(batch, keys, ts_col, value_col).localCheckpoint()
    days = [r[0] for r in fresh.select(TIME_COL).distinct().collect()]
    if not days:
        return
    stored = spark.read.parquet(path).filter(F.col(TIME_COL).isin(days))
    merged = _merge(stored.unionByName(fresh), keys)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.partitionBy(TIME_COL).mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def rollup_query(
    spark: SparkSession,
    path: str,
    days: list[str] | None = None,
) -> DataFrame:
    """Finalized aggregates from the stored states: count, sum, avg,
    min, max, sample variance. A `days` filter prunes partitions at
    the scan (PartitionFilters — no foreign days are read)."""
    df = spark.read.parquet(path)
    if days is not None:
        df = df.filter(F.col(TIME_COL).isin(list(days)))
    n = F.col("_n")
    s = F.col("_sum")
    ss = F.col("_sumsq")
    others = [c for c in df.columns if c not in STATE_COLS]
    return df.select(
        *others,
        n.alias("count"),
        s.alias("sum"),
        (s / n).alias("avg"),
        F.col("_min").alias("min"),
        F.col("_max").alias("max"),
        F.when(n > 1, (ss - s * s / n) / (n - 1)).alias("variance"),
    )
