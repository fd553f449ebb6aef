"""Mergeable frequency sketches: Misra-Gries heavy hitters and
Count-Min point estimates.

Why they exist (the 100-TB story): the exact `top-hitters` path is a
hash aggregation whose shuffle width is the number of DISTINCT keys —
fine for enum-ish columns, a multi-TB shuffle when the key is a URL,
user id, or n-gram over a web crawl. Both sketches bound what crosses
the wire regardless of key cardinality:

- Misra-Gries: each partition keeps at most `capacity` counters and
  emits them once at partition end, so the shuffle is
  O(capacity x partitions) rows no matter how many distinct keys the
  corpus holds. Summaries merge by plain summation (the sketch is a
  linear/mergeable summary), and the classic guarantee survives the
  merge: per partition the decremented mass is <= partition_rows /
  (capacity + 1), so globally any key with true count >
  N / (capacity + 1) is PRESENT in the merged summary, and for every
  emitted key  est <= true <= est + total_decrement.
- Count-Min: depth x width counters updated by `posexplode` of the
  per-row bucket array; Spark's partial (map-side) aggregation
  collapses each partition to <= depth x width rows before the
  exchange, so the shuffle is O(depth x width x partitions) and the
  merged table IS the sketch (counter arrays merge by summation).
  Estimates only ever over-count: est >= true, and with prob
  >= 1 - e^-depth the excess is <= e/width * N.

Reference parity: Kusto's `top-hitters` is documented as approximate;
the KQL front-end's default implementation here is exact (it ranks by
a real aggregation), and `evaluate heavy_hitters(...)` exposes this
sketch when the key cardinality makes exact ranking the bottleneck.

Determinism: both sketches hash with xxhash64 over the stringified key
at fixed seeds, and Misra-Gries eviction depends only on per-partition
value multisets — so for a fixed input partitioning the outputs are
bit-stable across runs (pinned in tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "misra_gries_summary",
    "heavy_hitters",
    "count_min_build",
    "count_min_estimate",
]


def _mg_partition_summarizer(key_name: str, weight_name: str | None,
                             capacity: int):
    """Build the mapInPandas generator: one Misra-Gries state per
    partition, carried across Arrow batches, emitted once at the end.

    Batched eviction: after merging a batch, if the table exceeds
    `capacity`, subtract the (capacity+1)-th largest count from every
    counter and drop the non-positive ones (equivalent to running the
    classic decrement step until <= capacity survive). `decr`
    accumulates the per-partition subtracted mass, emitted on a single
    sentinel row (key NULL) so the merge can bound the global error
    without knowing partition ids.
    """
    import pandas as pd

    def summarize(batches):
        counts: dict = {}
        decr = 0
        for pdf in batches:
            if weight_name is None:
                vc = pdf[key_name].value_counts(dropna=True)
            else:
                vc = (
                    pdf.dropna(subset=[key_name])
                    .groupby(key_name, sort=False)[weight_name]
                    .sum()
                )
            for k, v in vc.items():
                counts[k] = counts.get(k, 0) + v
            if len(counts) > capacity:
                vals = sorted(counts.values(), reverse=True)
                theta = vals[capacity]  # (capacity+1)-th largest
                decr += theta
                counts = {
                    k: v - theta for k, v in counts.items() if v > theta
                }
        # object dtype keeps int keys exact (a float64 coercion from
        # the None sentinel would corrupt >2^53 ids)
        yield pd.DataFrame(
            {
                key_name: pd.Series(
                    list(counts.keys()) + [None], dtype="object"
                ),
                "__mg_est": list(counts.values()) + [0],
                "__mg_decr": [0] * len(counts) + [decr],
            }
        )

    return summarize


def misra_gries_summary(
    df: DataFrame,
    key_col: str,
    capacity: int = 4096,
    weight_col: str | None = None,
) -> DataFrame:
    """Merged Misra-Gries summary: (key_col, est_count, count_error_max).

    `est_count` is a LOWER bound on the true (weighted) count;
    `est_count + count_error_max` an upper bound. Every key whose true
    count exceeds count_error_max (<= N / (capacity+1)) is guaranteed
    present. NULL keys are excluded (Kusto top-hitters convention).
    When no partition ever held more than `capacity` distinct keys the
    sketch degrades to EXACT counts with count_error_max = 0 — the
    oracle-graded regime of suite query `heavy_hitters_sketch`.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    num_t = (
        T.LongType() if weight_col is None
        else df.schema[weight_col].dataType
    )
    key_t = df.schema[key_col].dataType
    schema = T.StructType(
        [
            T.StructField(key_col, key_t),
            T.StructField("__mg_est", num_t),
            T.StructField("__mg_decr", num_t),
        ]
    )
    cols = [key_col] + ([weight_col] if weight_col else [])
    summaries = df.select(*cols).mapInPandas(
        _mg_partition_summarizer(key_col, weight_col, capacity),
        schema=schema,
    )
    # one tiny aggregation over O(capacity x partitions) rows: per-key
    # sums plus the global decremented mass on the sentinel rows
    merged = summaries.groupBy(key_col).agg(
        F.sum("__mg_est").alias("est_count"),
        F.sum("__mg_decr").alias("__decr"),
    )
    # attach the global error scalar with a window over MERGED — a
    # single-partition exchange over a frame already bounded to
    # <= capacity x partitions rows, NOT over the corpus. The obvious
    # alternative (crossJoin a 1-row agg of merged) re-executes the
    # whole mapInPandas corpus pass for the scalar branch — a doubled
    # 100-TB scan (caught by the PLANS.md audit: scans=2, py=2).
    from pyspark.sql import Window as W

    total_win = W.partitionBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return (
        merged.withColumn(
            "count_error_max",
            F.coalesce(F.sum("__decr").over(total_win), F.lit(0)).cast(num_t),
        )
        .filter(F.col(key_col).isNotNull())
        .drop("__decr")
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int,
    capacity: int = 4096,
    weight_col: str | None = None,
) -> DataFrame:
    """Top-k keys by Misra-Gries estimated count:
    (key_col, approximate_count, count_error_max), ranked
    approximate_count desc, key asc (total order — deterministic)."""
    s = misra_gries_summary(df, key_col, capacity, weight_col)
    return (
        s.select(
            key_col,
            F.col("est_count").alias("approximate_count"),
            "count_error_max",
        )
        .orderBy(F.col("approximate_count").desc(), F.col(key_col).asc())
        .limit(k)
    )


def _cm_bucket_array(key_col: str, depth: int, width: int, seed: int):
    """array<int> of the row's bucket per hash depth — xxhash64 over
    the stringified key at seed-derived salts (engine-fixed, so the
    sketch is deterministic and re-buildable)."""
    return F.array(
        *[
            (
                (
                    F.xxhash64(
                        F.col(key_col).cast("string"),
                        F.lit(seed * 1_000 + d),
                    )
                    % width
                )
                + width
            )
            % width
            for d in range(depth)
        ]
    )


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 8192,
    seed: int = 0,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the Count-Min table as rows (d, b, cnt) — only occupied
    cells materialize. posexplode fans each row to `depth` (cell)
    updates; the partial aggregation collapses every partition to
    <= depth x width rows before the single bounded exchange. NULL
    keys are excluded."""
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    ex = df.filter(F.col(key_col).isNotNull()).select(
        F.posexplode(_cm_bucket_array(key_col, depth, width, seed)).alias(
            "d", "b"
        ),
        w.alias("__w"),
    )
    return ex.groupBy("d", "b").agg(F.sum("__w").alias("cnt"))


def count_min_estimate(
    cm: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 8192,
    seed: int = 0,
) -> DataFrame:
    """Point-estimate the (weighted) count of each distinct key in
    `keys` against a built sketch: (key_col, approximate_count).
    est = min over depths of the key's cell — always >= true count.
    The sketch side is <= depth x width rows, so it broadcasts; the
    lookup never shuffles the keys frame beyond its own distinct."""
    hk = keys.select(key_col).filter(F.col(key_col).isNotNull()).distinct()
    hk = hk.select(
        key_col,
        F.posexplode(_cm_bucket_array(key_col, depth, width, seed)).alias(
            "d", "b"
        ),
    )
    return (
        hk.join(F.broadcast(cm), ["d", "b"], "left")
        .select(key_col, F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .groupBy(key_col)
        .agg(F.min("cnt").alias("approximate_count"))
    )
