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

Determinism: Count-Min hashes with xxhash64 over the stringified key
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
    "merge_mg_summaries",
    "count_min_build",
    "count_min_estimate",
    "merge_count_min",
    "save_count_min",
    "load_count_min",
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
    keep_total_row: bool = False,
) -> DataFrame:
    """Merged Misra-Gries summary: (key_col, est_count, count_error_max).

    `est_count` is a LOWER bound on the true (weighted) count;
    `est_count + count_error_max` an upper bound. Every key whose true
    count exceeds count_error_max (<= N / (capacity+1)) is guaranteed
    present. NULL keys are excluded (Kusto top-hitters convention).
    When no partition ever held more than `capacity` distinct keys the
    sketch degrades to EXACT counts with count_error_max = 0 — the
    oracle-graded regime of suite query `heavy_hitters_sketch`.

    An EMPTY summary is legal (every counter evicted — e.g. a tiny
    capacity over all-unique keys); its meaning is exactly "no key's
    true count exceeds N/(capacity+1)". Such a summary has no rows to
    carry its error mass, which a later MERGE needs (hypothesis-found:
    merging an empty summary silently drops its corpus's error and
    overstates the merged upper bound) — pass keep_total_row=True to
    retain one NULL-key row (est_count 0, count_error_max = total
    decrement) as the error carrier. The merge and the streaming
    keeper use that representation internally; consumer-facing paths
    (heavy_hitters, read_heavy_hitters_summary) filter it out.
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
    out = merged.withColumn(
        "count_error_max",
        F.coalesce(F.sum("__decr").over(total_win), F.lit(0)).cast(num_t),
    ).drop("__decr")
    if not keep_total_row:
        out = out.filter(F.col(key_col).isNotNull())
    return out


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


def merge_mg_summaries(
    summaries: list[DataFrame],
    key_col: str,
    capacity: int,
    keep_total_row: bool = False,
) -> DataFrame:
    """Merge Misra-Gries summaries built independently (per day, per
    source, per backfill chunk) into one summary with the SAME bound
    structure — the mergeable-summaries result (Agarwal et al.,
    PODS'12): sum per-key estimates, then re-evict by subtracting the
    (capacity+1)-th largest merged estimate.

    Error accounting: each input's count_error_max is a constant
    column; the merged bound is sum(input errors) + the re-eviction
    theta, and est <= true <= est + count_error_max still holds for
    every emitted key. An input whose counters were ALL evicted can
    only report its error mass through a keep_total_row sentinel
    (NULL key, est 0) — build merge inputs with keep_total_row=True,
    or their hidden decrement silently weakens the merged upper bound
    (hypothesis-found edge, pinned in tests/test_sketches.py). NULL
    sentinel rows in inputs are consumed here; the output carries its
    own only when keep_total_row=True. Every frame is sketch-sized,
    so the rank window and error roll-up never touch corpus-scale
    data.
    """
    if not summaries:
        raise ValueError("merge_mg_summaries needs at least one summary")
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    from pyspark.sql import Window as W

    tagged = None
    for i, s in enumerate(summaries):
        t = s.select(
            key_col, "est_count", "count_error_max",
            F.lit(i).alias("__frame"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    # per-key merged estimates (sentinels excluded from ranking);
    # per-frame error scalars roll up via one tiny agg over the
    # (bounded) union — sentinel rows DO count here, which is the
    # whole point of keep_total_row inputs
    per_key = tagged.filter(F.col(key_col).isNotNull()).groupBy(
        key_col
    ).agg(F.sum("est_count").alias("est_count"))
    err_in = (
        tagged.groupBy("__frame")
        .agg(F.max("count_error_max").alias("__e"))
        .agg(F.coalesce(F.sum("__e"), F.lit(0)).alias("__err_in"))
    )
    rank_w = W.partitionBy(F.lit(1)).orderBy(
        F.col("est_count").desc(), F.col(key_col).asc()
    )
    ranked = per_key.withColumn("__rk", F.row_number().over(rank_w))
    theta = ranked.filter(F.col("__rk") == capacity + 1).select(
        F.col("est_count").alias("__theta")
    )
    # one 1-row scalar frame (total input error + re-eviction theta).
    # theta may be an EMPTY frame (fewer than capacity+1 merged keys):
    # a cross join with empty would drop every row, so it left-joins
    # on a constant key and coalesces to 0. All frames sketch-sized.
    scalars = (
        err_in.withColumn("__k", F.lit(1))
        .join(F.broadcast(theta.withColumn("__k", F.lit(1))), "__k", "left")
        .withColumn("__theta", F.coalesce("__theta", F.lit(0)))
    )
    out = (
        ranked.crossJoin(F.broadcast(scalars))
        .withColumn("est_count", F.col("est_count") - F.col("__theta"))
        .filter(F.col("est_count") > 0)
        .withColumn(
            "count_error_max", F.col("__err_in") + F.col("__theta")
        )
        .select(key_col, "est_count", "count_error_max")
    )
    if keep_total_row:
        key_t = summaries[0].schema[key_col].dataType
        est_t = summaries[0].schema["est_count"].dataType
        sentinel = scalars.select(
            F.lit(None).cast(key_t).alias(key_col),
            F.lit(0).cast(est_t).alias("est_count"),
            (F.col("__err_in") + F.col("__theta"))
            .cast(est_t)
            .alias("count_error_max"),
        )
        out = out.unionByName(sentinel)
    return out


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
    by: list[str] | None = None,
) -> DataFrame:
    """Build the Count-Min table as rows (d, b, cnt) — only occupied
    cells materialize. posexplode fans each row to `depth` (cell)
    updates; the partial aggregation collapses every partition to
    <= depth x width rows before the single bounded exchange. NULL
    keys are excluded.

    `by` (r16) prepends group columns: ONE pass builds one sketch per
    group — each (by…, d, b, cnt) slice is exactly the sketch
    count_min_build would return for that group's rows alone (the cell
    sum is order-free), so per-day/per-slice rollups no longer need one
    filtered scan per slice before merge_count_min."""
    by = list(by or [])
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    ex = df.filter(F.col(key_col).isNotNull()).select(
        *by,
        F.posexplode(_cm_bucket_array(key_col, depth, width, seed)).alias(
            "d", "b"
        ),
        w.alias("__w"),
    )
    return ex.groupBy(*by, "d", "b").agg(F.sum("__w").alias("cnt"))


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


def merge_count_min(cms: list[DataFrame]) -> DataFrame:
    """Merge Count-Min tables built with the SAME (depth, width, seed)
    over disjoint corpora: the sketch is linear, so cell-wise summation
    yields exactly the sketch of the union. Every input is
    <= depth x width rows; the merge is a tiny aggregation. Parameter
    agreement is the caller's contract — load_count_min enforces it
    for persisted sketches."""
    if not cms:
        raise ValueError("merge_count_min needs at least one sketch")
    out = None
    for cm in cms:
        t = cm.select("d", "b", "cnt")
        out = t if out is None else out.unionByName(t)
    return out.groupBy("d", "b").agg(F.sum("cnt").alias("cnt"))


def save_count_min(
    cm: DataFrame, path: str, depth: int, width: int, seed: int
) -> None:
    """Persist a Count-Min table (parquet + params sidecar) so daily
    sketches can roll up across runs — the t-digest persistence
    precedent (functions/tdigest.py). The sidecar pins (depth, width,
    seed): estimates and merges are only meaningful at identical
    parameters, so load re-asserts them."""
    import json
    import os

    cm.select("d", "b", "cnt").write.mode("overwrite").parquet(
        os.path.join(path, "cells")
    )
    with open(os.path.join(path, "_cm_meta.json"), "w") as f:
        json.dump({"depth": depth, "width": width, "seed": seed}, f)


def load_count_min(spark, path: str) -> tuple[DataFrame, dict]:
    """Load a persisted Count-Min table; returns (cells, params)."""
    import json
    import os

    with open(os.path.join(path, "_cm_meta.json")) as f:
        meta = json.load(f)
    return spark.read.parquet(os.path.join(path, "cells")), meta
