"""Single-partition local relations from driver-resident rows.

``SparkSession.createDataFrame(list)`` slices the list across
defaultParallelism Python-RDD partitions, so every consumer action pays
one near-empty Python-worker task per core. The first r16 fix —
appending ``.coalesce(1)`` — was far worse: a CoalescedRDD computes its
~32 Python parent partitions SEQUENTIALLY inside one task, and each
parent is a separate Python-worker round trip (~0.15 s), so every
action on the frame cost ~4.7 s on local[32] (measured; a 7-10x
regression on classifier_quality_gate). Parallelizing the rows into ONE
slice up front keeps the exact list-path type conversion (no
pandas/Arrow coercion differences) and pays a single Python round trip
per action: ~0.17 s vs ~4.7 s coalesced vs ~0.4 s full-width on the
bench host, with the 1-partition structure every downstream broadcast
build wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``createDataFrame`` over driver-resident ``rows`` as ONE
    partition (``rows`` may be empty; ``schema`` is required — DDL
    string or StructType)."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows if rows else [], 1), schema
    )
