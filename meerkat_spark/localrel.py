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

import operator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``createDataFrame`` over driver-resident ``rows`` as ONE
    partition (``rows`` may be empty; ``schema`` is required — DDL
    string or StructType)."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows if rows else [], 1), schema
    )


def sql_in(col_name: str, values) -> Column:
    """``col IN (v1, v2, …)`` over a driver-resident value list in ONE
    py4j round trip. ``Column.isin`` builds one JVM literal PER ELEMENT
    (~0.8 ms of socket round trip each — 2.0 s of the 4.0 s
    ivf_quantized search construction at the 10k-id rerank cap,
    measured via cProfile: 2162 ``_create_column_from_literal`` calls);
    rendering the identical ``In`` predicate as a SQL string lets the
    JVM parse every literal in one call. The Catalyst plan — and
    therefore the Parquet row-group pushdown the rerank paths rely on —
    is exactly what ``isin`` produces. Integer and string values only;
    an empty list is ``lit(False)`` like an empty ``In``."""
    vals = list(values)
    if not vals:
        return F.lit(False)
    parts = []
    for v in vals:
        if isinstance(v, bool):
            raise TypeError("sql_in supports int and str values only")
        if isinstance(v, str):
            escaped = v.replace("\\", "\\\\").replace("'", "\\'")
            parts.append(f"'{escaped}'")
        else:
            parts.append(str(operator.index(v)))
    return F.expr(f"`{col_name}` IN ({','.join(parts)})")
