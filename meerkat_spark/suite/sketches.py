"""Frequency-sketch queries (operators/sketches.py): Misra-Gries heavy
hitters and Count-Min point estimates.

Oracle strategy — each query is graded in a regime where the sketch's
answer is PROVABLY exact, so the DuckDB twin is plain exact SQL while
the Spark side still executes the full sketch path (mapInPandas
summaries / posexplode cells + bounded merge):

- heavy_hitters_sketch: capacity (4096) exceeds the column's distinct
  count (1500 custkeys at sf<=1), so no partition ever evicts —
  decremented mass is 0 and estimates equal exact counts. The
  approximate regime (capacity << distinct) is pinned by bound tests
  in tests/test_sketches.py, which ALSO pin that this query's planted
  guarantee holds when capacity shrinks.
- count_min_freq_est: 5 distinct event types vs width 65536 x depth 4
  at fixed xxhash64 seeds — the bucket assignment is deterministic
  (same hash, same data => same cells every run/engine visit), and at
  this width the 5 keys land in distinct cells per depth, so min-over-
  depth equals the exact count. The overestimate property under
  adversarial width is pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.engine import MeerkatEngine
from meerkat_spark.suite import register


def _df(spark, sf_dir, table):
    return MeerkatEngine(spark, sf_dir).table(table).to_df()


@register(
    "heavy_hitters_sketch",
    oracle="""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS approximate_count,
           CAST(0 AS BIGINT) AS count_error_max
    FROM orders GROUP BY o_custkey
    ORDER BY approximate_count DESC, o_custkey ASC LIMIT 20
    """,
)
def heavy_hitters_sketch(spark, sf_dir):
    """Top-20 customers by order count through the Misra-Gries path:
    per-partition bounded summaries -> O(capacity x partitions) merge,
    never a |distinct keys| shuffle. Exact here (capacity > distinct),
    same code path as the approximate regime."""
    from meerkat_spark.operators.sketches import heavy_hitters

    return heavy_hitters(
        _df(spark, sf_dir, "orders"), "o_custkey", k=20, capacity=4096
    )


@register(
    "count_min_freq_est",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS approximate_count
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def count_min_freq_est(spark, sf_dir):
    """Count-Min frequency estimates for every event type through the
    ROLLUP path: three disjoint slices (the per-day production shape)
    each build their own (d, b, cnt) sketch in one partially-aggregated
    pass; merge_count_min sums cells — the sketch is linear, so the
    merged table is bit-identical to a single build over the union —
    then a broadcast min-over-depth lookup. Exact at this
    width/cardinality; always an over-estimate otherwise."""
    from meerkat_spark.operators.sketches import (
        count_min_build,
        count_min_estimate,
        merge_count_min,
    )

    e = _df(spark, sf_dir, "events")
    slices = [e.filter(F.pmod(F.col("event_id"), F.lit(3)) == i) for i in range(3)]
    cms = [
        count_min_build(s, "event_type", depth=4, width=65536, seed=0)
        for s in slices
    ]
    cm = merge_count_min(cms)
    return count_min_estimate(
        cm, e, "event_type", depth=4, width=65536, seed=0
    ).orderBy("event_type")


@register(
    "kql_evaluate_heavy_hitters",
    oracle="""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS approximate_count,
           CAST(0 AS BIGINT) AS count_error_max
    FROM orders GROUP BY o_custkey
    ORDER BY approximate_count DESC, o_custkey ASC LIMIT 15
    """,
)
def kql_evaluate_heavy_hitters(spark, sf_dir):
    """The sketch through the KQL front-end (reference README.md:33-34
    declares KQL as THE query surface): `evaluate heavy_hitters(...)`."""
    return (
        MeerkatEngine(spark, sf_dir)
        .kql("orders | evaluate heavy_hitters(o_custkey, 15, 4096)")
        .to_df()
    )
