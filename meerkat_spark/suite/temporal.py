"""Temporal operators suite: as-of join and range join, oracle-checked
against DuckDB (which has native ASOF JOIN — an exact semantic oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.engine import MeerkatEngine
from meerkat_spark.operators import asof_join, range_join
from meerkat_spark.suite import register


@register(
    "asof_join_events",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id, p.event_id, c.value AS value_asof, c.ts AS ts_asof
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def asof_join_events(spark, sf_dir):
    """For every purchase, the user's most recent prior click value —
    checked against DuckDB's native ASOF JOIN. Spark realization:
    union+window (operators/asof.py), one shuffle on the key."""
    e = MeerkatEngine(spark, sf_dir)
    ev = e.table("events").to_df()
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join(purchases, clicks, ts_col="ts", by="user_id", value_cols=["value"])
    return out.select("user_id", "event_id", "value_asof", "ts_asof")


@register(
    "salted_join_skew",
    oracle="""
    SELECT n_name, COUNT(*) AS n_cust, ROUND(SUM(c_acctbal), 2) AS bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def salted_join_skew(spark, sf_dir):
    """Salted skew-resistant join (operators/skew.py) — semantically
    identical to the plain equi-join (the oracle), with the fact side
    spread over 8 salt buckets per key."""
    from meerkat_spark.operators import salted_join

    e = MeerkatEngine(spark, sf_dir)
    cust = e.table("customer").to_df().withColumnRenamed("c_nationkey", "nk")
    nat = e.table("nation").to_df().withColumnRenamed("n_nationkey", "nk")
    joined = salted_join(cust, nat, on="nk", salt_buckets=8)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("bal"),
    )


@register(
    "range_join_price_bands",
    oracle="""
    WITH bands AS (
      SELECT x * 50000.0 AS lo, (x + 1) * 50000.0 - 0.01 AS hi,
             'band_' || CAST(x AS VARCHAR) AS band
      FROM generate_series(0, 11) t(x)
    )
    SELECT o_orderkey, band
    FROM orders JOIN bands ON o_totalprice BETWEEN lo AND hi
    """,
)
def range_join_price_bands(spark, sf_dir):
    """Points (order prices) joined to enclosing bands via the bucketed
    range join — equi-join on bucket instead of BroadcastNestedLoop."""
    e = MeerkatEngine(spark, sf_dir)
    orders = e.table("orders").to_df().select("o_orderkey", "o_totalprice")
    bands = spark.range(0, 12).select(
        (F.col("id") * 50000.0).alias("lo"),
        ((F.col("id") + 1) * 50000.0 - 0.01).alias("hi"),
        F.concat(F.lit("band_"), F.col("id").cast("string")).alias("band"),
    )
    joined = range_join(
        orders, bands, point_col="o_totalprice", lo_col="lo", hi_col="hi",
        bucket_width=50000.0,
    )
    return joined.select("o_orderkey", "band")
