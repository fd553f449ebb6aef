"""Bucketed-table co-located joins: the scale strategy for repeated
big-big joins (SURVEY.md §2.3 sharding ≈ consistent-hash bucketing,
reference README.md:8). Writing both sides bucketed on the join key
lets Spark join with ZERO exchanges — asserted on the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return spark


def test_bucketed_join_no_shuffle(spark):
    src_o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    src_l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    (
        src_o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
    )
    (
        src_l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")
    )
    o = spark.table("orders_b")
    l = spark.table("lineitem_b")
    joined = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").agg(
        F.sum("l_quantity").alias("q")
    )
    # disable broadcast so the join strategy itself is under test
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed SMJ: no shuffle exchange feeding the join
        assert "SortMergeJoin" in plan
        join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and the result is right
        total = joined.agg(F.sum("q")).first()[0]
        expected = src_l.agg(F.sum("l_quantity")).first()[0]
        assert total == expected  # every lineitem has its order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
