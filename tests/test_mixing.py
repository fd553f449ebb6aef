"""Weighted dataset mixing: output proportions track the weights, the
binding source keeps everything, and membership is deterministic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meerkat_spark.operators.sampling import mix_datasets


def test_mix_proportions_and_determinism(spark):
    a = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    b = spark.range(10_000, 14_000).select(F.col("id").alias("doc_id"))
    c = spark.range(20_000, 20_400).select(F.col("id").alias("doc_id"))
    mixed = mix_datasets(
        {"web": (a, 2.0), "code": (b, 1.0), "books": (c, 1.0)}
    )
    counts = {r.mix_source: r.n for r in
              mixed.groupBy("mix_source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # books is binding (400 rows / weight 1): kept fully; targets 800/400/400
    assert counts["books"] == 400
    assert counts["web"] == pytest.approx(800, rel=0.15)
    assert counts["code"] == pytest.approx(400, rel=0.15)
    # deterministic: same call → identical membership
    again = mix_datasets({"web": (a, 2.0), "code": (b, 1.0), "books": (c, 1.0)})
    assert sorted(r.doc_id for r in mixed.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_mix_validation(spark):
    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        mix_datasets({})
    with pytest.raises(ValueError):
        mix_datasets({"a": (df, 0.0)})


def test_temperature_mix_flattens_and_binds(spark):
    from pyspark.sql import functions as F

    from meerkat_spark.operators.sampling import temperature_mix

    docs = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, src string",
    )
    srcs = {
        s: docs.filter(F.col("src") == s).select("doc_id")
        for s in ("big", "small")
    }
    out = temperature_mix(srcs, alpha=0.0)  # uniform target
    got = {r.mix_source: r["count"] for r in out.groupBy("mix_source").count().collect()}
    # alpha=0: equal target shares; 'small' binds at 100 kept docs,
    # 'big' down-samples to ~100 (hash granularity gives +-~10%)
    assert got["small"] == 100
    assert 70 <= got["big"] <= 130
    # alpha=1: natural proportions -> both kept fully
    out1 = temperature_mix(srcs, alpha=1.0)
    got1 = {r.mix_source: r["count"] for r in out1.groupBy("mix_source").count().collect()}
    assert got1 == {"big": 900, "small": 100}
    # deterministic: same call, same kept set
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in temperature_mix(srcs, alpha=0.0).collect()}
    assert a == b
