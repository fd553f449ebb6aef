"""t-digest sketch: accuracy vs exact quantiles, mergeability (digest of
union ≈ merge of digests), bounded size."""

from __future__ import annotations

import numpy as np
import pytest

from meerkat_spark.functions import tdigest as td


@pytest.fixture(scope="module")
def values():
    rng = np.random.default_rng(11)
    return np.concatenate(
        [rng.normal(100, 15, 20_000), rng.exponential(50, 10_000)]
    )


def test_kernel_accuracy(values):
    """t-digest quality is a RANK-error guarantee: the estimated
    q-quantile must sit at data rank q ± ε (value error at heavy tails
    is unbounded for any fixed-size sketch)."""
    m, w = td.compress(values, np.ones(len(values)), compression=100.0)
    assert len(m) <= 200  # O(compression) centroids
    for q in [0.01, 0.25, 0.5, 0.75, 0.95, 0.99, 0.999]:
        est = td.quantile(m, w, q)
        rank = float((values <= est).mean())
        assert abs(rank - q) < 0.005, (q, est, rank)


def test_kernel_mergeable(values):
    """Digest(merge of halves) ≈ digest(whole) — the property that lets
    stored per-day sketches roll up."""
    half = len(values) // 2
    m1, w1 = td.compress(values[:half], np.ones(half), 100.0)
    m2, w2 = td.compress(values[half:], np.ones(len(values) - half), 100.0)
    mm, mw = td.compress(
        np.concatenate([m1, m2]), np.concatenate([w1, w2]), 100.0
    )
    assert abs(mw.sum() - len(values)) < 1e-6  # no mass lost
    for q in [0.05, 0.5, 0.95]:
        est = td.quantile(mm, mw, q)
        rank = float((values <= est).mean())
        assert abs(rank - q) < 0.01, (q, est, rank)


def test_spark_sketch_matches_exact(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    sk = td.tdigest_sketch(df, "l_extendedprice", by=["l_returnflag"])
    out = td.digest_percentiles(sk, [0.5, 0.95]).collect()
    exact = {
        r.l_returnflag: (r.p5, r.p95)
        for r in df.groupBy("l_returnflag")
        .agg(
            *[
                __import__("pyspark.sql.functions", fromlist=["F"]).percentile(
                    "l_extendedprice", p
                ).alias(n)
                for p, n in [(0.5, "p5"), (0.95, "p95")]
            ]
        )
        .collect()
    }
    assert len(out) == 3
    for r in out:
        e50, e95 = exact[r.l_returnflag]
        assert abs(r.p5 - e50) / e50 < 0.02
        assert abs(r.p95 - e95) / e95 < 0.02


def test_digest_percentrank_inverts_percentiles(spark):
    import numpy as np

    from meerkat_spark.functions import tdigest as TD

    # rank is quantile's inverse on the raw kernel
    rng = np.random.RandomState(7)
    v = np.sort(rng.normal(50, 10, 20000))
    m, w = TD.compress(v, np.ones(len(v)), 100.0)
    for q in (0.1, 0.5, 0.9):
        x = TD.quantile(m, w, q)
        assert abs(TD.rank(m, w, x) - q) < 0.01
    assert TD.rank(m, w, -1e9) == 0.0 and TD.rank(m, w, 1e9) == 1.0

    # spark path: rank of the true median ~ 50
    df = spark.createDataFrame(
        [(i % 4, float(i)) for i in range(4000)], "g int, v double"
    )
    digests = TD.tdigest_sketch(df, "v", ["g"])
    ranked = TD.digest_percentrank(digests, 2000.0)
    for r in ranked.collect():
        assert 47.0 <= r.percentrank <= 53.0


def test_tdigest_kql_expression_forms(spark):
    """Round-7 KQL surface: summarize tdigest() → stored digest
    dynamic; percentile_tdigest reads quantiles within the sketch
    tolerance; merge_tdigest over per-shard digests ~= the whole-group
    digest (merge is the build)."""
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)
    r = eng.kql(
        "events | summarize td = tdigest(value) by event_type"
        " | extend p50 = percentile_tdigest(td, 50),"
        "   p95 = percentile_tdigest(td, 95)"
        " | join kind=inner (events | summarize e50 ="
        "   percentile(value, 50), e95 = percentile(value, 95)"
        "   by event_type) on event_type"
        " | project event_type, p50, p95, e50, e95"
    ).to_df().collect()
    assert len(r) > 0
    for row in r:
        assert abs(row.p50 - row.e50) <= 0.05 * (abs(row.e50) + 1), row
        assert abs(row.p95 - row.e95) <= 0.05 * (abs(row.e95) + 1), row

    m = eng.kql(
        "events | extend shard = user_id % 4"
        " | summarize td = tdigest(value) by event_type, shard"
        " | summarize td = merge_tdigest(td) by event_type"
        " | extend p50 = percentile_tdigest(td, 50)"
        " | join kind=inner (events | summarize e50 ="
        "   percentile(value, 50) by event_type) on event_type"
        " | project event_type, p50, e50"
    ).to_df().collect()
    for row in m:
        assert abs(row.p50 - row.e50) <= 0.07 * (abs(row.e50) + 1), row
