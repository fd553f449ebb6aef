"""Kusto `evaluate ipv4_lookup(LookupTable, SourceIPv4Key,
IPv4NetworkKey [, return_unmatched])` rebuilt Spark-first: enrich rows
by LONGEST-PREFIX CIDR match against a network lookup table.

Scale shape (the classic IP-geo / threat-intel join at 100 TB):
- NEVER a theta-join (`ip BETWEEN net_lo AND net_hi` becomes a
  BroadcastNestedLoop over the whole fact table — the scale killer).
- Instead: collect the DISTINCT prefix lengths present in the lookup
  table (≤ 33 values — a bounded, lookup-side-only driver action),
  explode each fact row to one (prefix_len, ip >> (32-len)) key per
  length, and run ONE equi-join against the broadcast lookup keyed by
  (prefix_len, network_prefix). Amplification = number of distinct
  prefix lengths actually used (typically 3-6), independent of corpus
  size; the join is broadcast-hash on the small side.
- Longest-prefix-wins resolved by one keyed max_by aggregation, not a
  window over the fact table.

Reference anchor: the reference declares the KQL surface only
(reference README.md:34); ipv4_lookup semantics follow the public
Kusto plugin docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from meerkat_spark.functions.scalar import ipv4_to_long


def _cidr_parts(net):
    c = F.col(net) if isinstance(net, str) else net
    base = F.when(c.contains("/"), F.substring_index(c, "/", 1)).otherwise(c)
    bits = (
        F.when(c.contains("/"), F.substring_index(c, "/", -1).cast("int"))
        .otherwise(F.lit(32))
    )
    return ipv4_to_long(base), bits


def ipv4_lookup(
    df: DataFrame,
    lookup: DataFrame,
    ip_col: str,
    net_col: str,
    return_unmatched: bool = False,
) -> DataFrame:
    """Enrich `df` with the lookup row whose CIDR (`net_col`, e.g.
    '10.0.0.0/8') is the longest prefix containing `df[ip_col]`
    (dotted-quad string). All lookup columns except `net_col` are
    appended; `return_unmatched=True` keeps non-matching fact rows
    with nulls (Kusto's flag). Ties on prefix length keep the
    smallest network value (deterministic)."""
    payload = [c for c in lookup.columns if c != net_col]
    net_long, bits = _cidr_parts(net_col)
    shift = (F.lit(32) - bits).cast("double")
    luk = lookup.select(
        bits.alias("__len"),
        F.floor(net_long / F.pow(F.lit(2.0), shift)).cast("long").alias("__net"),
        ipv4_to_long(F.col(net_col)).alias("__netval"),
        *payload,
    ).filter(F.col("__len").between(0, 32) & F.col("__net").isNotNull())

    # bounded driver action: the ≤33 distinct prefix lengths in use
    lens = sorted(r["__len"] for r in luk.select("__len").distinct().collect())
    if not lens:
        raise ValueError("ipv4_lookup: lookup table has no valid CIDR rows")

    ip_long = ipv4_to_long(F.col(ip_col))
    # internal row id so duplicate fact rows each keep their own match
    # (never surfaced in the output — partition-order nondeterminism
    # cannot leak)
    fact = (
        df.withColumn("__rid", F.monotonically_increasing_id())
        .withColumn("__ip", ip_long)
        .withColumn("__probe", F.array(*[F.lit(n) for n in lens]))
    )
    exploded = fact.select(
        "*", F.explode("__probe").alias("__len")
    ).withColumn(
        "__net",
        F.floor(
            F.col("__ip") / F.pow(F.lit(2.0), (F.lit(32) - F.col("__len")).cast("double"))
        ).cast("long"),
    ).drop("__probe")

    joined = exploded.join(F.broadcast(luk), ["__len", "__net"], "inner")
    # longest prefix (then smallest network) wins — ONE keyed agg
    best = joined.groupBy("__rid", *df.columns).agg(
        F.max_by(
            F.struct(*payload),
            F.struct(F.col("__len"), (-F.col("__netval")).alias("__nv")),
        ).alias("__hit")
    )
    out = best.select(*df.columns, *[F.col(f"__hit.{c}").alias(c) for c in payload])
    if return_unmatched:
        misses = (
            fact.join(best.select("__rid"), "__rid", "left_anti")
            .select(*df.columns)
            .select(
                "*",
                *[
                    F.lit(None).cast(dict(luk.dtypes)[c]).alias(c)
                    for c in payload
                ],
            )
        )
        out = out.unionByName(misses)
    return out
