"""Skew-resistant join via key salting.

AQE's skew-join splitting handles most skew at runtime
(spark.sql.adaptive.skewJoin, on in session.py); explicit salting is
the deterministic fallback when one join key dominates (e.g. a null-ish
default key holding 30% of a 100TB fact table):

  fact side:  salt = pmod(xxhash64(row-entropy), S)
  dim side:   replicated S times (explode 0..S-1)
  join on (key, salt) → the hot key spreads over S reducers.

Replication multiplies only the SMALL side (S × |dim|)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
    entropy_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join `fact.on == dim.on` with the fact side salted across
    `salt_buckets` partitions per key. Semantically identical to the
    plain join (each fact row joins the one replicated dim copy with
    its salt)."""
    ent = entropy_cols or [c for c in fact.columns if c != on][:2] or [on]
    f = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in ent]), F.lit(salt_buckets)).cast("int")
    )
    d = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = f.join(d, [on, "__salt"], how)
    return out.drop("__salt")
