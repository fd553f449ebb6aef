"""Dataset-splitting and mixing operators for training-data pipelines.

- hash_split: deterministic, engine-independent train/holdout
  assignment from a salted md5 of the id — stable across runs,
  executors, and engines (the DuckDB oracle reproduces it bit-exactly),
  so a document's split never changes as the corpus grows. Row-local:
  no shuffle, no state.
- stratified_sample: per-stratum Bernoulli fractions (data mixing) via
  Spark's native sampleBy — one scan, no shuffle.
- exact_n_per_group: exactly N rows per stratum via a per-group window
  over a seeded random order — one shuffle on the stratum key; the
  window is keyed, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def split_bucket(id_col, salt: str = "") -> "F.Column":
    """0-99 bucket from a salted md5 of the id (first 8 hex digits)."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 100


def hash_split(
    df: DataFrame, id_col: str, train_pct: int = 90, salt: str = ""
) -> DataFrame:
    """Adds a `split` column: 'train' for buckets < train_pct, else
    'holdout'."""
    return df.withColumn(
        "split",
        F.when(split_bucket(id_col, salt) < train_pct, F.lit("train")).otherwise(
            F.lit("holdout")
        ),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (training-mixture reweighting)."""
    return df.sampleBy(strata_col, fractions, seed)


def exact_n_per_group(
    df: DataFrame, strata_col: str, n: int, seed: int = 42
) -> DataFrame:
    """Exactly min(N, group size) random rows per stratum."""
    w = W.partitionBy(strata_col).orderBy(F.rand(seed))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
