"""Batch ingestion: schemaless rows → typed, time-partitioned Parquet.

Reference semantics being rebuilt (citations):
- "primarily schemaless, data types will be inferred at ingestion
  time", opt-in enforcement (reference README.md:13,20).
- Mandatory `_ts` timestamp and `_dedup` i32 on every event
  (reference README.md:15); dedup applied at merge time, not ingest
  (README.md:22) — see compact.py.
- Rows buffered until a size/time threshold then indexed+flushed
  (README.md:20-22) — the buffer/flush machinery IS Spark's write
  path; here we only enforce the API contract.
- Segments partitioned by time "similar to apache druid"
  (README.md:27) → write.partitionBy on a derived `_ts_day` column,
  giving Catalyst partition pruning on time predicates (SURVEY.md §4).

Scale: ingestion is append-only; each batch writes only its own
partition directories. `repartition(shards, _dedup)` mirrors the
reference's consistent-hash sharding (README.md:8) and bounds file
counts per partition.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meerkat_spark.types import kql_to_spark

TS_COL = "_ts"
DEDUP_COL = "_dedup"
DAY_COL = "_ts_day"


@dataclass
class IngestConfig:
    path: str
    # opt-in schema enforcement: {column: kql_type_name}; empty → infer
    schema: dict[str, str] = field(default_factory=dict)
    strict: bool = False  # True: misfit values error; False: null (KQL cast style)
    shards: int = 4


def _ensure_system_columns(df: DataFrame) -> DataFrame:
    """Enforce mandatory `_ts` (timestamp, default now) and `_dedup`
    (int32, default hash of all columns — stable content hash so exact
    replays dedup away at merge time)."""
    if TS_COL not in df.columns:
        df = df.withColumn(TS_COL, F.current_timestamp())
    else:
        df = df.withColumn(TS_COL, F.col(TS_COL).cast("timestamp"))
    if DEDUP_COL not in df.columns:
        content = [c for c in df.columns if c not in (TS_COL, DEDUP_COL)]
        # reduce the 64-bit content hash into int32 range with pmod —
        # a plain cast overflows under ANSI mode
        df = df.withColumn(
            DEDUP_COL,
            F.pmod(F.xxhash64(*[F.col(c) for c in content]), F.lit(2**31)).cast("int"),
        )
    else:
        df = df.withColumn(DEDUP_COL, F.col(DEDUP_COL).cast("int"))
    return df


def _apply_declared_schema(df: DataFrame, schema: dict[str, str], strict: bool) -> DataFrame:
    """Opt-in enforcement: cast declared columns to their KQL types.
    strict=False nulls out misfits (KQL failed-cast semantics);
    strict=True uses plain cast (errors surface per ANSI rules)."""
    for col_name, kql_type in schema.items():
        if col_name not in df.columns:
            df = df.withColumn(col_name, F.lit(None).cast(kql_to_spark(kql_type)))
            continue
        spark_type = kql_to_spark(kql_type)
        col = F.col(col_name)
        df = df.withColumn(
            col_name,
            col.cast(spark_type) if strict else col.try_cast(spark_type),
        )
    return df


def ingest_dataframe(df: DataFrame, cfg: IngestConfig) -> None:
    """Append a batch to the table: enforce system columns + declared
    schema, derive the day partition, hash-repartition (sharding), and
    append Parquet partitioned by `_ts_day`."""
    df = _ensure_system_columns(df)
    if cfg.schema:
        df = _apply_declared_schema(df, cfg.schema, cfg.strict)
    df = df.withColumn(DAY_COL, F.date_format(F.col(TS_COL), "yyyy-MM-dd"))
    (
        df.repartition(cfg.shards, F.col(DEDUP_COL))
        .write.mode("append")
        .partitionBy(DAY_COL)
        .parquet(cfg.path)
    )


def ingest_rows(
    spark: SparkSession, rows: list[dict], cfg: IngestConfig
) -> None:
    """Schemaless ingest: infer types from the rows (the reference's
    inference-at-ingestion, README.md:13), then append."""
    df = spark.createDataFrame(rows)  # Spark infers types
    ingest_dataframe(df, cfg)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read an ingested table (merge-schema on: schema evolution across
    segments is the norm, reference README.md:14)."""
    return spark.read.option("mergeSchema", "true").parquet(path)
