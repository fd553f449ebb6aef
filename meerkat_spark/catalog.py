"""Table registry over a directory of Parquet tables.

The reference scopes segments to (database, table, shard)
(src/store/segment_metadata.proto:73-82; segment files created per table
in src/store/segment_writer.rs:144-184). Here a "database" is a
directory, a "table" is a parquet file/dir inside it, and sharding /
placement is delegated to Spark partitioning + the filesystem —
deliberate architectural delta documented in SURVEY.md §2.3.
"""

from __future__ import annotations

import glob
import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@lru_cache(maxsize=256)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Column names stored as timestamp[ns] in the parquet footer(s)."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    target = path
    if os.path.isdir(path):
        inner = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not inner:
            return ()
        target = inner[0]
    schema = pq.read_schema(target)
    return tuple(
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    )

class UnknownTableError(KeyError):
    """Referenced table has no parquet file/dir in the database
    directory — the one error class `union isfuzzy=true` forgives."""

    def __str__(self) -> str:  # KeyError quotes repr by default
        return f"unknown table {self.args[0]!r}"


# The driver-provided fixture tables (TESTDATA.md).
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Catalog:
    """Lazy loader for the tables of one scale-factor directory.

    DataFrames are plain `spark.read.parquet` scans — Catalyst handles
    column pruning / predicate pushdown / partition pruning, which is the
    rebuild of the reference's per-column block layout + planned
    BRIN/min-max stats (reference src/store/segment_writer.rs:59-66,
    src/store/segment_metadata.proto:38-48; SURVEY.md §4).
    """

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}
        # The engine must work with ANY caller-provided session (the
        # driver builds its own): nanos-timestamp parquet is illegal for
        # Spark's reader unless read as long — a runtime-settable SQL
        # conf, applied here rather than only in our session factory.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # pre-Spark-3.2 or restricted conf: nanos tables will error at read

    def path(self, name: str) -> str:
        return os.path.join(self.sf_dir, f"{name}.parquet")

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            p = self.path(name)
            if not os.path.exists(p):
                raise UnknownTableError(name)
            self._cache[name] = self._load(p)
        return self._cache[name]

    def register(self, name: str, df: DataFrame) -> None:
        """Register an in-memory DataFrame under a table name (ad-hoc
        sources: tests, ingest buffers, query-time scratch tables)."""
        self._cache[name] = df

    def _load(self, path: str) -> DataFrame:
        """Read parquet; nanosecond-timestamp columns (illegal for Spark's
        reader) arrive as long via spark.sql.legacy.parquet.nanosAsLong
        and are converted here to µs TimestampType (integer `div` — a
        double division would lose precision on ns epochs > 2^53).

        TIMESTAMP_NTZ columns (µs parquet timestamps without UTC
        adjustment — what the fixture generator emits since round 4) are
        normalized to TimestampType too: the engine's DATETIME contract
        is TimestampType (SURVEY.md §1.2), and functions like
        unix_micros reject NTZ inputs. Under the UTC session timezone
        the wall-clock values are unchanged, preserving oracle parity."""
        from pyspark.sql import types as T

        df = self.spark.read.parquet(path)
        ns_cols = _nanos_timestamp_cols(path)
        for c in ns_cols:
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
        for f in df.schema.fields:
            if isinstance(f.dataType, T.TimestampNTZType):
                df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
        return df

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every available table as a temp view for spark.sql."""
        for name in TABLES:
            if os.path.exists(self.path(name)):
                self.table(name).createOrReplaceTempView(name)
