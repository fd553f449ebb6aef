"""Conflict-tolerant schema union across segments.

The reference tolerates backward-INCOMPATIBLE schema evolution: "columns
having two different data types over time"; the effective table schema
is "constructed querying the schema of all table segments"
(reference README.md:14). Parquet mergeSchema errors on type conflicts,
so this is one of the few places Spark built-ins are insufficient
(SURVEY.md §1.4, §7.4.2).

Approach: read each schema-compatible group of files separately with its
own schema, cast conflicting columns to the least common supertype
(numeric widening int→long→double; anything else → string, mirroring
KQL's loose `dynamic` behavior), then unionByName. The per-file footer
scan is metadata-only (no data read) and trivially cacheable; the
resulting plan is a UNION of ordinary pruned Parquet scans, so pushdown
and pruning still apply per branch.
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# widening lattice for conflict resolution
_NUMERIC_ORDER = ["int32", "int64", "float", "double"]


def _arrow_kind(t) -> str:
    import pyarrow.types as pat

    if pat.is_int32(t) or pat.is_int16(t) or pat.is_int8(t):
        return "int32"
    if pat.is_int64(t):
        return "int64"
    if pat.is_float32(t):
        return "float"
    if pat.is_float64(t):
        return "double"
    if pat.is_timestamp(t):
        return "timestamp"
    if pat.is_boolean(t):
        return "boolean"
    if pat.is_string(t) or pat.is_large_string(t):
        return "string"
    return "other"


_KIND_TO_SPARK = {
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "timestamp": "timestamp",
    "boolean": "boolean",
    "string": "string",
}


def _supertype(kinds: set[str]) -> str:
    """Least common supertype in Spark SQL DDL terms."""
    if len(kinds) == 1:
        return _KIND_TO_SPARK.get(next(iter(kinds)), "string")
    if kinds <= set(_NUMERIC_ORDER):
        widest = max(kinds, key=_NUMERIC_ORDER.index)
        return _KIND_TO_SPARK[widest]
    return "string"  # mixed incompatible kinds → KQL-style stringly dynamic


def read_table_with_schema_union(spark: SparkSession, path: str) -> DataFrame:
    """Read all parquet files under `path` (recursively) into ONE
    DataFrame with the union schema, casting type-conflicting columns to
    their common supertype."""
    import pyarrow.parquet as pq

    files = sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")

    # group files by their exact schema signature (footer-only reads)
    groups: dict[tuple, list[str]] = defaultdict(list)
    col_kinds: dict[str, set[str]] = defaultdict(set)
    for f in files:
        schema = pq.read_schema(f)
        sig = tuple((name, str(schema.field(name).type)) for name in schema.names)
        groups[sig].append(f)
        for name in schema.names:
            col_kinds[name].add(_arrow_kind(schema.field(name).type))

    target = {name: _supertype(kinds) for name, kinds in col_kinds.items()}

    branches: list[DataFrame] = []
    for sig, fs in groups.items():
        df = spark.read.parquet(*fs)
        casts = [
            F.col(name).cast(target[name]).alias(name)
            for name, _ in sig
        ]
        branches.append(df.select(*casts))

    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b, allowMissingColumns=True)
    return out
