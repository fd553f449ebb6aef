"""Ingestion & maintenance (SURVEY.md §2.3): the Spark realization of
the reference's storage layer — typed columnar buffers + segment writer
(reference src/store/indexing_buffer.rs, src/store/segment_writer.rs)
become `df.write.partitionBy(...).parquet(...)`; this package implements
what Parquet does NOT give for free: the ingest API (type inference,
`_ts`/`_dedup` enforcement), time partitioning, merge-time dedup
compaction, and conflict-tolerant schema union."""

from meerkat_spark.ingest.batch import IngestConfig, ingest_rows, ingest_dataframe
from meerkat_spark.ingest.compact import compact_table
from meerkat_spark.ingest.schema_union import read_table_with_schema_union

__all__ = [
    "IngestConfig",
    "ingest_rows",
    "ingest_dataframe",
    "compact_table",
    "read_table_with_schema_union",
]
