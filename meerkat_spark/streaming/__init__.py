"""Structured Streaming ingestion (SURVEY.md §2.2.6): the reference's
buffered threshold-flush ingestion (reference README.md:20-22) realized
as micro-batch streaming with watermark-bounded dedup."""

from meerkat_spark.streaming.ingest import start_stream_ingest, streaming_window_counts

__all__ = ["start_stream_ingest", "streaming_window_counts"]
