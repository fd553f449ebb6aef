"""Streaming training-data pipeline (reference streaming semantics:
buffered ingest + merge-dedup, /root/reference/README.md:15-27,
realized as Structured Streaming): the batch text-cleaning chain
(PII redaction → quality/repetition filter → exact dedup) applied to a
live document stream.

Every transformation here is the SAME Column expression used by the
batch path (text/pii.py, text/analysis.py) — row-local codegen, so the
stream stays in append mode with no extra state. The only stateful
stage is the watermark-bounded fingerprint dedup
(`dropDuplicatesWithinWatermark` on the 64-bit content fingerprint):
state size is bounded by the watermark horizon, never by stream
length — the same bound the ingest path relies on
(streaming/ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meerkat_spark.text import pii
from meerkat_spark.text.analysis import (
    fingerprint64,
    quality_score,
    repetition_features,
)


def clean_document_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    min_quality: float = 0.25,
    max_top_word_frac: float = 0.5,
) -> DataFrame:
    """Streaming DataFrame → cleaned streaming DataFrame: PII scrubbed,
    low-quality and repetition-degenerate docs dropped, exact dups
    (post-redaction fingerprint) removed within the watermark horizon.
    Append-mode safe; attach any sink."""
    rep = repetition_features(F.col(text_col))
    cleaned = (
        stream_df.withColumn(text_col, pii.redact_pii(F.col(text_col)))
        .withColumn("quality", quality_score(F.col(text_col)))
        .withColumn("top_word_frac", rep["top_word_frac"])
        .filter(
            (F.col("quality") >= min_quality)
            & (F.col("top_word_frac") <= max_top_word_frac)
        )
        .withColumn("fp64", fingerprint64(F.col(text_col)))
    )
    return cleaned.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fp64"]
    )
