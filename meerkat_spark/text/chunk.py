"""Document chunking for training-data pipelines: split each document
into overlapping token windows (the standard pre-tokenization step
before packing sequences for LLM training).

Scale shape: tokens → start-offset sequence → slice → posexplode, all
row-local (a generator projection, no shuffle). Output cardinality is
ceil(n_tokens / stride) per doc — linear, and each output row carries
only its own chunk text, never the full document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meerkat_spark.text.analysis import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """(id_col, chunk_id, chunk_text, n_chunk_tokens) — one row per
    token window. Windows start every `chunk_tokens - overlap` tokens
    (1, 1+stride, …) while the start is within the document; the final
    window is short rather than padded. Empty docs produce no rows."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(1), n, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        starts, lambda s: F.slice(toks, s, chunk_tokens)
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "__toks"),
    )
    return out.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(" ", "__toks").alias("chunk_text"),
        F.size("__toks").cast("long").alias("n_chunk_tokens"),
    )
