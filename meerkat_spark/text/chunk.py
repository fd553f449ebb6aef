"""Document chunking for training-data pipelines: split each document
into overlapping token windows (the standard pre-tokenization step
before packing sequences for LLM training). Beyond the reference's
declared surface (/root/reference/README.md:33-34 commits to KQL
analytics only) — part of the T3 training-data pipeline layer.

Scale shape: tokens → start-offset sequence → slice → posexplode, all
row-local (a generator projection, no shuffle). Output cardinality is
ceil(n_tokens / stride) per doc — linear, and each output row carries
only its own chunk text, never the full document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def pack_chunks(
    chunks: DataFrame,
    token_col: str = "n_chunk_tokens",
    id_col: str = "doc_id",
    order_col: str = "chunk_id",
    budget: int = 4096,
    n_shards: int = 64,
) -> DataFrame:
    """Streaming sequence packing: assign each chunk to a fixed
    token-budget pack. Chunks are sharded (`id % n_shards`), ordered
    within the shard, and a chunk joins the pack its running token
    offset falls into — so each pack holds ≤ budget + max_chunk tokens
    and packing never needs a global order.

    Scale shape: ONE window per shard partition (never partition-less);
    shards are independent, so parallelism = n_shards regardless of
    corpus size — raise n_shards with the corpus. Deterministic modulus
    sharding keeps the op oracle-checkable; a production variant can
    shard on xxhash64(id) to break id-locality skew.

    Output adds (shard, pack_id, pack_offset): pack_offset is the
    chunk's token start within its (shard, pack_id) pack.
    """
    shard = (F.col(id_col) % n_shards).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col), F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = chunks.withColumn("shard", shard)
    cum = F.sum(token_col).over(w)
    start = cum - F.col(token_col)
    return out.select(
        "*",
        F.floor(start / budget).cast("long").alias("pack_id"),
        (start - F.floor(start / budget) * budget).cast("long").alias("pack_offset"),
    )
