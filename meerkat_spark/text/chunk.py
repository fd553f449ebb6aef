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

from pyspark.sql import Column, DataFrame, Window
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


_SENTENCE_SPLIT_RE = r"(?<=[.!?])\s+(?=[A-Z0-9\"'])"


def split_sentences(text) -> "Column":
    """Sentence segmentation: split after terminal punctuation followed
    by whitespace and an upper/digit/quote opener — the standard
    regex heuristic (no model); one JVM split, row-local. Returns the
    array of sentences with surrounding whitespace trimmed."""
    c = text if isinstance(text, Column) else F.col(text)
    return F.filter(
        F.transform(F.split(c, _SENTENCE_SPLIT_RE), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def chunk_by_sentences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 256,
) -> DataFrame:
    """Sentence-aware chunking: greedily pack consecutive sentences
    into chunks of <= max_tokens whitespace tokens (one sentence never
    splits — a chunk may exceed the budget only when a single sentence
    does). Row-local: the greedy pack is an array fold over the
    sentence list; chunks explode with their index. The token-window
    chunker (chunk_documents) remains the exact-budget alternative."""
    sents = split_sentences(F.col(text_col))
    counts = F.transform(sents, lambda s: F.size(F.split(s, "\\s+")))
    # fold to chunk ids: running token count, reset when adding the
    # sentence would exceed the budget
    packed = F.aggregate(
        F.zip_with(
            sents, counts, lambda s, n: F.struct(s.alias("s"), n.alias("n"))
        ),
        F.struct(
            F.lit(0).alias("run"),
            F.lit(0).alias("cid"),
            F.array().cast("array<struct<cid:int,s:string>>").alias("out"),
        ),
        lambda acc, x: F.struct(
            F.when(acc["run"] + x["n"] > max_tokens, x["n"])
            .otherwise(acc["run"] + x["n"])
            .alias("run"),
            F.when(
                (acc["run"] + x["n"] > max_tokens) & (acc["run"] > 0),
                acc["cid"] + 1,
            )
            .otherwise(acc["cid"])
            .alias("cid"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        F.when(
                            (acc["run"] + x["n"] > max_tokens)
                            & (acc["run"] > 0),
                            acc["cid"] + 1,
                        )
                        .otherwise(acc["cid"])
                        .cast("int")
                        .alias("cid"),
                        x["s"].alias("s"),
                    )
                ),
            ).alias("out"),
        ),
        lambda acc: acc["out"],
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(packed).alias("__i", "x")
    ).select(
        id_col,
        F.col("x.cid").alias("chunk_id"),
        F.col("__i"),
        F.col("x.s").alias("s"),
    )
    # collect_list gives NO intra-group order guarantee after the
    # shuffle — reassemble by the captured sentence index, not arrival
    # order (sort_array on (index, sentence) structs restores it)
    return exploded.groupBy(id_col, "chunk_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("__i"), F.col("s")))
                ),
                lambda x: x["s"],
            ),
        ).alias("chunk_text")
    )
