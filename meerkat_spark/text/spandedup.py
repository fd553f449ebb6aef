"""Cross-document duplicated-span removal — the 'deduplicate repeated
substrings across the corpus' step of training-data pipelines (the
suffix-array method of Lee et al., 'Deduplicating Training Data Makes
Language Models Better', approximated with fixed token windows so it
runs as ordinary Spark relational ops; the reference's storage layer
has no corpus gates — LLM-pipeline extension, SURVEY.md north star).

Approximation: a duplicated span is detected at window granularity —
`window` consecutive tokens hashed at every `stride` offset. Any
window hash occurring >1 time in the corpus marks a duplicated span;
every occurrence EXCEPT the globally-first (min (doc_id, pos)) is
removed from its document. Spans the exact method would find are
caught when they cover an aligned window; the window/stride trade-off
is recall vs blowup, as in the paper's discussion of chunking.

Scale shape:
- tokenize + window hashing are row-local HOFs (no Python);
- the explode amplification is len/stride per doc (bounded, linear);
- duplicate detection is ONE hash-key aggregation;
- occurrence→keeper resolution is min_by inside the same aggregation
  (no second pass), and the drop list joins back CO-KEYED on the
  window hash, then groups by doc — two shuffles total, both on keys
  with corpus-proportional cardinality (no all-pairs anything);
- text reconstruction is a row-local HOF filter over token indexes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text) -> Column:
    c = text if isinstance(text, Column) else F.col(text)
    return F.filter(F.split(c, "\\s+"), lambda t: t != "")


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    stride: int = 10,
) -> DataFrame:
    """(doc_id, pos, span_hash, keep) — every window-aligned span whose
    hash occurs more than once in the corpus; `keep` marks the
    globally-first occurrence (the one span dedup retains)."""
    if window < 2 or stride < 1:
        raise ValueError("window >= 2 and stride >= 1 required")
    # hash every token ONCE into an int64 array; anchor tests and
    # window hashes then operate on longs (xxhash64 over the sliced
    # int array) — no per-anchor window-size string building
    toked = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(_tokens(text_col), lambda t: F.xxhash64(t)).alias("__th"),
    )
    th = F.col("__th")
    n = F.size(th)
    # CONTENT-DEFINED window starts (winnowing/CDC anchoring): a
    # position anchors when its token's hash ≡ 0 (mod stride), so the
    # same content produces the same windows at ANY document offset —
    # aligned-to-start striding would miss shifted duplicates, the
    # exact case cross-document span dedup exists for. Expected anchor
    # density is 1/stride; a pathological stream whose tokens never
    # anchor is missed (documented recall trade-off vs suffix arrays).
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - window, F.lit(0))),
        lambda i: F.pmod(F.element_at(th, i + 1), F.lit(stride)) == 0,
    )
    spans = F.transform(
        starts,
        lambda p: F.struct(
            p.alias("pos"),
            F.xxhash64(F.slice(th, p + 1, window)).alias("h"),
        ),
    )
    from pyspark.sql import Window

    exploded = toked.select(
        "doc_id",
        F.explode(F.when(n >= window, spans)).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    # count + globally-first occurrence via ONE window pass over the
    # span hash: a groupBy + join-back would re-evaluate the whole
    # tokenize/slice/hash explode kernel on the join's probe side
    # (no ReusedExchange across self-join inputs — measured 2x), while
    # the window shuffles the (doc_id, pos, h) triples once
    w = Window.partitionBy("h")
    return (
        exploded.withColumn("n_occ", F.count(F.lit(1)).over(w))
        .withColumn("first", F.min(F.struct("doc_id", "pos")).over(w))
        .filter(F.col("n_occ") > 1)
        .select(
            "doc_id",
            "pos",
            F.col("h").alias("span_hash"),
            (
                (F.col("first.doc_id") == F.col("doc_id"))
                & (F.col("first.pos") == F.col("pos"))
            ).alias("keep"),
        )
    )


def remove_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    stride: int = 10,
) -> DataFrame:
    """`df` with `text_col` rewritten: tokens covered by any
    non-keeper duplicated span are removed (whitespace-normalized
    rejoin). Adds `n_dropped_spans`. Documents without duplicated
    spans pass through byte-for-byte except whitespace normalization
    is NOT applied to them (their text is untouched)."""
    spans = duplicated_spans(df, text_col, id_col, window, stride)
    drops = (
        spans.filter(~F.col("keep"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("__drop_pos"))
    )
    out = df.join(
        drops, df[id_col] == drops["doc_id"], "left"
    ).drop(drops["doc_id"])
    toks = _tokens(text_col)
    covered = lambda i: F.exists(  # noqa: E731
        F.col("__drop_pos"), lambda p: (i >= p) & (i < p + window)
    )
    # index-aware filter: wrap tokens in (t, i) structs, drop covered
    # indexes, project the token field back out
    rebuilt = F.array_join(
        F.transform(
            F.filter(
                F.transform(
                    toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))
                ),
                lambda s: ~covered(s["i"].cast("long")),
            ),
            lambda s: s["t"],
        ),
        " ",
    )
    return out.withColumn(
        text_col,
        F.when(F.col("__drop_pos").isNotNull(), rebuilt).otherwise(
            F.col(text_col)
        ),
    ).withColumn(
        "n_dropped_spans",
        F.coalesce(F.size("__drop_pos"), F.lit(0)).cast("long"),
    ).drop("__drop_pos")
