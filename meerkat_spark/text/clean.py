"""Corpus-level text cleaning for training-data pipelines: boilerplate
segment removal (the C4-style rule — drop any line that occurs in ≥ K
distinct documents: navigation chrome, cookie banners, license headers).

Scale shape (all relational, no UDFs):
  1. posexplode the segment split (row-local);
  2. count DISTINCT docs per segment — partial+final hash agg, one
     shuffle keyed on the segment text (xxhash64 of the segment would
     shrink the shuffle further; kept as text so the oracle is exact);
  3. left-anti join segments against the boilerplate set (broadcast
     when small — the common case: few segments repeat);
  4. reassemble each doc with a sorted collect_list — one shuffle on
     the doc id.
At 100 TB the heavy stages are the two keyed aggregations; nothing is
quadratic in docs or segments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boilerplate_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """(segment, n_docs) — segments occurring in ≥ min_docs docs."""
    segs = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.col(text_col), F.lit(sep), -1)).alias("segment"),
    ).filter(F.trim("segment") != "")
    return (
        segs.groupBy("segment")
        .agg(F.countDistinct("__id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """All input columns, with `text_col` rewritten minus boilerplate
    segments (original segment order preserved; docs reduced to nothing
    keep an empty string)."""
    boiler = boilerplate_segments(df, text_col, id_col, sep, min_docs).select(
        "segment"
    )
    segs = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), F.lit(sep), -1)).alias(
            "__pos", "segment"
        ),
    )
    kept = segs.join(F.broadcast(boiler), "segment", "left_anti")
    rebuilt = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__pos", "segment"))),
                lambda s: s.getField("segment"),
            ),
            sep,
        ).alias("__clean")
    )
    out = df.join(rebuilt, df[id_col] == rebuilt["__id"], "left")
    return out.withColumn(
        text_col, F.coalesce(F.col("__clean"), F.lit(""))
    ).drop("__id", "__clean")
