"""Multimodal suite queries (rows-only: payload decode is stubbed —
engine-defined outputs; the Spark plumbing is the thing under test,
plus pytest coverage in tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.multimodal import (
    extract_features,
    frame_sample,
    resize,
    synthesize_media_table,
)
from meerkat_spark.suite import register


@register("media_features", oracle=None)
def media_features(spark, sf_dir):
    """Histogram features over decoded (stubbed) media payloads via
    mapInPandas; metadata-only columns survive, payload pruned.

    Graded form: the feature vector is projected to hashable scalars
    (dimension + rounded L1 checksum) — the driver's order-insensitive
    hasher cannot factorize array<float> cells (r3: 'unhashable type:
    list'). The raw-array variant rides below as media_features_vec."""
    media = synthesize_media_table(spark, n=64)
    feats = extract_features(media)
    checksum = F.round(
        F.aggregate("feat", F.lit(0.0), lambda acc, v: acc + v.cast("double")),
        6,
    )
    return feats.select(
        "media_id",
        "mime",
        F.size("feat").alias("feat_dim"),
        checksum.alias("feat_checksum"),
    ).orderBy("media_id")


@register("media_features_vec", oracle=None)
def media_features_vec(spark, sf_dir):
    """Full-vector variant: the feature vector is serialized with
    to_json so the driver's order-insensitive hasher can factorize the
    cell (raw array<float> cells raised 'unhashable type: list' in
    r3/r4). The vector content is fully represented — floats are
    rounded to 6dp first so the JSON text is deterministic."""
    media = synthesize_media_table(spark, n=64)
    feats = extract_features(media)
    rounded = F.transform("feat", lambda v: F.round(v.cast("double"), 6))
    return feats.select(
        "media_id",
        "mime",
        F.to_json(rounded).alias("feat_json"),
    ).orderBy("media_id")


@register("media_frame_sample", oracle=None)
def media_frame_sample(spark, sf_dir):
    """Video frame sampling: rows expand per sampled frame."""
    media = synthesize_media_table(spark, n=64)
    return frame_sample(media, every_ms=5000).orderBy("media_id", "frame_idx")


@register("media_resize", oracle=None)
def media_resize(spark, sf_dir):
    """Block-mean resize to 32x32 over stub-decoded pixels."""
    media = synthesize_media_table(spark, n=64)
    return resize(media, 32, 32).orderBy("media_id")


@register("media_metadata_agg", oracle=None)
def media_metadata_agg(spark, sf_dir):
    """Metadata-only aggregation — never touches payload bytes (column
    pruning; the scan reads the typed metadata columns only)."""
    media = synthesize_media_table(spark, n=64)
    return (
        media.groupBy("mime")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col("width") * F.col("height")).alias("avg_pixels"),
            F.max("duration_ms").alias("max_duration_ms"),
        )
        .orderBy("mime")
    )
