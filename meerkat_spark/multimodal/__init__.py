"""Multimodal (image/audio/video) column handling: opaque binary columns
with typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched mapInPandas operators. Media codecs are NOT in this
container — the decode step is a clearly-marked deterministic stub; the
Spark-side plumbing (schema, batching, partitioning) is real and tested."""

from meerkat_spark.multimodal.binaryops import (
    MEDIA_SCHEMA,
    synthesize_media_table,
    decode_stub,
    extract_features,
    frame_sample,
    resize,
)

__all__ = [
    "MEDIA_SCHEMA",
    "synthesize_media_table",
    "decode_stub",
    "extract_features",
    "frame_sample",
    "resize",
]
