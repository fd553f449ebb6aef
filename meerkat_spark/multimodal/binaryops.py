"""Binary media columns over Spark.

Design for 100TB of media: the payload stays an opaque `binary` column
(Parquet stores it page-compressed; Spark never materializes it except
inside the mapInPandas operator that needs the bytes). Metadata
(mime/width/height/duration) travels in cheap typed columns so filters
and joins NEVER touch payload bytes — predicate pushdown + column
pruning keep media scans metadata-only until the decode stage.

Decode is stubbed: image/audio libraries are not in this container.
`decode_stub` derives deterministic pseudo-pixels from the payload hash
— the real implementation would swap ONLY the numpy body marked below;
the operator contract (schema in/out, Arrow batching) is what's tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_SCHEMA = "media_id long, mime string, feat array<float>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_hash long"


def synthesize_media_table(
    spark: SparkSession, n: int = 64, payload_bytes: int = 256
) -> DataFrame:
    """Deterministic fake media rows (payload = seeded bytes) used by
    tests and the driver suite; stands in for a parquet media table."""
    rows = []
    mimes = ["image/png", "image/jpeg", "audio/wav", "video/mp4"]
    for i in range(n):
        rng = np.random.RandomState(i)
        payload = bytes(rng.randint(0, 256, size=payload_bytes, dtype=np.uint8))
        rows.append(
            (
                i,
                mimes[i % len(mimes)],
                64 * (1 + i % 4),
                64 * (1 + (i // 4) % 4),
                1000 * (i % 30),
                bytearray(payload),
            )
        )
    # <=64 KB-scale rows: createDataFrame slices a local list across
    # defaultParallelism (32+) partitions, so every downstream Arrow
    # kernel pays one task per mostly-empty slice (the census measured
    # two 64-task stages in media_cdc_dedup). coalesce keeps modest
    # kernel parallelism at zero shuffle; chunking/decode are row-local
    # so results are partitioning-independent.
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode — replace with PIL/libav in a real deployment.

    Deterministically expands the payload hash into a (height, width)
    uint8 'image' so downstream feature math is testable. Raises for
    empty payloads like a real decoder would.
    """
    if not payload:
        raise NotImplementedError("empty payload: real decoder required")
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width), dtype=np.uint8)


def extract_features(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Per-media feature vector (histogram of decoded pixels) via
    mapInPandas — Arrow batches in, Arrow batches out, no shuffle.
    Payload column is pruned from the output immediately."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = decode_stub(bytes(payload), int(w), int(h))
                hist, _ = np.histogram(img, bins=n_bins, range=(0, 256))
                feats.append((hist / hist.sum()).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "mime": pdf["mime"], "feat": feats}
            )

    return df.mapInPandas(op, FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, mime string, out_width int, out_height int, pixel_checksum long"
)


def resize(df: DataFrame, out_width: int = 32, out_height: int = 32) -> DataFrame:
    """Resize decoded (stubbed) images via block-mean downsampling —
    the numpy body is real resize math over the stub decode's pixels;
    a production build swaps decode_stub for a codec and keeps the rest.
    Output carries a checksum of the resized pixels (deterministic,
    testable) instead of the bytes."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            checksums = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = decode_stub(bytes(payload), int(w), int(h))
                # block-mean resize: crop to a multiple of the output
                # grid, then average each block
                bh, bw = max(h // out_height, 1), max(w // out_width, 1)
                cropped = img[: bh * out_height, : bw * out_width]
                resized = cropped.reshape(
                    cropped.shape[0] // bh, bh, cropped.shape[1] // bw, bw
                ).mean(axis=(1, 3)).astype(np.uint8)
                checksums.append(int(resized.sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "out_width": out_width,
                    "out_height": out_height,
                    "pixel_checksum": checksums,
                }
            )

    return df.mapInPandas(op, RESIZE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    index (duration/every_ms), frame content stubbed as a hash of
    (payload, frame_idx). Non-video rows pass through with frame 0."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, mime, dur, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["duration_ms"], pdf["payload"]
            ):
                n_frames = max(int(dur) // every_ms, 0) + 1 if mime == "video/mp4" else 1
                base = int.from_bytes(bytes(payload)[:8].ljust(8, b"\0"), "little")
                for fi in range(n_frames):
                    ids.append(mid)
                    idxs.append(fi)
                    h = (base ^ (fi * 0x9E3779B97F4A7C15)) % (1 << 63)
                    hashes.append(h)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_hash": hashes}
            )

    return df.mapInPandas(op, FRAME_SCHEMA)
