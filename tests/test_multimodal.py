"""Multimodal plumbing tests: schema contracts, Arrow batching,
determinism, and the stub-decode error path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meerkat_spark.multimodal import (
    decode_stub,
    extract_features,
    frame_sample,
    synthesize_media_table,
)


def test_feature_extraction_schema_and_determinism(spark):
    media = synthesize_media_table(spark, n=32)
    feats = extract_features(media, n_bins=16)
    rows = {r.media_id: r.feat for r in feats.collect()}
    assert len(rows) == 32
    assert all(len(v) == 16 for v in rows.values())
    assert all(abs(sum(v) - 1.0) < 1e-5 for v in rows.values())  # normalized
    rows2 = {r.media_id: r.feat for r in extract_features(media, n_bins=16).collect()}
    assert rows == rows2  # deterministic across runs


def test_frame_sample_expansion(spark):
    media = synthesize_media_table(spark, n=32)
    frames = frame_sample(media, every_ms=5000)
    pdf = frames.toPandas()
    per_media = pdf.groupby("media_id").size()
    videos = {r.media_id: r.duration_ms for r in media.collect() if r.mime == "video/mp4"}
    for mid, dur in videos.items():
        assert per_media[mid] == dur // 5000 + 1
    non_videos = [r.media_id for r in media.collect() if r.mime != "video/mp4"]
    assert all(per_media[m] == 1 for m in non_videos)


def test_resize_block_mean(spark):
    from meerkat_spark.multimodal import resize

    media = synthesize_media_table(spark, n=16)
    out = resize(media, 32, 32).collect()
    assert len(out) == 16
    assert all(r.out_width == 32 and r.out_height == 32 for r in out)
    # checksum of a 32x32 uint8 mean image is bounded
    assert all(0 <= r.pixel_checksum <= 255 * 32 * 32 for r in out)
    out2 = resize(media, 32, 32).collect()
    assert {r.media_id: r.pixel_checksum for r in out} == {
        r.media_id: r.pixel_checksum for r in out2
    }


def test_decode_stub_contract():
    img = decode_stub(b"\x01\x02\x03\x04\x05\x06\x07\x08", 8, 4)
    assert img.shape == (4, 8)
    with pytest.raises(NotImplementedError):
        decode_stub(b"", 8, 8)


def test_metadata_agg_prunes_payload(spark, tmp_path):
    """Metadata aggregation over a parquet media table must not read the
    payload column (column pruning at the scan)."""
    p = str(tmp_path / "media")
    synthesize_media_table(spark, n=32).write.parquet(p)
    agg = spark.read.parquet(p).groupBy("mime").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "payload" not in read_schema
    assert "mime" in read_schema


def test_cdc_chunking_offset_invariant_dedup(spark):
    import random

    from pyspark.sql import functions as F

    from meerkat_spark.multimodal.cdc import cdc_chunks, cdc_dedup_stats

    rnd = random.Random(7)
    shared = bytes(rnd.randrange(256) for _ in range(40000))
    a = bytes(rnd.randrange(256) for _ in range(5000)) + shared
    b = bytes(rnd.randrange(256) for _ in range(12345)) + shared  # shifted
    c = bytes(rnd.randrange(256) for _ in range(30000))
    df = spark.createDataFrame(
        [(1, bytearray(a)), (2, bytearray(b)), (3, bytearray(c))],
        "media_id long, payload binary",
    )
    ch = cdc_chunks(df, min_size=512, avg_size=2048, max_size=8192).cache()
    # offsets partition each blob exactly
    lens = {
        r.media_id: r.s
        for r in ch.groupBy("media_id").agg(F.sum("length").alias("s")).collect()
    }
    assert lens == {1: len(a), 2: len(b), 3: len(c)}
    h = {
        m: {r.chunk_hash for r in ch.filter(F.col("media_id") == m).collect()}
        for m in (1, 2, 3)
    }
    # the shared segment yields common chunks despite different offsets
    assert len(h[1] & h[2]) >= 5
    # unrelated blobs share nothing
    assert not (h[1] & h[3]) and not (h[2] & h[3])
    stats = cdc_dedup_stats(ch).collect()[0]
    assert stats.total_chunks > stats.distinct_chunks
    assert 0.15 < stats.dedup_ratio < 0.5
    # deterministic across invocations
    again = cdc_chunks(df, min_size=512, avg_size=2048, max_size=8192)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, ch.collect()))


def test_cdc_vectorized_bounds_match_reference():
    """Round-7: the numpy gear-hash boundary finder must cut at exactly
    the positions of the per-byte reference loop — every config class:
    min_size below/above the 64-byte position-independence window,
    constant bytes (gear[k] degenerate), repetitive blocks, tiny and
    empty inputs, and max_size forced cuts."""
    import random

    from meerkat_spark.multimodal.cdc import _chunk_bounds, _chunk_bounds_ref

    rng = random.Random(42)
    configs = [
        (16, 64, 128),       # suite fixture config (scalar-prefix path)
        (512, 2048, 8192),   # pytest vector config
        (2048, 8192, 65536), # production default (pure vector path)
        (1, 64, 64),         # max-size-dominated
        (100, 128, 150),     # min/max straddle the 64-byte window
    ]
    for n in [0, 1, 17, 63, 64, 65, 200, 1000, 5000, 30000]:
        variants = [
            bytes(rng.getrandbits(8) for _ in range(n)),
            bytes([7]) * n,
            (bytes(rng.getrandbits(8) for _ in range(max(1, n // 7))) * 8)[:n],
        ]
        for data in variants:
            for cfg in configs:
                assert _chunk_bounds(data, *cfg) == _chunk_bounds_ref(
                    data, *cfg
                ), (n, cfg)
