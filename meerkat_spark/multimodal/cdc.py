"""Content-defined chunking (CDC) over binary payloads — the storage-
dedup primitive for media corpora: split each blob at content-derived
boundaries (gear rolling hash), so two blobs sharing a byte range
produce identical chunks REGARDLESS OF OFFSET, and chunk-hash equality
finds the shared bytes. The classic FastCDC/gear construction (public
algorithm); no codec involvement, so it works on the engine's opaque
media payloads (multimodal/binaryops.py keeps decode honestly stubbed
— container ships no codecs).

Scale shape: chunking is an Arrow kernel over the payload column
(row-local, one pass per blob); dedup analysis is ONE chunk-hash
aggregation. Nothing all-pairs; state per row is O(chunk count).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic 256-entry gear table (fixed LCG — reproducible across
# runs/executors/engines; no RNG at plan time)
_M64 = (1 << 64) - 1
_GEAR: list[int] = []
_x = 0x9E3779B97F4A7C15
for _i in range(256):
    _x = (_x * 6364136223846793005 + 1442695040888963407) & _M64
    _GEAR.append(_x)

import numpy as _np

_GEAR_NP = _np.array(_GEAR, dtype=_np.uint64)


def _chunk_bounds_ref(data: bytes, min_size: int, avg_size: int, max_size: int):
    """REFERENCE boundary finder (per-byte python loop): cut when the
    rolling gear hash's low bits are zero (mask = avg_size-1, avg_size
    a power of two). Kept as the differential-test twin of the
    vectorized `_chunk_bounds`; not used in the hot path."""
    mask = avg_size - 1
    gear = _GEAR
    n = len(data)
    bounds = []
    start = 0
    h = 0
    for i in range(n):
        h = ((h << 1) + gear[data[i]]) & _M64
        length = i + 1 - start
        if (length >= min_size and (h & mask) == 0) or length >= max_size:
            bounds.append((start, length))
            start = i + 1
            h = 0
    if start < n:
        bounds.append((start, n - start))
    return bounds


def _gear_hash_array(arr):
    """Position-independent rolling gear hash for every byte position:
    H[i] = sum_{j=0}^{63} gear[arr[i-j]] << j  (mod 2^64).

    The per-step `<<1` means contributions older than 64 bytes shift
    out of the 64-bit word, so H[i] equals the reset-at-chunk-start
    hash whenever the chunk is already >= 64 bytes long — computable
    position-independently. Built in 6 shift-and-add doubling steps
    (window 1 → 2 → 4 → ... → 64), each a whole-array numpy op:
    S_{2m}[i] = S_m[i] + (S_m[i-m] << m). uint64 wraparound is the
    mod-2^64 arithmetic."""
    import numpy as np

    S = _GEAR_NP[arr]  # fancy-index allocates a fresh array — safe to mutate
    m = 1
    while m < 64:
        # RHS materializes fully (the << temp) before the in-place add,
        # so the overlapping views are safe: S[i] += S_old[i-m] << m.
        S[m:] += S[:-m] << np.uint64(m)
        m *= 2
    return S


def _chunk_bounds(data: bytes, min_size: int, avg_size: int, max_size: int):
    """Vectorized boundary finder — exact same cuts as
    `_chunk_bounds_ref` (differential-pinned in tests/test_multimodal).

    Shape: ONE numpy pass builds the position-independent hash array +
    candidate cut positions (density 1/avg_size); the sequential walk
    then touches only candidates (searchsorted per chunk) plus, when
    min_size < 64, a <=63-byte scalar prefix per chunk where the
    reset-at-start hash differs from the position-independent one.
    ~O(n) numpy work + O(chunks · log candidates) python — the per-byte
    python loop (≈MB/s/core) is off the 100TB path."""
    import numpy as np

    n = len(data)
    if n == 0:
        return []
    mask = avg_size - 1
    arr = np.frombuffer(data, dtype=np.uint8)
    cand = np.flatnonzero(
        (_gear_hash_array(arr) & np.uint64(mask)) == np.uint64(0)
    )
    gear = _GEAR
    bounds = []
    start = 0
    while start < n:
        cut = None
        hi = start + max_size - 1  # forced-cut position (length==max)
        if min_size <= 63:
            # chunk-local prefix: windows shorter than 64 bytes see the
            # h=0 reset, so the precomputed hash array doesn't apply
            h = 0
            for i in range(start, min(start + 62, n - 1, hi) + 1):
                h = ((h << 1) + gear[data[i]]) & _M64
                length = i + 1 - start
                if (length >= min_size and (h & mask) == 0) or (
                    length >= max_size
                ):
                    cut = i
                    break
        if cut is None:
            lo = start + max(min_size, 64) - 1
            k = int(np.searchsorted(cand, lo))
            if k < cand.size and cand[k] <= hi:
                cut = int(cand[k])
            elif hi <= n - 1:
                cut = hi
        if cut is None:
            bounds.append((start, n - start))
            break
        bounds.append((start, cut + 1 - start))
        start = cut + 1
    return bounds


def cdc_chunks(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    min_size: int = 2048,
    avg_size: int = 8192,
    max_size: int = 65536,
) -> DataFrame:
    """(id, chunk_idx, offset, length, chunk_hash) — one row per CDC
    chunk of each blob. chunk_hash is the xxhash64 of the chunk bytes
    (computed JVM-side on the sliced binary — the python kernel only
    finds boundaries, keeping the hash engine-consistent)."""
    if avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two")

    def kernel(batches):
        for pdf in batches:
            ids, idxs, offs, lens = [], [], [], []
            for blob_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                for j, (off, ln) in enumerate(
                    _chunk_bounds(bytes(payload), min_size, avg_size, max_size)
                ):
                    ids.append(blob_id)
                    idxs.append(j)
                    offs.append(off)
                    lens.append(ln)
            yield pd.DataFrame(
                {id_col: ids, "chunk_idx": idxs, "offset": offs, "length": lens}
            )

    id_type = dict(df.dtypes)[id_col]
    bounds = df.select(id_col, payload_col).mapInPandas(
        kernel,
        schema=f"{id_col} {id_type}, chunk_idx long, offset long, length long",
    )
    # join bounds back to slice + hash JVM-side (co-keyed on the id)
    sliced = bounds.join(df.select(id_col, payload_col), id_col).select(
        id_col,
        "chunk_idx",
        "offset",
        "length",
        F.xxhash64(
            F.expr(f"substring({payload_col}, offset + 1, length)")
        ).alias("chunk_hash"),
    )
    return sliced


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """One-row summary of chunk-level dedup potential: total vs
    distinct chunks/bytes and the dedup ratio — ONE aggregation over
    the chunk table."""
    per_hash = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("n"), F.first("length").alias("length")
    )
    return per_hash.agg(
        F.sum("n").cast("long").alias("total_chunks"),
        F.count(F.lit(1)).cast("long").alias("distinct_chunks"),
        F.sum(F.col("n") * F.col("length")).cast("long").alias("total_bytes"),
        F.sum("length").cast("long").alias("distinct_bytes"),
        F.round(
            1.0 - F.sum("length") / F.sum(F.col("n") * F.col("length")), 6
        ).alias("dedup_ratio"),
    )
