"""Int8 embedding quantization — the storage/bandwidth lever for
100 TB-scale vector corpora (4× smaller than float32, 8× smaller than
float64; dot products stay exact in int32 space).

Symmetric per-vector scheme (the faiss/SQ8 shape): scale = max|v|/127,
q_i = clip(round(v_i / scale), ±127). Everything is JVM higher-order
functions over the array column — no UDF, no explode; a corpus scan
stays one narrow map stage. Rounding is the explicit floor(x + 0.5)
half-up formula so the kernel is bit-reproducible across engines (and
oracle-checkable — `round()` half-even vs half-up differs between
engines, floor(x+0.5) does not).

Reference anchor: no quantization exists in the reference (storage
layer only, reference README.md:3); this is north-star LLM-pipeline
surface per the driver contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_scale(vec) -> Column:
    """Per-vector symmetric scale: max|v| / 127 (double)."""
    v = vec if isinstance(vec, Column) else F.col(vec)
    return (
        F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))) / 127.0
    )


def quantize_int8(vec, scale: Column) -> Column:
    """array<long> of int8-range codes: clip(floor(v/scale + 0.5), ±127).
    Null scale / zero scale must be filtered by the caller (an all-zero
    vector has no scale; Kusto-style null-propagation applies)."""
    v = vec if isinstance(vec, Column) else F.col(vec)
    return F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x.cast("double") / scale + F.lit(0.5))),
        ),
    )


def dequantize(qvec, scale: Column) -> Column:
    """array<double> reconstruction: q_i * scale."""
    q = qvec if isinstance(qvec, Column) else F.col(qvec)
    return F.transform(q, lambda x: x.cast("double") * scale)


def quantize_table(
    df: DataFrame, vec_col: str = "embedding", keep_vec: bool = False
) -> DataFrame:
    """Corpus quantization: adds `q` (array<long>, int8 range) and
    `q_scale` (double); drops all-zero vectors (no representable
    scale) and, unless keep_vec, the float column — the 4× footprint
    win is the point. One narrow stage, no shuffle."""
    scale = quantize_scale(vec_col)
    out = (
        df.withColumn("q_scale", scale)
        .filter(F.col("q_scale") > 0)
        .withColumn("q", quantize_int8(vec_col, F.col("q_scale")))
    )
    return out if keep_vec else out.drop(vec_col)


def reconstruction_error(vec, qvec, scale: Column) -> Column:
    """max_i |v_i - q_i*scale| (double) — the per-vector quantization
    error; bounded by scale/2 for in-range values by construction."""
    v = vec if isinstance(vec, Column) else F.col(vec)
    q = qvec if isinstance(qvec, Column) else F.col(qvec)
    return F.array_max(
        F.zip_with(
            v, q, lambda a, b: F.abs(a.cast("double") - b.cast("double") * scale)
        )
    )
