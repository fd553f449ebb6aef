"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the point of this module — 100TB of documents):
- Exact dedup: one shuffle on a 64-bit fingerprint (not the full text).
- MinHash: signatures are computed with ONE explode + ONE groupBy
  (n_perm min-aggregates with map-side combine) — no per-permutation
  passes. LSH banding turns all-pairs O(N²) into a self-join on
  (band_id, band_hash) — only colliding docs meet, and AQE handles
  skewed buckets.
- SimHash: 64 bit-sum aggregates in the same single groupBy pattern;
  candidate pairs via 16-bit chunk banding (pigeonhole: hamming ≤ 3 ⇒
  at least one of 4 chunks equal).
- All hashes are xxhash64 (stable across executors, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meerkat_spark.text.analysis import fingerprint64, shingle_fingerprints, tokens


# ---------------------------------------------------------------- exact
def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (normalized) docs: fingerprint → groupBy.
    Returns (fp64, n_dups, keep_id) for groups with >1 member."""
    return (
        df.select(F.col(id_col), fingerprint64(F.col(text_col)).alias("fp64"))
        .groupBy("fp64")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per distinct normalized text."""
    w_fp = df.withColumn("__fp", fingerprint64(F.col(text_col)))
    keep = w_fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return w_fp.join(keep, [ "__fp", id_col], "inner").drop("__fp")


# ---------------------------------------------------------------- minhash
def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig array<long>[n_perm]) via min-over-rehashed-shingles.

    Permutation i is realized as xxhash64(shingle_hash, i) — a fresh
    independent 64-bit hash per i, so min over shingles is a valid
    MinHash. One explode + one groupBy with n_perm mins: a single
    shuffle whose payload is (id, shingle_hash), with partial (map-side)
    min-combine."""
    sh = df.select(
        F.col(id_col), F.explode(shingle_fingerprints(F.col(text_col), shingle_k)).alias("sh")
    )
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}") for i in range(n_perm)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(n_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding: (id1, id2) with
    id1 < id2 and at least one of `bands` band-hashes equal.

    Scale: docs appear `bands` times; join key is (band_id, band_hash)
    — uniform unless data has huge duplicate classes, which AQE skew
    join splits."""
    rows = n_perm // bands
    sig = minhash_signatures(df, text_col, id_col, n_perm, shingle_k)
    band_arr = F.array(
        *[
            F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)])
            for b in range(bands)
        ]
    )
    banded = sig.select(
        F.col(id_col), F.posexplode(band_arr).alias("band_id", "band_hash")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
            "inner",
        )
        .select(F.col(f"l.{id_col}").alias("id1"), F.col(f"r.{id_col}").alias("id2"))
        .distinct()
    )
    return pairs


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT n-gram (k-word shingle) Jaccard similarity pairs ≥ threshold.

    Inverted-index formulation: explode distinct shingles, self-join on
    the shingle hash (only docs sharing a shingle meet — never all
    pairs), count intersections, compute |A∩B| / (|A|+|B|-|A∩B|).
    This is also the verifier for MinHash-LSH candidates."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_fingerprints(F.col(text_col), shingle_k)).alias("sh"),
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (
        l.join(r, (F.col("l.sh") == F.col("r.sh")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col("id").alias("id1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("id").alias("id2"), F.col("sz").alias("sz2"))
    return (
        inter.join(s1, "id1")
        .join(s2, "id2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


# ---------------------------------------------------------------- simhash
def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash long): sign of per-bit sums of token hashes.

    One explode + one groupBy with 64 conditional-sum aggregates (all
    map-side combinable); the fingerprint is assembled with bit shifts
    — fully JVM-side."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
    ).withColumn("th", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    sums = tok.groupBy(id_col).agg(*aggs)
    fp = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return sums.select(F.col(id_col), fp.alias("simhash"))


def hamming64(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via 16-bit
    chunk banding (pigeonhole: ≤3 differing bits ⇒ ≥1 of 4 chunks is
    identical), then exact hamming verify."""
    sig = simhash64(df, text_col, id_col)
    chunks = F.array(
        *[
            F.shiftright(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF)).alias(f"c{c}")
            for c in range(4)
        ]
    )
    banded = sig.select(
        F.col(id_col), F.col("simhash"), F.posexplode(chunks).alias("chunk_id", "chunk")
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk_id") == F.col("r.chunk_id"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id1"),
            F.col(f"r.{id_col}").alias("id2"),
            hamming64(F.col("l.simhash"), F.col("r.simhash")).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)
