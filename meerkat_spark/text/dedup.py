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

from hashlib import blake2b

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meerkat_spark.text.analysis import fingerprint64

# ---------------------------------------------------------------- kernels
# Signature computation runs as Arrow-vectorized pandas UDFs rather than
# Spark higher-order functions: HOF chains (transform/filter/slice per
# shingle) are evaluated INTERPRETED per element — measured 23s just to
# shingle 5k docs at sf0.1 — while the numpy kernel is row-local,
# shuffle-free, and deterministic across executors (fixed seeds,
# pandas-siphash shingle hashes with the library's fixed key; no salted
# Python hash()).

_MERSENNE61 = (1 << 61) - 1


def _perm_params(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(42)  # fixed seed: identical on every executor
    a = rng.randint(1, _MERSENNE61, size=n_perm).astype(np.uint64)
    b = rng.randint(0, _MERSENNE61, size=n_perm).astype(np.uint64)
    return a, b


def _hash64(s: str) -> int:
    return int.from_bytes(blake2b(s.encode(), digest_size=8).digest(), "little")


def _hash_strings(strings: list[str]) -> np.ndarray:
    """Vectorized deterministic 64-bit string hashing: pandas
    hash_array (C siphash with pandas' fixed default key — identical
    across processes/executors). ~20× the throughput of per-gram
    hashlib calls, which dominated the signature kernel."""
    if not strings:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(strings, dtype=object))


# Odd multiplier for position-dependent polynomial combination of word
# hashes into shingle hashes (uint64 wraparound arithmetic).
_POLY_C = np.uint64(0x9E3779B97F4A7C15)


def _poly_shingles(wh: np.ndarray, k: int) -> np.ndarray:
    """Distinct k-gram hashes from a word-hash array via a
    position-weighted polynomial (numpy slicing, no string grams)."""
    n = len(wh)
    if n == 0:
        return wh
    if n < k:
        k = n
    with np.errstate(over="ignore"):
        h = wh[k - 1 : n].copy()
        for j in range(k - 1):
            # weight = C^(k-1-j), position-dependent so order matters
            h += wh[j : n - k + 1 + j] * (_POLY_C ** np.uint64(k - 1 - j))
    return np.unique(h)


def _batch_shingle_hashes(texts, k: int) -> list[np.ndarray]:
    """Per-document shingle-hash arrays for a whole Arrow batch with ONE
    hash_array call: pd.util.hash_array has large per-call fixed cost
    (Index/dtype setup — profiled at ~80% of the per-doc kernel), so all
    words in the batch are hashed together and sliced back by offset."""
    word_lists = [(t or "").lower().split() for t in texts]
    lens = np.fromiter((len(w) for w in word_lists), dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return [np.zeros(0, dtype=np.uint64) for _ in word_lists]
    flat = np.empty(total, dtype=object)
    pos = 0
    for w in word_lists:
        flat[pos : pos + len(w)] = w
        pos += len(w)
    wh_all = pd.util.hash_array(flat)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    return [
        _poly_shingles(wh_all[offsets[i] : offsets[i + 1]], k)
        for i in range(len(word_lists))
    ]


def _shingle_hash_array(text: str, k: int) -> np.ndarray:
    """Single-doc form (kept for composability/tests); the batch form
    above is the hot path."""
    return _batch_shingle_hashes([text], k)[0]


# Per-chunk shingle budget for the vectorized minhash fold. The affine
# pass materializes an n_perm x chunk_shingles uint64 matrix, so the
# budget must keep that transient CACHE-RESIDENT: 2^12 shingles at
# n_perm=64 is a 2 MB matrix (~150 real docs per chunk — plenty to
# amortize numpy call overhead). A 2^19 budget looked harmless but its
# 256 MB transient (x2 temporaries, x32 concurrent workers) thrashed
# memory bandwidth — measured 13.6s vs 0.25s for one 5000-doc batch.
_MINHASH_CHUNK_SHINGLES = 1 << 12


def _make_minhash_udf(n_perm: int, shingle_k: int):
    a, b = _perm_params(n_perm)
    empty = np.full(n_perm, np.iinfo(np.int64).max, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_udf(texts: pd.Series) -> pd.Series:
        # whole-batch affine fold (r16): the per-doc loop issued two
        # small numpy ops per document (~65 us/doc of call overhead —
        # 0.5s of the 2.6s LSH candidate phase at sf0.1, measured); one
        # matrix multiply-add over the batch's concatenated shingles +
        # a segmented minimum.reduceat computes the identical uint64
        # values (same elementwise affine map, min over the same
        # contiguous runs — bitwise-equal signatures). Chunked so the
        # transient matrix stays bounded for long documents.
        shs = _batch_shingle_hashes(texts, shingle_k)
        out: list = [None] * len(shs)
        i = 0
        with np.errstate(over="ignore"):
            while i < len(shs):
                j, tot = i, 0
                while j < len(shs) and (
                    tot + shs[j].size <= _MINHASH_CHUNK_SHINGLES or tot == 0
                ):
                    tot += shs[j].size
                    j += 1
                nz = [t for t in range(i, j) if shs[t].size]
                if nz:
                    sh_all = np.concatenate([shs[t] for t in nz])
                    vals = a[:, None] * sh_all[None, :] + b[:, None]
                    lens = np.fromiter((shs[t].size for t in nz), dtype=np.int64)
                    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                    mins = np.minimum.reduceat(vals, starts, axis=1).view(
                        np.int64
                    )
                    for col, t in enumerate(nz):
                        out[t] = mins[:, col]
                for t in range(i, j):
                    if out[t] is None:
                        out[t] = empty
                i = j
        return pd.Series(out)

    return minhash_udf


def _make_shingles_udf(shingle_k: int):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def shingles_udf(texts: pd.Series) -> pd.Series:
        # int64 ndarray views go to Arrow directly — `.tolist()` boxed
        # every shingle hash into a Python int first (r16)
        return pd.Series(
            [
                sh.view(np.int64)
                for sh in _batch_shingle_hashes(texts, shingle_k)
            ]
        )

    return shingles_udf


def _make_simhash_udf():
    bitpos = np.arange(64, dtype=np.uint64)

    @F.pandas_udf(T.LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        # whole-batch fold (r16, same recipe as the minhash kernel):
        # the per-doc loop paid one pd.util.hash_array call per
        # document (~80% per-call fixed cost, profiled) plus a
        # 64-iteration Python bit loop per doc. One batch hash + a
        # segmented reduceat over the bit matrix computes the
        # identical integer majorities (sums of the same 0/1 terms),
        # packed with exact two's-complement wraparound. Chunked like
        # minhash so the total_words x 64 bit matrix stays small.
        word_lists = [(t or "").lower().split() for t in texts]
        lens = np.fromiter((len(w) for w in word_lists), dtype=np.int64)
        out = np.zeros(len(word_lists), dtype=np.int64)
        i = 0
        while i < len(word_lists):
            j, tot = i, 0
            while j < len(word_lists) and (
                tot + lens[j] <= _MINHASH_CHUNK_SHINGLES or tot == 0
            ):
                tot += lens[j]
                j += 1
            nz = [t for t in range(i, j) if lens[t]]
            if nz:
                flat = np.concatenate(
                    [np.asarray(word_lists[t], dtype=object) for t in nz]
                )
                th = pd.util.hash_array(flat)
                bits = ((th[:, None] >> bitpos[None, :]) & np.uint64(1)).astype(
                    np.int64
                )
                starts = np.concatenate(
                    ([0], np.cumsum(lens[nz])[:-1])
                )
                ones = np.add.reduceat(bits, starts, axis=0)  # (len(nz), 64)
                maj = ones * 2 > lens[nz][:, None]
                # exact two's-complement pack: uint64 sum of distinct
                # powers of two, viewed as int64 (== the old
                # `fp -= 1<<64` wrap when bit 63 is set)
                fps = (maj.astype(np.uint64) << bitpos[None, :]).sum(
                    axis=1, dtype=np.uint64
                ).view(np.int64)
                out[np.asarray(nz)] = fps
            i = j
        return pd.Series(out)

    return simhash_udf


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
    """(id, sig array<long>[n_perm]): min over shingle hashes of a
    64-bit affine hash family — the Arrow-vectorized numpy kernel above.

    Row-local and shuffle-free: at any corpus size the signature stage
    is an embarrassingly parallel projection (Arrow batches to the
    Python workers; ~ms per 1k docs, vs interpreted-HOF seconds)."""
    udf = _make_minhash_udf(n_perm, shingle_k)
    return df.select(F.col(id_col), udf(F.col(text_col)).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    route_exact: bool = True,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding: (id1, id2) with
    id1 < id2 and at least one of `bands` band-hashes equal.

    Scale: docs appear `bands` times; join key is (band_id, band_hash)
    — uniform unless data has huge duplicate classes. Two guards keep
    the in-bucket pair expansion from going quadratic:

    - `route_exact`: byte-identical docs (the dominant giant-class
      cause) are routed AROUND MinHash — one representative (min id)
      per fingerprint class enters the LSH, and each class contributes
      STAR pairs (rep, member) instead of all-pairs: linear in class
      size, and connected components reconstructs the full class.
    - `max_bucket`: residual oversized buckets (an adversarial band
      collision) are dropped rather than expanded — candidates only;
      a dropped bucket loses recall for that band, never correctness.

    Empty/whitespace-only docs are excluded up front: they all share
    the degenerate empty signature and would form one giant bucket."""
    from pyspark.sql import Window

    rows = n_perm // bands
    non_empty = df.filter(F.trim(F.coalesce(F.col(text_col), F.lit(""))) != "")
    exact_star = None
    if route_exact:
        # Signatures AND fingerprints are computed row-local in the scan
        # stage (one pass, big Arrow batches), then ONE narrow shuffle
        # (window over the 64-bit fingerprint, carrying id+fp+sig — not
        # text) tags every row with its class rep. Only reps enter the
        # banding, so a giant byte-identical class can never flood a
        # bucket; members become linear star pairs instead. Dup rows'
        # signatures are computed and discarded — row-local compute is
        # the cheap currency; bucket blowup and text shuffles are not.
        udf = _make_minhash_udf(n_perm, shingle_k)
        sig_fp = non_empty.select(
            F.col(id_col),
            fingerprint64(F.col(text_col)).alias("__fp"),
            udf(F.col(text_col)).alias("sig"),
        )
        w = Window.partitionBy("__fp")
        marked = sig_fp.withColumn("__rep", F.min(id_col).over(w))
        # star pairs: rep (= min id) with every other class member —
        # linear in class size; connected components restores the class
        exact_star = marked.filter(F.col(id_col) != F.col("__rep")).select(
            F.col("__rep").alias("id1"), F.col(id_col).alias("id2")
        )
        sig = marked.filter(F.col(id_col) == F.col("__rep")).select(id_col, "sig")
    else:
        sig = minhash_signatures(non_empty, text_col, id_col, n_perm, shingle_k)
    band_arr = F.array(
        *[
            F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)])
            for b in range(bands)
        ]
    )
    banded = sig.select(
        F.col(id_col), F.posexplode(band_arr).alias("band_id", "band_hash")
    )
    # Bucket-local pair expansion instead of a self-join: a self-join
    # re-evaluates the signature UDF once PER SIDE (no ReusedExchange
    # across the join inputs — measured 2× kernel cost), while one
    # groupBy computes signatures once and shuffles (band, hash, id)
    # triples once. Pairs are generated JVM-side from each bucket's
    # sorted id list (nested transform/slice — arrays, not Python).
    # Bucket lists are small by LSH construction (empty docs already
    # excluded); a giant exact-dup class costs O(c²) pairs under either
    # formulation.
    buckets = banded.groupBy("band_id", "band_hash").agg(
        F.sort_array(F.collect_list(id_col)).alias("ids")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.greatest(F.size("ids"), F.lit(1))),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    keep_bucket = F.size("ids") >= 2
    if max_bucket is not None:
        keep_bucket = keep_bucket & (F.size("ids") <= max_bucket)
    pairs = (
        buckets.filter(keep_bucket)
        .select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id1"), F.col("p.id2"))
        .distinct()
    )
    if exact_star is not None:
        # disjoint by construction (star members never enter the LSH)
        pairs = pairs.unionByName(exact_star)
    return pairs


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 5000,
    prefilter_hot: bool = False,
) -> DataFrame:
    """EXACT n-gram (k-word shingle) Jaccard similarity pairs ≥ threshold.

    Inverted-index formulation: one shuffle groups distinct shingles
    into sorted posting lists (shingle → doc ids); only docs sharing a
    shingle meet — never all pairs. Pairs are expanded JVM-side from
    each posting list (the same bucket-local idiom as the LSH path: a
    self-join would shuffle the shingle table twice and re-evaluate the
    Arrow kernel per side), then |A∩B| / (|A|+|B|-|A∩B|).

    `max_shingle_df` is the document-frequency cap that keeps the
    candidate expansion from going quadratic: a stop-phrase or
    boilerplate shingle shared by k docs would otherwise emit k(k-1)/2
    pairs. Posting lists longer than the cap are dropped BEFORE the
    expansion, and per-doc sizes are counted over the kept shingles
    only, so the ratio remains a true Jaccard of the filtered shingle
    sets. Recall loss is bounded and rare: a pair is missed only when
    ALL of its shared shingles are ultra-common (every shingle in >cap
    docs) — at threshold ≥ 0.8 near-dups share most of their shingles,
    so any rare shared shingle still surfaces the pair. Pass None to
    disable (exact textbook semantics, unsafe on boilerplate-heavy
    corpora). This is also the verifier for MinHash-LSH candidates,
    which has the analogous `max_bucket` guard.

    `prefilter_hot` (r16) picks WHERE the cap applies. Default False:
    one aggregation pass; a >cap shingle's posting list is built and
    then discarded — per-key aggregation state is O(df) ids for that
    key, fine through millions of docs per shingle but a
    single-reducer memory hazard when one boilerplate shingle spans a
    1e9-doc corpus. True: a count_distinct pre-pass finds hot
    shingles first (partial-aggregating — counter state only, never
    id arrays; |hot| <= occurrences/cap, AQE broadcasts it when it
    measures small — no forced hint, since a pathological corpus can
    have a non-broadcastable hot set), and
    the shingle stream is anti-joined before any list materializes —
    structurally memory-bounded, at the cost of evaluating the
    shingle kernel twice (~2x wall at replication x16-x32, measured
    on the jaccard_boiler fixture: 2.4/3.6 s -> 4.9/7.6 s). Same
    output bit-for-bit (pinned in tests/test_text.py); choose True
    for extreme-scale boilerplate-heavy corpora."""
    shingles_udf = _make_shingles_udf(shingle_k)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles_udf(F.col(text_col))).alias("sh"),
    )
    if max_shingle_df is not None and prefilter_hot:
        hot = (
            sh.groupBy("sh")
            .agg(F.count_distinct("id").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("sh")
        )
        sh = sh.join(hot, "sh", "left_anti")
    posts = sh.groupBy("sh").agg(F.sort_array(F.collect_set("id")).alias("ids"))
    if max_shingle_df is not None and not prefilter_hot:
        posts = posts.filter(F.size("ids") <= max_shingle_df)
    sizes = (
        posts.select(F.explode("ids").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.greatest(F.size("ids"), F.lit(1))),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    inter = (
        posts.filter(F.size("ids") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.id1").alias("id1"), F.col("p.id2").alias("id2"))
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
    """(id, simhash long): bit i is 1 iff the majority of token hashes
    have bit i set (the classic ±1-sum sign, computed in the vectorized
    numpy kernel). Row-local, shuffle-free."""
    udf = _make_simhash_udf()
    return df.select(F.col(id_col), udf(F.col(text_col)).alias("simhash"))


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


# ---------------------------------------------------------- fuzzy dedup
def verify_pairs_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """EXACT Jaccard for specific candidate (id1, id2) pairs: one Arrow
    kernel pass computes each doc's distinct shingle-hash array, the
    pairs join it twice (both joins keyed on the doc id — co-keyed
    shuffles), and the ratio is JVM array_intersect/array_union over
    int64 arrays. Work is O(candidates), never corpus².

    r16: the pair table is materialized once (bounded: O(corpus) pairs
    of two longs by LSH construction — the same scale as the edge
    checkpoint inside connected_components) because it is consumed
    twice below, and the shingle kernel runs ONLY on docs that appear
    in some pair — a left-semi prefilter that Catalyst pushes below
    the text projection, so corpora with expensive derived text (the
    planted fixtures) skip synthesis for non-candidate rows entirely.
    Inner joins on id1/id2 made both prunings result-invariant
    already; this just stops computing shingles that no pair reads."""
    shingles_udf = _make_shingles_udf(shingle_k)
    pairs = pairs.localCheckpoint(eager=True)
    cand_ids = pairs.select(
        F.explode(F.array("id1", "id2")).alias("id")
    ).distinct()
    sh = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__vt"))
        .join(cand_ids, "id", "left_semi")
        .select("id", shingles_udf(F.col("__vt")).alias("sh"))
    )
    a = sh.select(F.col("id").alias("id1"), F.col("sh").alias("sh1"))
    b = sh.select(F.col("id").alias("id2"), F.col("sh").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    uni = F.size(F.array_union("sh1", "sh2"))
    return (
        pairs.join(a, "id1")
        .join(b, "id2")
        .select(
            "id1",
            "id2",
            F.round(F.when(uni > 0, inter / uni).otherwise(1.0), 6).alias(
                "jaccard"
            ),
        )
    )


def fuzzy_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    checkpoint_dir: str | None = None,
    keeper: str = "min_id",
    score_col: str | None = None,
) -> DataFrame:
    """End-to-end fuzzy dedup — the standard training-data pipeline in
    one call: MinHash-LSH candidate pairs (bucketed, exact-class star
    routing) → EXACT Jaccard verification of candidates only (kills
    LSH false positives) → connected components over the verified
    near-dup graph → keep ONE representative per class. Returns `df`
    minus non-representative near-duplicates.

    Keeper policy:
    - "min_id" (default): the class's smallest id — cheapest (it IS
      the component label, zero extra work) and the right choice when
      ids encode arrival order.
    - "max_score": the class member with the highest `score_col`
      (ties broken by smallest id) — what production pipelines
      actually want: when near-duplicates differ (one copy truncated,
      one boilerplate-wrapped), keep the best-quality one, e.g.
      text/analysis.quality_score or a classifier score. Costs one
      extra per-class row_number over the CLASS MEMBERS ONLY (the
      duplicate-graph nodes, a small fraction of the corpus).

    Scale: candidates are O(corpus) by LSH construction, verification
    is O(candidates) co-keyed joins, components is O(graph diameter)
    keyed rounds (pass checkpoint_dir on a real cluster). Exact
    byte-identical duplicates never reach the verifier (the star
    routing pairs them directly, jaccard 1 ≥ any threshold)."""
    from meerkat_spark.operators.components import connected_components

    if keeper not in ("min_id", "max_score"):
        raise ValueError(f"unknown keeper policy {keeper!r}")
    if keeper == "max_score" and not score_col:
        raise ValueError("keeper='max_score' needs score_col")
    cands = minhash_lsh_pairs(
        df, text_col, id_col, n_perm=n_perm, bands=bands, shingle_k=shingle_k
    )
    verified = verify_pairs_jaccard(df, cands, text_col, id_col, shingle_k).filter(
        F.col("jaccard") >= threshold
    )
    comps = connected_components(
        verified, src="id1", dst="id2", checkpoint_dir=checkpoint_dir
    )
    if keeper == "min_id":
        drop = comps.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
    else:
        from pyspark.sql import Window as W

        scored = comps.join(
            df.select(
                F.col(id_col).alias("id"), F.col(score_col).alias("__score")
            ),
            "id",
        )
        w = W.partitionBy("component").orderBy(
            F.col("__score").desc(), F.col("id").asc()
        )
        drop = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > 1)
            .select(F.col("id").alias(id_col))
        )
    return df.join(drop, id_col, "left_anti")
