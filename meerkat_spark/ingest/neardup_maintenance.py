"""Compaction-style keeper jobs for the incremental dedup indexes —
the batch -> dedup -> extend loop packaged as ingest/maintenance entry
points (VERDICT r10 ask #6), mirroring ingest/compact.py's role for
segment maintenance.

Both incremental indexes (text/dedup_index.py MinHash postings,
similarity/neardup_index.py sign-LSH postings) expose the same
three-call protocol: probe the new batch for verified duplicate pairs,
drop the batch-side member of every pair, append only the keepers'
postings so the next batch sees them. The drop rule — "drop every id2
of a verified pair" — is the one the batch/stream parity tests pin
(tests/test_streaming_parity.py): id2 is always a new-batch id, so a
new item is dropped iff it collides with the index or with an
EARLIER same-batch item (new-vs-new pairs are emitted id1 < id2, so
the smallest id of a same-batch duplicate group survives).

Scale shape (unchanged from the underlying index modules): the
candidate join shuffles only the NEW batch's postings against the
band_id-partitioned stored postings; verification scores candidate
pairs only; the keeper anti-join is new-batch-sized. The one addition
here is an eager localCheckpoint of the keeper/drop sets BEFORE the
index append — without it a caller re-evaluating the returned lazy
DataFrames after extend would re-list the postings directory and see
the batch's own freshly appended files.

Reference anchor: the reference dedups at segment-merge time via the
`_dedup` column (README.md:15,22); these jobs are the near-duplicate
generalization of that maintenance loop for LLM-training corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ingest_neardup_batch(
    new_emb: DataFrame,
    path: str,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Dedup one embedding batch against the sign-LSH index AND itself,
    extend the index with the keepers, and return
    (keepers, dropped_pairs):

    - keepers: the new rows now appended to the index (new_emb schema);
    - dropped_pairs: the verified pairs whose id2 was dropped
      (id1, id2, sim, id1_is_new — id1 names the surviving collision
      partner: an indexed vector when id1_is_new is false, an
      earlier same-batch keeper when true).

    New ids must not collide with indexed ids (index contract)."""
    from meerkat_spark.similarity.neardup_index import (
        extend_neardup_index,
        incremental_neardup_pairs,
    )

    pairs = incremental_neardup_pairs(
        new_emb, path, threshold=threshold, id_col=id_col, vec_col=vec_col
    ).localCheckpoint(eager=True)
    drops = pairs.select(F.col("id2").alias(id_col)).distinct()
    keepers = new_emb.join(drops, id_col, "left_anti").localCheckpoint(
        eager=True
    )
    extend_neardup_index(keepers, path, id_col=id_col, vec_col=vec_col)
    return keepers, pairs


def ingest_minhash_batch(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    verify_jaccard: float | None = None,
    corpus: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Text twin of ingest_neardup_batch over the incremental MinHash
    index (text/dedup_index.py): same drop rule, same keeper append,
    same eager pin before the extend write. Returns
    (keepers, dropped_pairs).

    By default every band-collision candidate drops its id2 (the
    high-recall keeper the parity tests pin — right when the banding
    params are tuned to the target threshold). `verify_jaccard=t`
    instead verifies candidates with EXACT shingle Jaccard
    (text/dedup.py verify_pairs_jaccard — O(candidates), never
    corpus²) and drops only pairs at >= t. The MinHash index stores
    postings, not text (its design premise: corpus text is never
    re-read), so verification needs `corpus` = an (id, text) DataFrame
    covering the already-indexed ids; new-batch texts are supplied
    automatically."""
    from meerkat_spark.text.dedup_index import (
        extend_minhash_index,
        incremental_dedup_pairs,
    )

    pairs = incremental_dedup_pairs(
        new_docs, path, id_col=id_col, text_col=text_col
    )
    if verify_jaccard is not None:
        from meerkat_spark.text.dedup import verify_pairs_jaccard

        if corpus is None:
            raise ValueError(
                "verify_jaccard needs `corpus` (id, text) for the indexed "
                "side — the MinHash index stores postings, not text"
            )
        texts = corpus.select(
            F.col(id_col), F.col(text_col)
        ).unionByName(new_docs.select(id_col, text_col)).dropDuplicates([id_col])
        flags = pairs.select("id1", "id2", "id1_is_new")
        pairs = (
            verify_pairs_jaccard(texts, flags, text_col=text_col, id_col=id_col)
            .filter(F.col("jaccard") >= float(verify_jaccard))
            .join(flags, ["id1", "id2"])
            .select("id1", "id2", "jaccard", "id1_is_new")
        )
    pairs = pairs.localCheckpoint(eager=True)
    drops = pairs.select(F.col("id2").alias(id_col)).distinct()
    keepers = new_docs.join(drops, id_col, "left_anti").localCheckpoint(
        eager=True
    )
    extend_minhash_index(keepers, path, id_col=id_col, text_col=text_col)
    return keepers, pairs


def _parquet_file_count(root: str) -> int:
    import os

    return sum(
        1
        for dirpath, _dirs, files in os.walk(root)
        for f in files
        if f.endswith(".parquet")
    )


def _compact_dir(
    spark, dir_path: str, part_col: str | None, target_rows_per_file: int
) -> tuple[int, int]:
    """Rewrite one parquet directory with bounded file counts and swap
    it in atomically (same tmp-write + rename pair as
    ingest/compact.py — an object-store deployment would commit a
    manifest instead). Partitioned dirs repartition on the partition
    column (one task → one file per partition value); flat dirs
    repartition to ceil(rows / target_rows_per_file) files. Returns
    (files_before, files_after)."""
    import os
    import shutil
    import uuid

    before = _parquet_file_count(dir_path)
    df = spark.read.parquet(dir_path)
    tmp = dir_path + f".compact-{uuid.uuid4().hex[:8]}"
    if part_col:
        w = df.repartition(part_col).write.partitionBy(part_col)
    else:
        n_files = max(1, -(-df.count() // target_rows_per_file))
        w = df.repartition(n_files).write
    w.mode("overwrite").parquet(tmp)
    old = dir_path + ".old"
    os.rename(dir_path, old)
    os.rename(tmp, dir_path)
    shutil.rmtree(old)
    return before, _parquet_file_count(dir_path)


def compact_neardup_index(
    spark, path: str, target_rows_per_file: int = 1_000_000
) -> dict[str, tuple[int, int]]:
    """Small-file maintenance for the sign-LSH embedding index: every
    extend/ingest batch appends ONE file per touched band partition
    (plus one vectors file), so after B batches a probe of one band
    opens B files. Rewrites postings back to one file per band and the
    vectors table to ~target_rows_per_file rows per file; contents are
    unchanged (pinned by tests). Returns
    {dir: (files_before, files_after)}. The params table (1 row) is
    left alone."""
    import os

    return {
        "postings": _compact_dir(
            spark, os.path.join(path, "postings"), "band_id", target_rows_per_file
        ),
        "vectors": _compact_dir(
            spark, os.path.join(path, "vectors"), None, target_rows_per_file
        ),
    }


def compact_minhash_index(
    spark, path: str, target_rows_per_file: int = 1_000_000
) -> dict[str, tuple[int, int]]:
    """Text twin: the MinHash index is a single band_id-partitioned
    postings table at `path` — rewrite to one file per band."""
    return {
        "postings": _compact_dir(spark, path, "band_id", target_rows_per_file)
    }
