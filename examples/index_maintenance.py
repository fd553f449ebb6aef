"""Operations demo for the incremental-index maintenance story (r12):

  1. build a persisted IVF ANN index, stream new batches into it
     (start_ivf_ingest_stream — frozen routing, epoch-marker
     idempotence, in-stream maintenance cadence);
  2. read the telemetry (ivf_index_stats: per-cell rows/files, skew
     ratio, replay-duplicate count) and the policy routing
     (maintain_ivf_index: compact on file/duplicate debt, report
     rebuild on distribution drift);
  3. simulate an at-least-once REPLAY of an extend batch, watch the
     stats flag the duplicates, heal them, and verify search results
     are byte-identical to the never-replayed index;
  4. run the embedding near-dup KEEPER stream over the same corpus
     (start_neardup_ingest_stream) and show its replay guarantee: the
     whole stream re-run against the same index is a no-op.

Run: python examples/index_maintenance.py [sf_dir]
(default /root/testdata/sf0.001).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from meerkat_spark.session import get_spark
    from meerkat_spark.similarity.ivf_index import (
        build_ivf_index,
        extend_ivf_index,
        ivf_index_stats,
        ivf_search,
        maintain_ivf_index,
    )
    from meerkat_spark.similarity.neardup_index import build_neardup_index
    from meerkat_spark.streaming.ingest import (
        start_ivf_ingest_stream,
        start_neardup_ingest_stream,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("index_maintenance_example")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    work = tempfile.mkdtemp(prefix="mk_maint_")

    # -- 1. build + stream new batches into the ANN index --
    seed = emb.filter("vec_id < 200")
    idx = os.path.join(work, "ivf")
    build_ivf_index(seed, idx, n_cells=8)
    chunks = os.path.join(work, "chunks")
    for i in range(4):
        emb.filter(f"vec_id >= {200 + i * 50} and vec_id < {250 + i * 50}").write.mode(
            "append"
        ).parquet(chunks)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunks)
    )
    q = start_ivf_ingest_stream(
        stream, idx, os.path.join(work, "ck_ivf"), maintain_every=2
    )
    q.awaitTermination(300)
    print("after streaming ingest:", ivf_index_stats(spark, idx))

    # -- 2/3. replay an extend, detect, heal, verify equivalence --
    queries = emb.filter("vec_id < 4")
    clean = {
        tuple(r) for r in ivf_search(spark, idx, queries, k=5, n_probe=8).collect()
    }
    replay = emb.filter("vec_id >= 350 and vec_id < 400")
    extend_ivf_index(replay, idx)  # the at-least-once double-append
    flagged = ivf_index_stats(spark, idx)
    print("after replayed extend:", {
        k: flagged[k] for k in ("n_rows", "n_duplicate_rows", "recommendation")
    })
    healed = maintain_ivf_index(spark, idx)
    print("maintenance:", {
        k: healed[k] for k in ("action", "files_before", "files_after")
    })
    after = {
        tuple(r) for r in ivf_search(spark, idx, queries, k=5, n_probe=8).collect()
    }
    assert after == clean, "healed search must equal the never-replayed index"
    assert ivf_index_stats(spark, idx)["n_duplicate_rows"] == 0

    # -- 3b. distribution drift -> opt-in REBUILD (r13) --
    # a one-direction append (every embedding shifted hard along dim 0)
    # piles into one frozen cell; the telemetry flags it, and
    # allow_rebuild=True lets the wrapper re-train from the stored
    # vectors via the atomic tmp+swap (rebuild_ivf_index)
    from pyspark.sql import functions as F

    drifted = emb.select(
        (F.col("vec_id") + 10_000).cast("long").alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + F.when(i == F.lit(0), F.lit(8.0)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    extend_ivf_index(drifted, idx)
    drift_stats = ivf_index_stats(spark, idx, skew_rebuild_ratio=3.0)
    print("after drifted append:", {
        k: drift_stats[k] for k in ("n_rows", "skew_ratio", "recommendation")
    })
    res = maintain_ivf_index(
        spark, idx, skew_rebuild_ratio=3.0, allow_rebuild=True
    )
    assert res["action"] == "rebuilt", res
    print("rebuild:", {
        k: res[k] for k in ("action", "n_cells_before", "n_cells_after")
    })
    assert res["n_rows"] == drift_stats["n_rows"]  # nothing lost
    print("post-rebuild skew:",
          ivf_index_stats(spark, idx)["skew_ratio"])

    # -- 4. keeper stream: re-running the WHOLE stream is a no-op --
    nd_idx = os.path.join(work, "neardup")
    build_neardup_index(seed, nd_idx, threshold=0.95)
    keepers = os.path.join(work, "keepers")
    for ck in ("ck_nd_a", "ck_nd_a_again"):
        s = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunks)
        )
        qq = start_neardup_ingest_stream(
            s, nd_idx, os.path.join(work, ck), threshold=0.95,
            keepers_path=keepers,
        )
        qq.awaitTermination(300)
        n_vec = spark.read.parquet(os.path.join(nd_idx, "vectors")).count()
        n_log = spark.read.parquet(keepers).count()
        print(f"keeper stream ({ck}): indexed={n_vec} keeper_log={n_log}")
    # second pass re-probes (fresh checkpoint → new epoch namespace) but
    # the indexed-id anti-join keeps every already-ingested row out
    assert n_vec == 200 + 200  # seed + the 200 streamed keepers, once
    print("OK: replay-safe maintenance lifecycle complete")


if __name__ == "__main__":
    main()
