"""Operations demo for the round-13 frequency-sketch family
(operators/sketches.py) and the deterministic weighted draw:

  1. batch heavy hitters: top sources over `documents` through the
     Misra-Gries path — shuffle bounded by capacity x partitions,
     never |distinct keys|; bounds printed alongside exact counts;
  2. Count-Min daily rollup: build one sketch per (simulated) day,
     persist each, merge — linearity makes the merged cells
     bit-identical to a single build over the union;
  3. streaming heavy hitters: the same corpus replayed as
     micro-batches through start_heavy_hitters_stream — sketch-sized
     persisted state, same answer as batch;
  4. weighted sampling: 20 documents drawn proportional to n_chars,
     reproducibly (same salt -> same set);
  5. streaming weighted reservoir (r14): the corpus replayed as
     micro-batches through start_weighted_sample_stream — the folded
     n-row state equals the one-pass global draw bit-for-bit.

Run: python examples/sketches.py [sf_dir]
(default /root/testdata/sf0.001).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from meerkat_spark.operators.sketches import (
        count_min_build,
        count_min_estimate,
        heavy_hitters,
        load_count_min,
        merge_count_min,
        save_count_min,
    )
    from meerkat_spark.operators.sampling import weighted_sample_n
    from meerkat_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("sketches_demo", cpus=8)
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))

    # 1. batch heavy hitters -------------------------------------------------
    hh = heavy_hitters(docs, "source", k=5, capacity=64).collect()
    exact = {
        r["source"]: r["c"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    print("top-5 sources (MG, capacity 64):")
    for r in hh:
        print(
            f"  {r['source']:>10}  est={r['approximate_count']:>6} "
            f"(+<={r['count_error_max']})  exact={exact[r['source']]}"
        )

    # 2. Count-Min daily rollup ---------------------------------------------
    params = dict(depth=4, width=4096, seed=0)
    days = [docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i) for i in range(3)]
    with tempfile.TemporaryDirectory(prefix="mk_cm_demo_") as tmp:
        daily = []
        for i, day in enumerate(days):
            cm = count_min_build(day, "source", **params)
            save_count_min(cm, os.path.join(tmp, f"day{i}"), **params)
            daily.append(load_count_min(spark, os.path.join(tmp, f"day{i}"))[0])
        merged = merge_count_min(daily)
        direct = count_min_build(docs, "source", **params)
        same = (
            merged.exceptAll(direct).count() == 0
            and direct.exceptAll(merged).count() == 0
        )
        print(f"merged 3 daily CM sketches == one union build: {same}")
        est = count_min_estimate(merged, docs, "source", **params).collect()
        print("CM estimates:", {r["source"]: r["approximate_count"] for r in est})

    # 3. streaming heavy hitters --------------------------------------------
    from meerkat_spark.streaming.ingest import (
        read_heavy_hitters_summary,
        start_heavy_hitters_stream,
    )

    with tempfile.TemporaryDirectory(prefix="mk_hh_stream_") as tmp:
        chunk_dir = os.path.join(tmp, "chunks")
        docs.select("doc_id", "source").repartition(4).write.parquet(chunk_dir)
        stream = (
            spark.readStream.schema("doc_id long, source string")
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )
        q = start_heavy_hitters_stream(
            stream, os.path.join(tmp, "hh"), os.path.join(tmp, "ckpt"),
            key_col="source", capacity=64,
        )
        q.awaitTermination(120)
        streamed = {
            r["source"]: r["est_count"]
            for r in read_heavy_hitters_summary(
                spark, os.path.join(tmp, "hh")
            ).collect()
        }
        print(f"streamed summary == exact counts: {streamed == exact}")

    # 4. weighted sampling ---------------------------------------------------
    s1 = weighted_sample_n(docs, "n_chars", 20, "doc_id", salt="demo")
    s2 = weighted_sample_n(docs, "n_chars", 20, "doc_id", salt="demo")
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in s2.collect())
    mean_w = docs.agg(F.avg("n_chars")).first()[0]
    samp_w = s1.agg(F.avg("n_chars")).first()[0]
    print(
        f"weighted draw of 20: reproducible={ids1 == ids2}; "
        f"mean n_chars {samp_w:.0f} vs corpus {mean_w:.0f} "
        "(longer docs over-represented, as requested)"
    )

    # 5. streaming weighted reservoir (r14) ----------------------------------
    from meerkat_spark.streaming.ingest import (
        read_weighted_sample,
        start_weighted_sample_stream,
    )

    with tempfile.TemporaryDirectory(prefix="mk_ws_stream_") as tmp:
        chunk_dir = os.path.join(tmp, "chunks")
        docs.select("doc_id", "n_chars").repartition(4).write.parquet(
            chunk_dir
        )
        stream = (
            spark.readStream.schema("doc_id long, n_chars long")
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )
        q = start_weighted_sample_stream(
            stream, os.path.join(tmp, "ws"), os.path.join(tmp, "ckpt_ws"),
            weight_col="n_chars", n=20, id_col="doc_id", salt="demo",
        )
        q.awaitTermination(120)
        streamed_ids = sorted(
            r["doc_id"]
            for r in read_weighted_sample(
                spark, os.path.join(tmp, "ws")
            ).collect()
        )
        print(
            "streamed weighted reservoir == one-pass global draw: "
            f"{streamed_ids == ids1}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
