"""Streaming ingestion tests: parquet-source replay drives the stream
to completion synchronously (availableNow + awaitTermination)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meerkat_spark.ingest.batch import DEDUP_COL, TS_COL
from meerkat_spark.streaming import start_stream_ingest, streaming_window_counts


@pytest.fixture()
def events_stream(spark, tmp_path):
    # the streaming file source requires a directory — stage the single
    # fixture file into one
    src = "/root/testdata/sf0.001/events.parquet"
    stage = tmp_path / "events_src"
    stage.mkdir()
    os.symlink(src, stage / "events.parquet")
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(str(stage))
    # fixture generations vary: ns timestamps arrive as long (via
    # nanosAsLong), µs ones as TIMESTAMP_NTZ — normalize either to
    # TimestampType like the catalog does
    from pyspark.sql import types as T

    ts_type = {f.name: f.dataType for f in schema}["ts"]
    if isinstance(ts_type, T.LongType):
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def test_stream_ingest_dedup_and_partition(spark, tmp_path, events_stream):
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    src = events_stream.select(
        F.col("ts").alias(TS_COL),
        F.col("event_id").cast("int").alias(DEDUP_COL),
        "user_id",
        "event_type",
        "value",
    )
    q = start_stream_ingest(src, out, ck, watermark="1 hour", trigger_once=True)
    q.awaitTermination(120)
    batch = spark.read.parquet(out)
    n_src = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert batch.count() == n_src  # no dups in source → all rows land
    assert "_ts_day" in batch.columns
    n_days = batch.select("_ts_day").distinct().count()
    assert n_days >= 28  # January of events split into day partitions


def test_stream_ingest_drops_duplicates(spark, tmp_path):
    """Same _dedup key within the watermark → single survivor."""
    src_dir = str(tmp_path / "src")
    rows = [(i % 3, "2024-01-01 00:%02d:00" % (i % 3), float(i)) for i in range(9)]
    df = spark.createDataFrame(rows, "k int, ts_str string, v double").select(
        F.col("k").alias(DEDUP_COL),
        F.col("ts_str").cast("timestamp").alias(TS_COL),
        "v",
    )
    df.write.parquet(src_dir)
    stream = spark.readStream.schema(spark.read.parquet(src_dir).schema).parquet(src_dir)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = start_stream_ingest(stream, out, ck, watermark="1 hour")
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    assert back.count() == 3  # one per _dedup key
    assert sorted(r[DEDUP_COL] for r in back.collect()) == [0, 1, 2]


def test_streaming_window_counts(spark, events_stream):
    agg = streaming_window_counts(
        events_stream, window_size="1 day", watermark="1 hour",
        ts_col="ts", key_col="event_type",
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM win_counts")
    # append mode emits only windows closed by the watermark: 30 days of
    # data with a 1h watermark closes all but the final day
    assert out.count() >= 5 * 28
    assert set(out.columns) == {"window_start", "event_type", "n"}


def test_streaming_text_pipeline(spark, tmp_path):
    """Streaming clean chain: PII scrubbed, degenerate docs dropped,
    exact dups removed within the watermark — driven to completion via
    availableNow against a staged parquet doc source."""
    import pandas as pd

    from meerkat_spark.streaming.textpipe import clean_document_stream

    rows = [
        (1, "2024-01-01 10:00:00", "a normal sentence with the mail bob@x.io inside and enough words to pass the quality and the bar"),
        (2, "2024-01-01 10:01:00", "a normal sentence with the mail bob@x.io inside and enough words to pass the quality and the bar"),  # dup of 1 post-redaction
        (3, "2024-01-01 10:02:00", "buy buy buy buy buy buy buy buy"),  # repetition-degenerate
        (4, "2024-01-01 10:03:00", "the quick brown fox jumps over the lazy dog and it is a fine day for walking in the park"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    src = tmp_path / "docs_src"
    src.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(src / "part"))
    schema = spark.read.parquet(str(src / "part")).schema
    stream = spark.readStream.schema(schema).parquet(str(src / "part"))

    out = clean_document_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("cleaned_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: r.text for r in spark.sql("select * from cleaned_docs").collect()}
    # exactly ONE of the dup pair {1,2} survives (dropDuplicatesWithin-
    # Watermark keeps the first seen in the batch — not order-guaranteed),
    # the degenerate doc 3 is dropped, doc 4 passes
    dup_survivors = set(got) & {1, 2}
    assert len(dup_survivors) == 1 and 3 not in got and 4 in got
    assert "<EMAIL>" in got[dup_survivors.pop()]


def test_streaming_session_window_watermark(spark, tmp_path):
    """Session windows across RESTARTED availableNow runs sharing a
    checkpoint: the watermark is restored from state, a late event
    behind it is dropped (doesn't extend its session), and a session
    whose gap the watermark hasn't passed is held back in append mode."""
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    t0 = pd.Timestamp("2026-01-01 00:00:00")

    def write(name, rows):
        df = pd.DataFrame(rows, columns=["user", "ts"])
        df["ts"] = (df["ts"] - pd.Timestamp("1970-01-01")).dt.total_seconds()
        df.to_parquet(src / name)

    def run_pass():
        stream = (
            spark.readStream.schema("user long, ts double")
            .parquet(str(src))
            .withColumn("ts", F.timestamp_seconds("ts"))
        )
        agg = (
            stream.withWatermark("ts", "60 seconds")
            .groupBy(F.session_window("ts", "30 seconds"), "user")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("user", "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # pass 1: u1 session (2 events); u2 at +1h advances the watermark
    # to ~+59min, so u1's session is emitted and u2's is held open
    write("0.parquet", [(1, t0), (1, t0 + pd.Timedelta(seconds=10)),
                        (2, t0 + pd.Timedelta(hours=1))])
    run_pass()
    got1 = {(r.user, r.n) for r in spark.read.parquet(out).collect()}
    assert got1 == {(1, 2)}

    # pass 2 (watermark restored from checkpoint): u1's +20s event is
    # LATE → dropped, it must NOT reopen/extend the session; u3 at +2h
    # advances the watermark past u2's gap; u3's own session stays open
    write("1.parquet", [(1, t0 + pd.Timedelta(seconds=20)),
                        (3, t0 + pd.Timedelta(hours=2))])
    run_pass()
    got2 = {(r.user, r.n) for r in spark.read.parquet(out).collect()}
    assert got2 == {(1, 2), (2, 1)}


def test_stream_stream_interval_join(spark, tmp_path):
    """Impression->click correlation within [0, 10m]: streaming result
    must equal the equivalent batch join."""
    import datetime as dt

    from meerkat_spark.streaming.joins import stream_stream_interval_join

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    imps = [
        (i, f"u{i % 3}", base + dt.timedelta(minutes=2 * i)) for i in range(20)
    ]
    # clicks: one 4 minutes after every second impression (matches),
    # one 30 minutes after (outside the band, must not match)
    clicks = [
        (100 + i, f"u{i % 3}", base + dt.timedelta(minutes=2 * i, seconds=240))
        for i in range(0, 20, 2)
    ] + [(900, "u0", base + dt.timedelta(minutes=0, seconds=1800))]
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    spark.createDataFrame(
        imps, "imp_id long, user_id string, ts timestamp"
    ).write.parquet(imp_dir)
    spark.createDataFrame(
        clicks, "click_id long, user_id string, ts timestamp"
    ).write.parquet(clk_dir)

    imp_schema = spark.read.parquet(imp_dir).schema
    clk_schema = spark.read.parquet(clk_dir).schema
    s_imp = spark.readStream.schema(imp_schema).parquet(imp_dir)
    s_clk = spark.readStream.schema(clk_schema).parquet(clk_dir)
    joined = stream_stream_interval_join(
        s_imp, s_clk, on=["user_id"], lower="0 seconds", upper="10 minutes"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.imp_id, r.click_id)
        for r in spark.sql("SELECT imp_id, click_id FROM ssj_out").collect()
    }

    b_imp = spark.read.parquet(imp_dir)
    b_clk = spark.read.parquet(clk_dir)
    expect = {
        (r.imp_id, r.click_id)
        for r in b_imp.join(
            b_clk.withColumnRenamed("ts", "ts_r"),
            on=[
                b_imp["user_id"] == b_clk["user_id"],
                F.col("ts_r") >= F.col("ts"),
                F.col("ts_r") <= F.col("ts") + F.expr("INTERVAL 10 minutes"),
            ],
        ).collect()
    }
    assert got == expect
    assert len(got) > 0
    # the late click is out of band for impression 0 (Δ = 30 min),
    # though it may legitimately match later impressions of u0
    assert (0, 900) not in got
