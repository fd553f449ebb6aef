"""applyInPandasWithState: state must persist across micro-batches."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from meerkat_spark.streaming.stateful import running_user_stats


def test_state_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    ck = str(tmp_path / "ck")

    def write_batch(idx: int, rows):
        spark.createDataFrame(rows, "user_id long, value double").write.mode(
            "append"
        ).parquet(src)

    # batch 1 on disk before the stream starts
    write_batch(0, [(1, 10.0), (1, 5.0), (2, 1.0)])
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "100")
        .parquet(src)
    )
    out = running_user_stats(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_stats")
        .option("checkpointLocation", ck)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        # second micro-batch arrives later → state must carry over
        write_batch(1, [(1, 7.0), (3, 2.0)])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM user_stats"
        ).collect()
    finally:
        q.stop()
    # last emitted row per user reflects accumulated state
    latest = {}
    for r in rows:
        latest[r.user_id] = (r.n_events, r.total_value)
    assert latest[1] == (3, 22.0)  # 10+5 from batch1, +7 from batch2
    assert latest[2] == (1, 1.0)
    assert latest[3] == (1, 2.0)


def test_state_ttl_restarts_session(spark, tmp_path):
    """evict_after_ms: state older than the TTL restarts accumulation
    when the key reappears (in-state TTL — the native
    ProcessingTimeTimeout is gated off on this pyspark line, where it
    crashes the Python worker)."""
    from meerkat_spark.streaming.stateful import (
        STATE_TIMEOUT_BROKEN,
        running_user_stats,
    )

    assert STATE_TIMEOUT_BROKEN  # this container runs the broken 4.1.x line
    src = str(tmp_path / "src")
    os.makedirs(src)
    ck = str(tmp_path / "ck")

    def write_batch(rows):
        spark.createDataFrame(rows, "user_id long, value double").write.mode(
            "append"
        ).parquet(src)

    write_batch([(1, 10.0)])
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = running_user_stats(stream, evict_after_ms=1000)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("ttl_stats")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
        time.sleep(1.5)  # exceed the 1s TTL
        write_batch([(1, 7.0), (1, 3.0)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ttl_stats").collect()
    finally:
        q.stop()
    emitted = {(r.n_events, r.total_value) for r in rows}
    assert (2, 10.0) in emitted  # fresh session: only batch-2 rows
    assert (3, 20.0) not in emitted  # stale state did NOT carry over


def test_streaming_greedy_sessions_match_batch_recurrence(spark, tmp_path):
    """Round-7: the streaming sessionizer continues the greedy
    idle/max-duration recurrence ACROSS micro-batches and reproduces
    the literal batch reference exactly (sessions that straddle the
    batch boundary must not restart)."""
    import os

    from meerkat_spark.streaming.stateful import streaming_greedy_sessions

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    ck = str(tmp_path / "sess_ck")
    MIN = 60_000_000  # one minute in µs
    batch1 = [(1, 0 * MIN), (1, 10 * MIN), (2, 0 * MIN)]
    batch2 = [(1, 30 * MIN), (1, 35 * MIN), (2, 200 * MIN)]

    def write(rows):
        spark.createDataFrame(rows, "user_id long, ts_us long").write.mode(
            "append"
        ).parquet(src)

    write(batch1)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_greedy_sessions(
        stream, max_duration_ms=30 * 60_000, idle_ms=60 * 60_000
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("greedy_sessions")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
        write(batch2)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM greedy_sessions").collect()
    finally:
        q.stop()
    got = {(r.user_id, r.ts_us): r.session_start_us for r in rows}

    def ref(times, max_us, idle_us):
        sids, sess, prev = {}, None, None
        for t in times:
            if prev is None or t - prev > idle_us or t - sess > max_us:
                sess = t
            sids[t] = sess
            prev = t
        return sids

    for uid, times in {
        1: [0, 10 * MIN, 30 * MIN, 35 * MIN],
        2: [0, 200 * MIN],
    }.items():
        expect = ref(times, 30 * 60_000_000, 60 * 60_000_000)
        for t, sid in expect.items():
            assert got[(uid, t)] == sid, (uid, t)
    # user 1: t=30min is exactly start+max → stays; 35min restarts —
    # the boundary straddles the two micro-batches
    assert got[(1, 30 * MIN)] == 0 and got[(1, 35 * MIN)] == 35 * MIN
