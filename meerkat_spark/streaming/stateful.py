"""Custom stateful streaming operator via applyInPandasWithState:
per-user running session statistics that survive across micro-batches.

The reference has no stateful query operators (its streaming is
buffered ingestion, reference README.md:20-22); this is the north-star
extension for live pipelines: arbitrary per-key state with timeout
semantics — the building block for custom sessionization, rate
tracking, and online dedup beyond dropDuplicatesWithinWatermark.

State design for scale: state is per-key (user), a few scalars — Spark
shards it across executors by the groupBy key; timeouts evict idle
keys, bounding state size by active-key cardinality, not stream length.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
import pyspark
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, batches int"
STATE_SCHEMA = "n long, total double, batches int, last_ms long"

# GroupStateTimeout.ProcessingTimeTimeout crashes the Python worker on
# pyspark 4.1.x (re-verified on 4.1.2: setTimeoutDuration → worker EOF,
# the streaming query hangs in endless task retries — standalone repro:
# scripts/repro_processing_time_timeout.py). Eviction therefore runs
# IN-STATE (TTL check on next key arrival) until the repro passes on a
# newer runtime and this gate can be deleted.
STATE_TIMEOUT_BROKEN = pyspark.__version__.startswith("4.1.")


def _make_tracker(evict_after_ms: int | None, native_timeout: bool = False):
    def _track_user(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Accumulate (count, sum(value)) per user across micro-batches;
        stale state (older than the TTL) restarts instead of carrying."""
        (user_id,) = key
        if native_timeout and state.hasTimedOut:
            state.remove()  # engine-driven idle-key eviction
            return
        now_ms = int(time.time() * 1000)
        n, total, batches, last_ms = (
            state.get if state.exists else (0, 0.0, 0, now_ms)
        )
        if evict_after_ms is not None and now_ms - last_ms > evict_after_ms:
            n, total, batches = 0, 0.0, 0  # TTL expired → fresh session
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        batches += 1
        state.update((n, total, batches, now_ms))
        if native_timeout:
            state.setTimeoutDuration(evict_after_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total],
             "batches": [batches]}
        )

    return _track_user


def running_user_stats(
    stream_df: DataFrame, evict_after_ms: int | None = None
) -> DataFrame:
    """stream of (user_id, value, …) → stateful running per-user stats.
    Emits the updated state row for each key seen in a micro-batch.

    evict_after_ms sets a state TTL. On runtimes where Spark's native
    ProcessingTimeTimeout works, idle keys would be evicted by the
    engine; on the broken 4.1.x line (STATE_TIMEOUT_BROKEN) the TTL is
    enforced in-state — a key whose state is older than the TTL restarts
    its accumulation when the key next appears. Recurring keys therefore
    see correct session-restart semantics either way; keys that never
    return hold one small state row until the upstream fix."""
    native = evict_after_ms is not None and not STATE_TIMEOUT_BROKEN
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if native else GroupStateTimeout.NoTimeout
    )
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _make_tracker(evict_after_ms, native_timeout=native),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf,
    )


SESSION_OUTPUT_SCHEMA = "user_id long, ts_us long, session_start_us long"
SESSION_STATE_SCHEMA = "sess_us long, prev_us long"


def _make_sessionizer(max_us: int, idle_us: int):
    def _sessionize(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Greedy event-time sessionization, continued across
        micro-batches: same recurrence as the batch
        row_window_session (operators/sessionize.py) — new session on
        idle gap > idle_us OR time - session_start > max_us."""
        (uid,) = key
        sess, prev = state.get if state.exists else (None, None)
        out_ts: list[int] = []
        out_sid: list[int] = []
        # One sort over the WHOLE group's batch: the group arrives as
        # an iterator of Arrow chunks (one per upstream partition that
        # held rows for the key), and chunk order is arbitrary — a
        # per-chunk sort let a later-arriving chunk with EARLIER
        # timestamps run the recurrence backwards in time.
        all_ts = sorted(int(x) for pdf in pdfs for x in pdf["ts_us"])
        for t in all_ts:
            if prev is None or t - prev > idle_us or t - sess > max_us:
                sess = t
            prev = t
            out_ts.append(t)
            out_sid.append(sess)
        if prev is not None:
            state.update((int(sess), int(prev)))
        yield pd.DataFrame(
            {
                "user_id": [uid] * len(out_ts),
                "ts_us": out_ts,
                "session_start_us": out_sid,
            }
        )

    return _sessionize


def streaming_greedy_sessions(
    stream_df: DataFrame,
    max_duration_ms: int,
    idle_ms: int,
) -> DataFrame:
    """Streaming twin of the batch greedy row_window_session: per-key
    session-start assignment with Kusto's exact MaxDuration restart,
    state = TWO longs per key (session start + previous event time) —
    sharded by the groupBy key, O(active keys) regardless of stream
    length. Events are processed in event-time order WITHIN each
    micro-batch (sorted in-kernel); cross-batch order is the source's
    delivery order — pair with a watermark + ordered source for strict
    event-time semantics (the standard structured-streaming contract).
    Input schema: (user_id long, ts_us long)."""
    fn = _make_sessionizer(
        int(max_duration_ms) * 1000, int(idle_ms) * 1000
    )
    return stream_df.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
