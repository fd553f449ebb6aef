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
