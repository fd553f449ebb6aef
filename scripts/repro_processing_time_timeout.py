"""Repro: GroupStateTimeout.ProcessingTimeTimeout hangs the streaming
query on pyspark 4.1.x (Python worker EOF -> endless task retries).

Run:  timeout 120 python scripts/repro_processing_time_timeout.py
Observed on 4.1.2 (2026-08-14, re-verified round 5: 240s timeout,
first batch never completes): the first
processAllAvailable() never returns; the driver loops retrying the
failed state-worker task. Expected (per applyInPandasWithState docs):
both batches complete and `SURVIVED batch 2` prints.

While this reproduces, meerkat_spark.streaming.stateful gates native
timeouts off (STATE_TIMEOUT_BROKEN) and enforces the TTL in-state;
delete the gate when this script passes on a newer pyspark.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyspark
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def track(key, pdfs, state: GroupState):
    if state.hasTimedOut:
        state.remove()
        return
    n = state.get[0] if state.exists else 0
    for pdf in pdfs:
        n += len(pdf)
    state.update((n,))
    state.setTimeoutDuration(5000)  # <- the call that kills the worker
    yield pd.DataFrame({"user_id": [key[0]], "n": [n]})


def main() -> None:
    print("pyspark", pyspark.__version__)
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp()
    src, ck = d + "/src", d + "/ck"
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "user_id long, value double"
    ).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream.groupBy("user_id").applyInPandasWithState(
        track,
        "user_id long, n long",
        "n long",
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("repro")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()  # hangs here on 4.1.x
        print("SURVIVED batch 1:", spark.sql("select * from repro").collect())
        spark.createDataFrame(
            [(1, 3.0)], "user_id long, value double"
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        print("SURVIVED batch 2:", spark.sql("select * from repro").collect())
        print("ProcessingTimeTimeout WORKS — remove STATE_TIMEOUT_BROKEN gate")
    finally:
        q.stop()


if __name__ == "__main__":
    main()
