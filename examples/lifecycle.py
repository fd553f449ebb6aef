"""End-to-end lifecycle demo: schemaless ingest → compaction →
KQL query → streaming ingest. Run: python examples/lifecycle.py

Mirrors the reference's whole data path (meerkat README.md:13-27:
schemaless typed ingest, mandatory _ts/_dedup, time partitions, merged
segments, KQL queries) on Spark."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meerkat_spark import MeerkatEngine, get_spark
from meerkat_spark.ingest import IngestConfig, compact_table, ingest_rows
from meerkat_spark.ingest.batch import read_table


def main() -> None:
    spark = get_spark("lifecycle_demo", cpus=8)
    workdir = tempfile.mkdtemp(prefix="meerkat_demo_")
    table_path = os.path.join(workdir, "clicks")

    # 1. schemaless ingest — types inferred, _ts/_dedup enforced
    rows = [
        {"user": i % 5, "page": f"/p/{i % 7}", "dwell_ms": 100.0 + i,
         "_ts": f"2024-06-0{1 + i % 3} 10:{i % 60:02d}:00"}
        for i in range(500)
    ]
    cfg = IngestConfig(path=table_path, shards=4)
    ingest_rows(spark, rows, cfg)
    ingest_rows(spark, rows, cfg)  # replayed batch (at-least-once delivery)
    print("rows after replay:", read_table(spark, table_path).count())

    # 2. compaction — merge-time dedup, like the reference's LSM merge
    results = compact_table(spark, table_path)
    print("compaction (day -> before/after):", results)

    # 3. query it with KQL
    read_table(spark, table_path).createOrReplaceTempView("clicks")
    eng = MeerkatEngine(spark, os.path.dirname(table_path))
    eng.catalog.table = lambda name: spark.table(name)  # resolve the temp view
    out = eng.kql(
        """clicks
        | where dwell_ms > 150
        | summarize n = count(), avg_dwell = round(avg(dwell_ms), 1)
              by user, day = bin(_ts, 1d)
        | sort by n desc, user asc, day asc | take 5"""
    ).to_df()
    out.show()

    # 4. flagship over the provided fixtures
    fixtures = MeerkatEngine(spark, "/root/testdata/sf0.001")
    fixtures.kql(
        "events | where event_type == 'click' "
        "| summarize n = count() by user_id | top 3 by n"
    ).to_df().show()
    print("demo artifacts in", workdir)


if __name__ == "__main__":
    main()
