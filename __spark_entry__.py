"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the meerkat_spark package; the suite registry
(meerkat_spark/suite/) maps one registered query per implemented
operator from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY.md §7.2):
    events | where event_type == 'click'
    | summarize n=count(), v=avg(value) by user_id, bin(ts, 1h)
    | top 10 by n."""
    from pyspark.sql import functions as F

    from meerkat_spark.suite.tabular import summarize_bin_1h

    df = summarize_bin_1h(spark, "/root/testdata/sf0.001")
    return df.orderBy(
        F.col("n").desc(), F.col("user_id").asc(), F.col("h").asc()
    ).limit(10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from meerkat_spark import suite

    return suite.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every SQL-expressible query."""
    from meerkat_spark import suite

    return suite.oracle_sql()
