"""MeerkatEngine — top-level entry point: catalog + builder + KQL.

The reference's planned query lifecycle (reference README.md:34):
parse KQL → logical plan → optimize → distributed plan → local
stats-based optimize → physical plan → vectorized execute. The Spark
realization (SURVEY.md §3.3): the KQL parser/translator produces
DataFrame calls (Catalyst unresolved logical plan); Catalyst + AQE do
every optimization stage; Tungsten executes vectorized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from meerkat_spark.catalog import Catalog, DEFAULT_SF_DIR
from meerkat_spark.table import MeerkatTable


class MeerkatEngine:
    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.catalog = Catalog(spark, sf_dir)
        # DataFrames persist()ed by KQL materialize() in the most recent
        # query; released by the next kql() call or clear_materialized()
        self._kql_persisted: list[DataFrame] = []

    def clear_materialized(self) -> None:
        """Unpersist materialize() caches from the last kql() query."""
        for df in self._kql_persisted:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
        self._kql_persisted = []

    def table(self, name: str) -> MeerkatTable:
        return MeerkatTable(self.catalog.table(name))

    def from_df(self, df: DataFrame) -> MeerkatTable:
        return MeerkatTable(df)

    def register_table(self, name: str, df: DataFrame) -> None:
        """Make an in-memory DataFrame queryable by name in kql()/sql()."""
        self.catalog.register(name, df)

    def sql(self, query: str) -> MeerkatTable:
        self.catalog.register_views()
        return MeerkatTable(self.spark.sql(query))

    def kql(self, query: str) -> MeerkatTable:
        """Execute a KQL pipeline string (front-end in meerkat_spark.kql)."""
        from meerkat_spark.kql import execute_kql

        return MeerkatTable(execute_kql(self, query))
