"""meerkat_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of meerkatdb/meerkat (reference: Rust v0 at
/root/reference; README.md:3,33-34 declare an append-only columnar event
store queried with KQL over a distributed vectorized engine).

This package is a ground-up Spark-first design, NOT a port: the logical
plan is declared with the DataFrame/SQL API and Catalyst/Tungsten pick
the physical strategy. The storage layer the reference implements by hand
(columnar buffers, block encoders, segment files — reference
src/store/*) maps onto Parquet + the vectorized Parquet reader; the query
surface the reference declares (KQL pipelines) maps onto a thin
translation layer over DataFrame transformations.

Public API:
    from meerkat_spark import MeerkatEngine
    eng = MeerkatEngine(spark, sf_dir)
    eng.table("events").where(...).summarize(...)
    eng.kql("events | where value > 10 | count")
"""

from meerkat_spark.session import get_spark
from meerkat_spark.catalog import Catalog, TABLES
from meerkat_spark.table import MeerkatTable
from meerkat_spark.engine import MeerkatEngine

__all__ = ["get_spark", "Catalog", "TABLES", "MeerkatTable", "MeerkatEngine"]
__version__ = "0.1.0"
