"""KQL function library: scalar functions with KQL names/semantics
(meerkat_spark.functions.scalar) and aggregation functions
(meerkat_spark.functions.agg). See SURVEY.md §2.2.2-2.2.3."""

from meerkat_spark.functions import scalar, agg  # noqa: F401
