"""Composite operators that Spark lacks natively, built from DataFrame
primitives with scale-correct shapes (SURVEY.md §2.2 custom-operator
policy): as-of join (union+window, one shuffle), bucketed range join
(no BroadcastNestedLoop blowup)."""

from meerkat_spark.operators.asof import asof_join
from meerkat_spark.operators.rangejoin import range_join
from meerkat_spark.operators.skew import salted_join

__all__ = ["asof_join", "range_join", "salted_join"]
