"""Registry invariants for the driver's grading window (suite._PRIORITY).

Guards the exact failure classes the driver artifacts exposed:
- r3 media_features / r4 media_features_vec: an oracle-less windowed
  query returning a top-level array column crashes the driver's
  order-insensitive canonicalizer (pandas factorize → 'unhashable
  type: list'). Oracle-backed queries are compared cell-by-cell
  against DuckDB instead and MAY return arrays (make_series_arrays is
  green), so the hashability rule applies to the oracle-less ones.
- r4 scalar_string_bytes: a registered oracle-backed query outside the
  50-slot window is never driver-graded; every name must be
  registered, and the window must be exactly 50 so intent is explicit.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType

from meerkat_spark import suite
from tests.conftest import SF_SMOKE

WINDOW = 50


@pytest.fixture(scope="module")
def registry():
    return suite.queries()


def test_priority_is_exactly_one_window(registry):
    assert len(suite._PRIORITY) == WINDOW, (
        f"_PRIORITY has {len(suite._PRIORITY)} entries; the driver grades "
        f"exactly the first {WINDOW} — keep the list at {WINDOW} so every "
        "entry is actually graded"
    )


def test_priority_names_are_registered(registry):
    unknown = [n for n in suite._PRIORITY if n not in registry]
    assert not unknown, f"_PRIORITY references unregistered queries: {unknown}"


def test_priority_has_no_duplicates():
    dupes = {n for n in suite._PRIORITY if suite._PRIORITY.count(n) > 1}
    assert not dupes, f"duplicate _PRIORITY entries waste window slots: {dupes}"


def test_windowed_oracleless_queries_return_hashable_columns(spark, registry):
    """No oracle-less windowed query may return top-level array/map
    columns: the driver's rows-only canonicalizer factorizes every
    cell with pandas, which raises on list/dict values (the exact red
    rows of r3 media_features and r4 media_features_vec). Serialize
    vectors with to_json first (see suite/multimodal.py)."""
    offenders = {}
    for name in suite._PRIORITY[:WINDOW]:
        if name in suite.ORACLE:
            continue
        df = registry[name](spark, SF_SMOKE)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle-less windowed queries return unhashable top-level "
        f"array/map columns (driver canonicalizer will crash): {offenders}"
    )
