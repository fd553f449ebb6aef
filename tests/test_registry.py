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


# queries whose plan legitimately contains a cross/nested-loop join —
# every entry's build side is BOUNDED BY CONSTRUCTION:
# - 1-row totals/stats frames cross-joined onto the result
# - make-series: the bin-axis spine (bounded by the time range / step)
#   crossed with the distinct group keys
# - brute-force KNN/argmin: the broadcast QUERY set (a handful of
#   vectors) against the corpus scan — the documented exact baseline
_BOUNDED_CROSS = {
    "diffpatterns_text_op",
    "media_cdc_dedup",
    "cdc_dedup_planted",
    "temperature_mix_op",
    "print_scalars",
    "make_series_daily",
    "make_series_arrays",
    "kql_make_series",
    "series_forecast_op",
    "knn_cosine_topk",
    "knn_recall_gate",
    "argmin_distance",
    # r9: DSIR weights crossJoin a broadcast SINGLE-ROW totals
    # aggregate (n_t, n_r, |V|) — the whitelisted 1-row-cross shape
    "dsir_importance_score",
    # r15: the ANN recall envelopes embed brute_force_topk's exact twin
    # (broadcast 8-query x corpus — the same bounded cross shape as
    # knn_cosine_topk, which is already whitelisted)
    "knn_lsh_recall_envelope",
    "knn_ivf_recall_envelope",
    # r16: the pruning envelopes add the same exact twin PLUS
    # broadcast crossJoins of single-row aggregates (scanned-pair
    # count x corpus count x recall row — all 1-row sides); the
    # simhash envelope crossJoins its two 1-row stat aggregates
    "knn_lsh_pruned_envelope",
    "knn_ivf_pruned_envelope",
    "dedup_simhash_envelope",
    # late-r16: span_dedup_envelope crossJoins its planted-side stats
    # row with the broadcast 1-row clean-side aggregate;
    # media_pipeline_envelope chains three broadcast 1-row aggregate
    # crossJoins (recon x pairs_ok x shared) — both the whitelisted
    # 1-row-cross shape
    "span_dedup_envelope",
    "media_pipeline_envelope",
}


def test_registry_plans_have_no_scale_killers(spark, registry):
    """Every registered query's OPTIMIZED plan is free of cartesian
    products and (except the 1-row-cross whitelist) broadcast nested
    loop joins — the registry-wide version of the per-operator plan
    tests, so a scale-killer can't slip in through a new query."""
    offenders = {}
    for name, fn in registry.items():
        try:
            df = fn(spark, SF_SMOKE)
        except Exception as e:  # noqa: BLE001 — plan-build failure IS a finding
            offenders[name] = f"build failed: {type(e).__name__}"
            continue
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        if "Join Cross" in plan and name not in _BOUNDED_CROSS:
            offenders[name] = "cartesian/cross join"
    assert not offenders, f"scale-killer plans: {offenders}"


def test_scaling_exponents_stay_sublinear():
    """Round-7 scale-regression gate (VERDICT r6 stretch): the measured
    corpus-growth exponents recorded in SCALING.md must stay <= 1.2 —
    an exponent drifting toward 2 means an all-pairs blow-up crept into
    a bucketed kernel (the exact defect the ×16 stress twice caught:
    pre-routing neardup_lsh at 1.59, uncapped jaccard_pairs). Regenerate
    with `SCALING_MD=SCALING.md python scripts/scaling_check.py` after
    kernel changes; this test fails the ROUND, not just the run, so the
    regression surfaces before judging."""
    import os
    import re

    md = os.path.join(os.path.dirname(os.path.dirname(__file__)), "SCALING.md")
    rows = []
    for ln in open(md, encoding="utf-8"):
        m = re.match(
            r"\|\s*([a-z_0-9]+)\s*\|[^|]+\|[^|]+\|[^|]+\|\s*(-?[0-9.]+)\s*\|",
            ln,
        )
        if m:
            rows.append((m.group(1), float(m.group(2))))
    assert len(rows) >= 10, f"SCALING.md table missing/short: {rows}"
    hot = [(k, e) for k, e in rows if e > 1.2]
    assert not hot, f"super-linear scaling exponents (all-pairs risk): {hot}"
    # r13 (VERDICT r12 ask #6): the maintenance kernels must carry
    # measured exponents too — dropping a row from the artifact would
    # silently un-gate that kernel
    required = {
        "token_budget",
        "ivf_stream_ingest",
        "ivf_compact",
        "neardup_backfill",
        # r13: the frequency-sketch kernels
        "misra_gries",
        "count_min",
        # r14 (VERDICT r13 ask #4): the r13 pipeline kernels
        "weighted_sample",
        "url_dedup",
        "hh_stream_epoch",
        # r15 (VERDICT r14 ask #4): the two remaining stream keepers
        "hll_stream_epoch",
        "tdigest_stream_epoch",
    }
    have = {k for k, _ in rows}
    assert required <= have, f"SCALING.md missing kernels: {required - have}"


def test_bench_warning_attribution_pins_expected_set(spark):
    """VERDICT r9 'what's wrong' #3: bench warnings are attributed per
    (query, category), and the expected set is pinned so a NEW warning
    class (broadcast-threshold, state-leak, ...) fails CI instead of
    hiding inside an aggregate count. ResourceWarning is GC-timed py4j
    socket noise — allowed anywhere, never asserted present. The only
    expected deliberate warning is the serialized-window guard
    (UserWarning) on window_session_greedy."""
    import bench

    timings, warn_map = bench.run_headline(spark, SF_SMOKE, runs=1)
    assert set(timings) == set(bench.HEADLINE)
    deliberate = {
        (name, cat)
        for name, per in warn_map.items()
        for cat in per
        if cat != "ResourceWarning"
    }
    assert deliberate == {("window_session_greedy", "UserWarning")}, deliberate


def test_bench_normalized_ratio_gate(tmp_path):
    """VERDICT r10 ask #8: with probe-stamped baselines, the bench
    emits per-query probe-normalized ratios and surfaces entries above
    the 1.5x gate — host drift cancels, real regressions don't."""
    import json

    import bench

    base = {
        "queries": {"q_fast": 1.0, "q_slow": 1.0, "q_legacy": 1.0},
        "probe_per_query": {"q_fast": 0.010, "q_slow": 0.010},
        # q_legacy has no per-entry probe and no default -> skipped
    }
    p = tmp_path / "BENCH_LOCAL.json"
    p.write_text(json.dumps(base))
    # session host is 2x slower by probe (0.020): a 2x wall time is
    # ratio 1.0 (pure drift), a 4x wall time is ratio 2.0 (regression)
    out = bench.normalized_ratios(
        {"q_fast": 2.0, "q_slow": 4.0, "q_legacy": 2.0, "q_new": 1.0},
        probe=0.020,
        base_path=str(p),
    )
    assert out["ratio_normalized"] == {"q_fast": 1.0, "q_slow": 2.0}
    assert out["normalized_regressions"] == ["q_slow"]
    # no baseline file -> quietly empty (first round on a new machine)
    assert bench.normalized_ratios({"q": 1.0}, 0.01, str(tmp_path / "nope.json")) == {}
