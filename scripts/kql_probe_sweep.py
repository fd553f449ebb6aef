"""KQL construct probe sweep — the gap-hunting harness behind the
round-8 and round-14 translator closures.

Feeds a battery of Kusto constructs through the front-end and reports
OK / SYNTAX (KqlSyntaxError — likely an unimplemented form) / ERROR
(anything else — likely a translation bug), plus semantic probes that
compare first-row values against the Kusto-documented expectation.

Usage: python scripts/kql_probe_sweep.py [sf_dir]
(default /root/testdata/sf0.001; exits 1 on any ERROR/MISMATCH —
SYNTAX misses are reported but non-fatal, since some probes cover
deliberately-unsupported corners).

Add new probes at the bottom of PROBES/SEMANTIC as Kusto corners come
up; every r14 closure (real literals, top-nested with-others position,
dynamic datatable cells, partition take, join aliases, lambda
defaults, fuzzy-union base, series_fit_line tuple, unnamed arg_min,
timespan rendering, set statements, table() refs, hex literals,
`* has`) started as a failing line here.

KNOWN-GAP BACKLOG (catalogued r14, candidates for r15):
- `scan declare (k:long = 0)` default values: the parser accepts
  only `name:type`; the scan engine initializes declared variables
  to null before first assignment (operators/scan.py), so defaults
  need BOTH a parser extension and an engine initial-state change.
- `evaluate narrow()` requires an explicit serialize/sort first
  (documented contract with a clear error); Kusto implies the
  serialization.
- dayofweek() returns the INT day count (0=Sunday) rather than
  Kusto's timespan — documented delta (functions/scalar.py), so
  `dayofweek(x) == 0d` comparisons need `== 0`.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# run-success probes: (name, query)
PROBES = [
    ("real literals", "print a = isnan(real(nan)), b = isinf(real(+inf)), c = isinf(real(-inf))"),
    ("unary plus", "print p = +5, q = 3 * +2"),
    ("top-nested with-others pre-by", "events | top-nested 2 of event_type with others='rest' by count()"),
    ("top-nested with-others post-by", "events | top-nested 2 of event_type by count() with others='rest'"),
    ("datatable dynamic cells", "datatable(a:long, d:dynamic) [1, dynamic([1,2]), 2, dynamic({'k':1})] | mv-expand d | count"),
    ("partition take sorted", "events | partition by user_id (sort by ts asc | take 2) | count"),
    ("partition take unsorted", "events | partition by user_id (take 2) | count"),
    ("cot", "print c = cot(1.0)"),
    ("join anti alias", "events | join kind=anti (events | where value > 1e9) on user_id | count"),
    ("join semi alias", "events | join kind=semi (events | take 10) on user_id | count"),
    ("join leftantisemi", "events | join kind=leftantisemi (events) on user_id | count"),
    ("join rightantisemi", "events | take 3 | join kind=rightantisemi (events) on user_id | count"),
    ("lambda default scalar", "let f = (x:long, y:long = 10) { x + y }; print v = f(5)"),
    ("lambda default invoke", "let flt = (T:(*), lo:real = 90.0) { T | where value >= lo }; events | invoke flt() | count"),
    ("union isfuzzy first leg", "union isfuzzy=true no_such_table, (events | take 2) | count"),
    ("series_fit_line 6-tuple", "print s = dynamic([1.0,2.0,3.0]) | extend (rsq, sl, va, rva, ic, lf) = series_fit_line(s) | project rsq, sl, ic"),
    ("unnamed arg_min columns", "events | summarize arg_min(value, event_id) | project value, event_id"),
    ("scan step", "events | take 50 | sort by ts asc | scan with (step s1: event_type == 'click';) | count"),
    ("mv-apply", "events | take 5 | extend a = pack_array(10,20) | mv-apply a to typeof(long) on (summarize m = max(a)) | project m"),
    ("frequency_estimate plugin", "events | evaluate frequency_estimate(event_type, 4, 4096, 0)"),
    ("weighted heavy_hitters plugin", "events | extend w = event_id % 3 + 1 | evaluate heavy_hitters(event_type, 3, 64, w)"),
    ("stratified weighted_sample plugin", "documents | where n_chars > 0 | evaluate weighted_sample(doc_id, n_chars, 3, 's', lang)"),
    ("set statements", "set notruncation; set query_timeout = 60; events | count"),
    ("table() reference", "table('events') | count"),
    ("star has", "events | where * has 'click' | count"),
]

# semantic probes: (name, query, expected first-row values)
SEMANTIC = [
    ("substring 0-based", "print s = substring('hello', 0, 2)", ["he"]),
    ("toint truncates", "print v = toint(2.9)", [2]),
    ("toint bad -> null", "print v = toint('abc')", [None]),
    ("has word boundary", "print b1 = 'cat dog' has 'cat', b2 = 'catalog' has 'cat'", [True, False]),
    ("in~ case-insensitive", "print b = 'ABC' in~ ('abc')", [True]),
    ("bin negative", "print b = bin(-1, 3)", [-3]),
    ("hex literal", "print v = 0xFF", [255]),
    ("timespan strcat", "print t = strcat('', 1h + 30m)", ["01:30:00"]),
    ("dt-dt tostring", "print d = tostring(datetime(2024-01-02) - datetime(2024-01-01))", ["1.00:00:00"]),
    ("dt-dt frac", "print d = tostring(datetime(2024-01-02 03:04:05.5) - datetime(2024-01-01))", ["1.03:04:05.5000000"]),
    # dayofweek returns the INT day count (0=Sunday) — the engine's
    # documented delta from Kusto's timespan return (scalar.py)
    ("startofweek sunday", "print d = dayofweek(startofweek(datetime(2024-02-07))) == 0", [True]),
]


def main() -> None:
    from meerkat_spark.engine import MeerkatEngine
    from meerkat_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    eng = MeerkatEngine(get_spark("kql_probe_sweep", cpus=8), sf)
    syntax = errors = mismatches = 0
    for name, q in PROBES:
        try:
            eng.kql(q).to_df().limit(3).collect()
            print(f"OK       {name}")
        except Exception as e:  # noqa: BLE001 — the probe IS the finding
            if "KqlSyntax" in type(e).__name__:
                syntax += 1
                print(f"SYNTAX   {name}: {str(e)[:120]}")
            else:
                errors += 1
                print(f"ERROR    {name}: {type(e).__name__}: {str(e)[:120]}")
    for name, q, want in SEMANTIC:
        try:
            got = list(eng.kql(q).to_df().collect()[0])
            if got != want:
                mismatches += 1
                print(f"MISMATCH {name}: got {got} want {want}")
            else:
                print(f"OK       {name}")
        except Exception as e:  # noqa: BLE001
            errors += 1
            print(f"ERROR    {name}: {type(e).__name__}: {str(e)[:120]}")
    total = len(PROBES) + len(SEMANTIC)
    print(
        f"\n{total - syntax - errors - mismatches}/{total} green "
        f"(syntax={syntax} errors={errors} mismatches={mismatches})"
    )
    sys.exit(1 if (errors or mismatches) else 0)


if __name__ == "__main__":
    main()
