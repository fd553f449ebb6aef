"""KQL scan subset: greedy non-overlapping step sequences — known
answers incl. skipped non-advancing rows, multiple matches per key,
incomplete tails, null predicates, single-step scans, and the r16
Kusto hold-at-final semantics (rows matching the last step keep
extending a completed match; the cumulative-sum idiom is a running
total)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meerkat_spark.operators.scan import scan_steps


def _funnel(spark, rows):
    df = spark.createDataFrame(rows, "user string, ts long, ev string")
    return scan_steps(
        df,
        steps=[F.col("ev") == "login", F.col("ev") == "browse", F.col("ev") == "buy"],
        order_by=["ts"],
        partition_by=["user"],
    )


def test_greedy_non_overlapping_funnel(spark):
    rows = [
        ("a", 1, "login"), ("a", 2, "browse"), ("a", 3, "buy"), ("a", 4, "login"),
        ("b", 1, "browse"), ("b", 2, "login"), ("b", 3, "buy"), ("b", 4, "browse"),
        ("b", 5, "buy"),
        ("c", 1, "login"), ("c", 2, "browse"), ("c", 3, "buy"),
        ("c", 4, "login"), ("c", 5, "browse"), ("c", 6, "buy"),
    ]
    got = sorted(
        (r.user, r.ts, r.match_id, r.step_index)
        for r in _funnel(spark, rows).collect()
    )
    assert got == [
        ("a", 1, 0, 0), ("a", 2, 0, 1), ("a", 3, 0, 2),
        # b: early buy at ts=3 must NOT complete the match
        ("b", 2, 0, 0), ("b", 4, 0, 1), ("b", 5, 0, 2),
        ("c", 1, 0, 0), ("c", 2, 0, 1), ("c", 3, 0, 2),
        ("c", 4, 1, 0), ("c", 5, 1, 1), ("c", 6, 1, 2),
    ]


def test_incomplete_sequences_emit_nothing(spark):
    rows = [("a", 1, "login"), ("a", 2, "browse"), ("b", 1, "login")]
    assert _funnel(spark, rows).count() == 0


def test_null_predicate_is_false(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, "login"), ("a", 3, "browse"), ("a", 4, "buy")],
        "user string, ts long, ev string",
    )
    out = scan_steps(
        df,
        steps=[F.col("ev") == "login", F.col("ev") == "browse", F.col("ev") == "buy"],
        order_by=["ts"],
        partition_by=["user"],
    )
    assert [r.ts for r in sorted(out.collect(), key=lambda r: r.step_index)] == [2, 3, 4]


def test_single_step_scan_holds_one_match(spark):
    """r16 hold-at-final: a single-step scan's first hit starts the
    match AT the final step; every later hit extends it (Kusto — this
    is what makes the cumulative-sum idiom a running total). One match
    per partition, not one per hit."""
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "hit"), ("a", 3, "hit")],
        "user string, ts long, ev string",
    )
    out = scan_steps(
        df, steps=[F.col("ev") == "hit"], order_by=["ts"], partition_by=["user"]
    )
    got = sorted((r.ts, r.match_id) for r in out.collect())
    assert got == [(2, 0), (3, 0)]


def test_no_steps_raises(spark):
    df = spark.createDataFrame([("a", 1, "x")], "user string, ts long, ev string")
    with pytest.raises(ValueError):
        scan_steps(df, steps=[], order_by=["ts"])


def test_hold_extends_current_step(spark):
    """Kusto step hold: rows re-matching the current step join its run;
    output=all emits the whole run."""
    df = spark.createDataFrame(
        [("a", 1, "login"), ("a", 2, "browse"), ("a", 3, "browse"),
         ("a", 4, "browse"), ("a", 5, "buy")],
        "user string, ts long, ev string",
    )
    out = scan_steps(
        df,
        steps=[F.col("ev") == "login", F.col("ev") == "browse", F.col("ev") == "buy"],
        order_by=["ts"],
        partition_by=["user"],
    )
    got = sorted((r.ts, r.step_index) for r in out.collect())
    assert got == [(1, 0), (2, 1), (3, 1), (4, 1), (5, 2)]


def test_step_output_last_and_none(spark):
    df = spark.createDataFrame(
        [("a", 1, "login"), ("a", 2, "browse"), ("a", 3, "browse"), ("a", 4, "buy")],
        "user string, ts long, ev string",
    )
    out = scan_steps(
        df,
        steps=[F.col("ev") == "login", F.col("ev") == "browse", F.col("ev") == "buy"],
        order_by=["ts"],
        partition_by=["user"],
        step_output=["none", "last", "all"],
    )
    got = sorted((r.ts, r.step_index) for r in out.collect())
    assert got == [(3, 1), (4, 2)]  # login suppressed, last browse only


def test_advance_beats_hold(spark):
    """A row satisfying both the current and next step advances; rows
    matching the FINAL step after completion extend the held match
    (r16 hold-at-final)."""
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "x"), ("a", 3, "y")],
        "user string, ts long, ev string",
    )
    out = scan_steps(
        df,
        steps=[F.col("ev") == "x", F.col("ev").isin("x", "y")],
        order_by=["ts"],
        partition_by=["user"],
    )
    got = sorted((r.ts, r.match_id, r.step_index) for r in out.collect())
    # ts=2 advances (doesn't hold at step 1); ts=3 extends the held
    # final step of the same match
    assert got == [(1, 0, 0), (2, 0, 1), (3, 0, 1)]


def test_declare_assign_funnel_latency(spark):
    """Kusto's canonical scan use: carry the first step's timestamp and
    compute funnel latency on the completing row."""
    df = spark.createDataFrame(
        [("a", 10, "login"), ("a", 25, "browse"), ("a", 31, "buy"),
         ("b", 5, "login"), ("b", 6, "browse"), ("b", 9, "browse"), ("b", 20, "buy")],
        "user string, ts long, ev string",
    )
    out = scan_steps(
        df,
        steps=[F.col("ev") == "login", F.col("ev") == "browse", F.col("ev") == "buy"],
        order_by=["ts"],
        partition_by=["user"],
        declare={"t0": "bigint"},
        step_assign=[{"t0": F.col("ts")}, {}, {}],
        step_output=["none", "none", "all"],
    )
    got = {r.user: (r.ts - r.t0) for r in out.collect()}
    assert got == {"a": 21, "b": 15}


def test_declare_validation(spark):
    df = spark.createDataFrame([("a", 1, "x")], "user string, ts long, ev string")
    with pytest.raises(ValueError, match="undeclared"):
        scan_steps(
            df, steps=[F.col("ev") == "x"], order_by=["ts"],
            step_assign=[{"t0": F.col("ts")}],
        )
    with pytest.raises(ValueError, match="collide"):
        scan_steps(
            df, steps=[F.col("ev") == "x"], order_by=["ts"],
            declare={"ts": "bigint"}, step_assign=[{"ts": F.col("ts")}],
        )


def test_concurrent_overlapping_sequences(spark):
    """concurrent=True tracks one partial match PER STEP: a new login
    that arrives while an earlier sequence waits at a later step starts
    a second, overlapping sequence (the greedy subset loses it)."""
    rows = [
        ("a", 1, "login"),   # match 0 starts
        ("a", 2, "browse"),  # match 0 → step 2
        ("a", 3, "login"),   # match 1 starts CONCURRENTLY
        ("a", 4, "buy"),     # completes match 0 (login1, browse2, buy4)
        ("a", 5, "browse"),  # match 1 → step 2
        ("a", 6, "buy"),     # completes match 1 (login3, browse5, buy6)
    ]
    df = spark.createDataFrame(rows, "user string, ts long, ev string")
    steps = [F.col("ev") == "login", F.col("ev") == "browse", F.col("ev") == "buy"]
    greedy = scan_steps(df, steps, order_by=["ts"], partition_by=["user"])
    conc = scan_steps(
        df, steps, order_by=["ts"], partition_by=["user"], concurrent=True
    )
    got_greedy = sorted((r.ts, r.match_id, r.step_index) for r in greedy.collect())
    got_conc = sorted((r.ts, r.match_id, r.step_index) for r in conc.collect())
    # greedy: one match; the ts=3 login is lost while waiting for buy,
    # and buy@6 extends the held final step (r16 hold-at-final)
    assert got_greedy == [(1, 0, 0), (2, 0, 1), (4, 0, 2), (6, 0, 2)]
    # concurrent: both overlapping sequences complete
    assert got_conc == [
        (1, 0, 0), (2, 0, 1), (3, 1, 0), (4, 0, 2), (5, 1, 1), (6, 1, 2),
    ]


def test_concurrent_newest_wins_per_step(spark):
    """Two logins before any browse: the second login REPLACES the
    step-1 partial (one-match-per-step simplification), so the match
    that completes carries the newer login."""
    rows = [
        ("a", 1, "login"), ("a", 2, "login"), ("a", 3, "browse"), ("a", 4, "buy"),
    ]
    df = spark.createDataFrame(rows, "user string, ts long, ev string")
    steps = [F.col("ev") == "login", F.col("ev") == "browse", F.col("ev") == "buy"]
    conc = scan_steps(
        df, steps, order_by=["ts"], partition_by=["user"], concurrent=True
    )
    got = sorted((r.ts, r.match_id, r.step_index) for r in conc.collect())
    # ts=2 holds/extends the step-1 run (same partial match), both rows emit
    assert got == [(1, 0, 0), (2, 0, 0), (3, 0, 1), (4, 0, 2)]


def test_kql_scan_kind_concurrent(spark):
    """`scan kind=concurrent` through the KQL front-end finds both
    overlapping funnels (kind=greedy / default finds one)."""
    from meerkat_spark.engine import MeerkatEngine

    df = spark.createDataFrame(
        [(1, "login"), (2, "browse"), (3, "login"), (4, "buy"),
         (5, "browse"), (6, "buy")],
        "ts long, ev string",
    )
    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    eng.catalog._cache["t"] = df
    body = ('with (step a: ev == "login"; step b: ev == "browse"; '
            'step c: ev == "buy";)')
    greedy = eng.kql(f"t | sort by ts asc | scan {body}").to_df()
    conc = eng.kql(
        f"t | sort by ts asc | scan kind=concurrent {body}"
    ).to_df()
    assert greedy.select("match_id").distinct().count() == 1
    assert conc.select("match_id").distinct().count() == 2


def test_concurrent_vars_follow_their_own_match(spark):
    """Each concurrent partial match carries its OWN declared-variable
    snapshot: overlapping funnels report their own t0."""
    rows = [
        ("a", 10, "login"), ("a", 20, "browse"), ("a", 30, "login"),
        ("a", 40, "buy"), ("a", 50, "browse"), ("a", 60, "buy"),
    ]
    df = spark.createDataFrame(rows, "user string, ts long, ev string")
    steps = [F.col("ev") == "login", F.col("ev") == "browse", F.col("ev") == "buy"]
    out = scan_steps(
        df, steps, order_by=["ts"], partition_by=["user"],
        declare={"t0": "bigint"},
        step_assign=[{"t0": F.col("ts")}, {}, {}],
        step_output=["none", "none", "all"],
        concurrent=True,
    )
    got = {r.match_id: (r.ts, r.t0) for r in out.collect()}
    assert got == {0: (40, 10), 1: (60, 30)}


def test_concurrent_single_step_holds_like_greedy(spark):
    """A one-step scan holds at the final step in EVERY mode (r16):
    the first matching row starts the match, later matching rows
    extend it — greedy, concurrent, and bounded-partials agree."""
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("a", 3, "x")],
        "user string, ts long, ev string",
    )
    for conc, partials in ((False, 1), (True, 1), (True, 4)):
        out = scan_steps(
            df, steps=[F.col("ev") == "x"], order_by=["ts"],
            partition_by=["user"], concurrent=conc,
            concurrent_partials=partials,
        )
        got = sorted((r.ts, r.match_id) for r in out.collect())
        assert got == [(1, 0), (3, 0)], (conc, partials, got)


def test_scan_vars_in_predicate_greedy_kql(spark):
    """Round-5: declared variables inside step predicates (full Kusto
    parity). The time-bound conjunct is evaluated against the
    sequence's own t0; a too-late buy does not complete the funnel,
    and a later login re-arms t0 via the hold."""
    from meerkat_spark.engine import MeerkatEngine

    df = spark.createDataFrame(
        [(1, "login"), (100, "buy"), (200, "login"), (220, "buy")],
        "ts long, ev string",
    )
    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    eng.catalog._cache["t"] = df
    out = eng.kql(
        "t | sort by ts asc | scan declare (t0: long) with ("
        ' step a: ev == "login" => t0 = ts;'
        ' step b: ev == "buy" and ts - t0 < 50;)'
    ).to_df()
    got = sorted((r.ts, r.t0, r.match_id, r.step_index) for r in out.collect())
    # buy@100 is 99s after t0=1 -> rejected; login@200 holds (t0=200);
    # buy@220 completes. Both step-a rows emit with their own snapshots.
    assert got == [(1, 1, 0, 0), (200, 200, 0, 0), (220, 200, 0, 1)]


def test_scan_vars_in_predicate_concurrent(spark):
    """Concurrent mode evaluates the var residual per candidate state:
    promote is checked against the step-(k-1) match's variables, hold
    against the step-k match's own variables."""
    from meerkat_spark.engine import MeerkatEngine

    df = spark.createDataFrame(
        [(0, "s"), (5, "m"), (8, "s"), (15, "m"), (30, "m"), (50, "e")],
        "ts long, ev string",
    )
    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    eng.catalog._cache["t"] = df
    out = eng.kql(
        "t | sort by ts asc | scan kind=concurrent declare (t0: long) with ("
        ' step a: ev == "s" => t0 = ts;'
        ' step b: ev == "m" and ts - t0 <= 10;'
        ' step c: ev == "e" and ts - t0 <= 100;)'
    ).to_df()
    got = sorted((r.ts, r.t0, r.step_index) for r in out.collect())
    # seq1 (t0=0) promotes to b at ts=5, then is evicted (newest-wins)
    # by seq2 (t0=8) promoting at ts=15; m@30 fails BOTH the promote
    # residual (30-8 > 10) and the hold residual (newest state t0=8,
    # 30-8 > 10); e@50 completes seq2.
    assert got == [(8, 8, 0), (15, 8, 1), (50, 8, 2)]


def test_scan_var_pred_unsupported_construct_raises(spark):
    from meerkat_spark.engine import MeerkatEngine
    from meerkat_spark.kql.lexer import KqlSyntaxError

    df = spark.createDataFrame([(1, "a")], "ts long, ev string")
    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    eng.catalog._cache["t"] = df
    with pytest.raises(KqlSyntaxError, match="variable-dependent"):
        eng.kql(
            "t | sort by ts asc | scan declare (t0: long) with ("
            ' step a: ev == "a" => t0 = ts;'
            " step b: strlen(ev) > t0;)"
        ).to_df().collect()


def test_scan_bounded_multi_partials(spark):
    """with_partials=N: multiple same-step partial matches in flight —
    two variable-distinguished overlapping funnels BOTH complete (the
    newest-wins subset loses one)."""
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)
    q = """datatable(seq:long, ev:string, who:string)
           [1, 's1', 'A', 2, 's1', 'B', 3, 's2', 'B', 4, 's2', 'A']
           | sort by seq asc
           | scan kind=concurrent {P} declare (w: string) with (
               step one: ev == 's1' => w = who;
               step two: ev == 's2' and who == w;
             )
           | project match_id, step_index, who, w"""
    multi = [
        (r.match_id, r.step_index, r.who, r.w)
        for r in eng.kql(q.replace("{P}", "with_partials=4"))
        .to_df()
        .orderBy("match_id", "step_index")
        .collect()
    ]
    assert multi == [
        (0, 0, "B", "B"),
        (0, 1, "B", "B"),
        (1, 0, "A", "A"),
        (1, 1, "A", "A"),
    ]
    single = [
        (r.match_id, r.who)
        for r in eng.kql(q.replace("{P}", ""))
        .to_df()
        .collect()
    ]
    # the one-partial subset completes only one of the two funnels
    assert len({m for m, _ in single}) == 1

    # the bound caps state: with_partials=1 equals the legacy subset
    legacy = eng.kql(q.replace("{P}", "with_partials=1")).to_df().collect()
    assert sorted(map(tuple, legacy)) == sorted(
        map(tuple, eng.kql(q.replace("{P}", "")).to_df().collect())
    )


def test_unpartitioned_scan_warns_and_bounds(spark):
    """Without partition_by the scan degrades to ONE sequential
    partition — that must be loud (warning) and bounded (groups above
    max_unpartitioned_rows raise instead of silently serializing)."""
    import warnings

    from meerkat_spark.operators.scan import scan_steps

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(100)], "i long, t string"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = scan_steps(
            df,
            steps=[F.col("t") == "a", F.col("t") == "b"],
            order_by=["i"],
        )
        assert any("without partition_by" in str(x.message) for x in w)
    assert out.count() == 100  # 50 a->b funnels, 2 rows each

    bounded = scan_steps(
        df,
        steps=[F.col("t") == "a", F.col("t") == "b"],
        order_by=["i"],
        max_unpartitioned_rows=10,
    )
    with pytest.raises(Exception, match="without partition_by"):
        bounded.count()


def test_concurrent_partials_state_is_bounded(spark):
    """Adversarial overlap: M step-1 rows then one step-2 row. Unbounded
    Kusto state tables would keep all M partials (O(steps x M) state and
    M completed matches on the closing row); the bounded machine keeps
    at most `concurrent_partials`, evicting oldest — state and output
    are capped by the bound, which is the documented memory contract."""
    m = 200
    rows = [(i, "s1") for i in range(m)] + [(m, "s2")]
    df = spark.createDataFrame(rows, "i long, t string")
    for bound in (1, 4, 32):
        out = scan_steps(
            df,
            steps=[F.col("t") == "s1", F.col("t") == "s2"],
            order_by=["i"],
            partition_by=None,
            concurrent=True,
            concurrent_partials=bound,
            step_output=["last", "all"],
        )
        got = out.collect()
        # one closing row completes at most `bound` overlapping matches
        n_matches = len({r.match_id for r in got})
        assert n_matches == min(bound, m)
        # the survivors are the NEWEST partials (oldest evicted)
        starts = sorted(r.i for r in got if r.step_index == 0)
        assert starts == list(range(m - min(bound, m), m))


def test_scan_declare_defaults_accumulator(spark):
    """r15 (probe-backlog closure): `scan declare (k:long = 0)` default
    values, plus var-REFERENCING assignments (`k = k + 1`, the Kusto
    accumulator form) — evaluated python-side inside the machine since
    declared variables are not columns. Accumulation carries across
    step holds; each new sequence restarts at the DEFAULT, not null."""
    from meerkat_spark.engine import MeerkatEngine

    df = spark.createDataFrame(
        [(1, "c"), (2, "c"), (3, "v"), (4, "c"), (5, "v")],
        "ts long, ev string",
    )
    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    eng.catalog._cache["t"] = df
    out = eng.kql(
        "t | sort by ts asc | scan declare (k: long = 10) with ("
        ' step a: ev == "c" => k = k + 1;'
        ' step b: ev == "v";)'
    ).to_df()
    got = sorted((r.ts, r.k, r.match_id, r.step_index) for r in out.collect())
    # seq 1: c@1 (k=11), c@2 holds (k=12), v@3 completes (k stays 12);
    # seq 2 RESTARTS at the default: c@4 (k=11), v@5 completes.
    assert got == [
        (1, 11, 0, 0),
        (2, 12, 0, 0),
        (3, 12, 0, 1),
        (4, 11, 1, 0),
        (5, 11, 1, 1),
    ]


def test_scan_default_visible_before_assignment(spark):
    """r15: a declared default is the variable's value on rows emitted
    BEFORE any assignment touches it (Kusto: defaults replace the null
    initial state)."""
    from meerkat_spark.engine import MeerkatEngine

    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "ts long, ev string"
    )
    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    eng.catalog._cache["t"] = df
    out = eng.kql(
        "t | sort by ts asc | scan declare (k: long = 7) with ("
        ' step s1: ev == "a";'
        ' step s2: ev == "b" => k = k + 1;)'
    ).to_df()
    got = sorted((r.ts, r.k, r.step_index) for r in out.collect())
    assert got == [(1, 7, 0), (2, 8, 1)]


def test_scan_default_in_var_predicate(spark):
    """r15: a var-dependent step predicate sees the DEFAULT (not null)
    before the first assignment — `k < 2` admits rows while k holds its
    declared 0."""
    from meerkat_spark.engine import MeerkatEngine

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "z")], "ts long, ev string"
    )
    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    eng.catalog._cache["t"] = df
    out = eng.kql(
        "t | sort by ts asc | scan declare (k: long = 0) with ("
        ' step a: ev == "a" and k < 2 => k = k + 1;'
        ' step b: ev == "z";)'
    ).to_df()
    got = sorted((r.ts, r.k, r.step_index) for r in out.collect())
    # a@1 (k 0->1), a@2 holds (k 1->2), a@3 REJECTED (k == 2),
    # z@4 completes with k = 2
    assert got == [(1, 1, 0), (2, 2, 0), (4, 2, 1)]


def test_scan_accumulator_concurrent(spark):
    """r15: python-evaluated accumulator assignments compose with
    kind=concurrent — each concurrent partial carries its own running
    value from its own default."""
    from meerkat_spark.engine import MeerkatEngine

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "z")], "ts long, ev string"
    )
    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    eng.catalog._cache["t"] = df
    out = eng.kql(
        "t | sort by ts asc"
        " | scan kind = concurrent declare (k: long = 100) with ("
        ' step a: ev == "a" => k = k + 1;'
        ' step b: ev == "z";)'
    ).to_df()
    got = sorted((r.ts, r.k, r.step_index) for r in out.collect())
    # newest-wins single-partial default: a@2 holds the step-a match
    # (k 101->102); z@3 promotes it. Emitted rows snapshot their own k.
    assert got == [(1, 101, 0), (2, 102, 0), (3, 102, 1)]


def test_final_step_holds_and_extends(spark):
    """r16 hold-at-final (greedy): after login→buy completes, further
    buys before the next login extend the SAME match; the next login
    finalizes it and starts match 1. Non-matching rows in between are
    skipped without ending the hold."""
    df = spark.createDataFrame(
        [("a", 1, "login"), ("a", 2, "buy"), ("a", 3, "buy"),
         ("a", 4, "other"), ("a", 5, "buy"), ("a", 6, "login"),
         ("a", 7, "buy")],
        "user string, ts long, ev string",
    )
    out = scan_steps(
        df,
        steps=[F.col("ev") == "login", F.col("ev") == "buy"],
        order_by=["ts"],
        partition_by=["user"],
    )
    got = sorted((r.ts, r.match_id, r.step_index) for r in out.collect())
    assert got == [
        (1, 0, 0), (2, 0, 1), (3, 0, 1), (5, 0, 1),
        (6, 1, 0), (7, 1, 1),
    ]


def test_hold_at_final_output_last(spark):
    """output='last' on the final step emits the LAST held row of the
    run — emission is deferred until the match truly ends."""
    df = spark.createDataFrame(
        [("a", 1, "login"), ("a", 2, "buy"), ("a", 3, "buy"),
         ("a", 4, "login"), ("a", 5, "buy")],
        "user string, ts long, ev string",
    )
    out = scan_steps(
        df,
        steps=[F.col("ev") == "login", F.col("ev") == "buy"],
        order_by=["ts"],
        partition_by=["user"],
        step_output=["none", "last"],
    )
    got = sorted((r.ts, r.match_id) for r in out.collect())
    assert got == [(3, 0), (5, 1)]


def test_hold_wins_over_new_start(spark):
    """A row matching BOTH the held final step and step 1 extends the
    hold (Kusto evaluates steps backwards — last step first); only a
    row matching step 1 alone starts a new sequence."""
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "both"), ("a", 3, "both")],
        "user string, ts long, ev string",
    )
    out = scan_steps(
        df,
        steps=[F.col("ev").isin("x", "both"), F.col("ev") == "both"],
        order_by=["ts"],
        partition_by=["user"],
    )
    got = sorted((r.ts, r.match_id, r.step_index) for r in out.collect())
    # x@1 step0, both@2 advances to final, both@3 HOLDs (does not
    # start a new sequence even though it matches step 1 too)
    assert got == [(1, 0, 0), (2, 0, 1), (3, 0, 1)]


def test_cumulative_sum_scan_idiom_kql(spark):
    """The Kusto cumulative-sum idiom (r16 probe-backlog closure):
    `scan declare (t:long=0) with (step s1: true => t = t + x;)` —
    a single always-true step holds at the final step forever, so t
    accumulates across the whole serialized stream (one match)."""
    from meerkat_spark.engine import MeerkatEngine

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "ts long, x long"
    )
    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    eng.catalog._cache["t"] = df
    out = eng.kql(
        "t | sort by ts asc | scan declare (t: long = 0) with ("
        " step s1: true => t = t + x;)"
    ).to_df()
    got = sorted((r.ts, r.t, r.match_id) for r in out.collect())
    assert got == [(1, 10, 0), (2, 30, 0), (3, 60, 0), (4, 100, 0)]


def test_hold_at_final_with_vars_and_residual(spark):
    """Hold-at-final composes with declared vars and a var residual on
    the final step: held rows re-check the residual against the
    sequence's own t0; failing rows are skipped WITHOUT ending the
    hold, and a later passing row still extends."""
    from meerkat_spark.engine import MeerkatEngine

    df = spark.createDataFrame(
        [(1, "login"), (5, "buy"), (100, "buy"), (8, "buy")],
        "ts long, ev string",
    )
    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    eng.catalog._cache["t"] = df
    out = eng.kql(
        "t | sort by ts asc | scan declare (t0: long) with ("
        ' step a: ev == "login" => t0 = ts;'
        ' step b: ev == "buy" and ts - t0 < 50;)'
    ).to_df()
    got = sorted((r.ts, r.match_id, r.step_index) for r in out.collect())
    # buy@5 completes (holds); buy@8 extends (7 < 50); buy@100 fails
    # the residual -> skipped, hold stays alive (no rows after)
    assert got == [(1, 0, 0), (5, 0, 1), (8, 0, 1)]


def test_concurrent_hold_at_final_replaced_by_promotion(spark):
    """Concurrent mode: a held final-step match extends on accepting
    records until a NEWER promotion to the final step replaces it
    (newest-wins); the replaced match finalizes with its held rows."""
    rows = [
        ("a", 1, "login"),   # m0 starts
        ("a", 2, "buy"),     # m0 completes, holds at final
        ("a", 3, "login"),   # m1 starts concurrently
        ("a", 4, "buy"),     # promotes m1 -> final (replaces m0's hold)
        ("a", 5, "buy"),     # extends m1's hold
    ]
    df = spark.createDataFrame(rows, "user string, ts long, ev string")
    out = scan_steps(
        df,
        steps=[F.col("ev") == "login", F.col("ev") == "buy"],
        order_by=["ts"],
        partition_by=["user"],
        concurrent=True,
    )
    got = sorted((r.ts, r.match_id, r.step_index) for r in out.collect())
    # buy@4: promote beats hold, so it belongs to m1, ending m0
    assert got == [
        (1, 0, 0), (2, 0, 1),
        (3, 1, 0), (4, 1, 1), (5, 1, 1),
    ]


def test_bounded_partials_hold_eviction_emits(spark):
    """Bounded-partials hold-at-final (partials=2): a final-step record
    extends EVERY held completed match AND completes the promoted one
    (Kusto's state tables — one record can join several sequences); a
    THIRD completion overflows the bound and evicts the oldest held
    match, which must emit at eviction with its held rows. With
    partials=1 the single-partial machine applies instead, where
    promote replaces the hold (newest-wins, pinned by
    test_concurrent_hold_at_final_replaced_by_promotion)."""
    df = spark.createDataFrame(
        [("u", 1, "a"), ("u", 2, "b"), ("u", 3, "a"), ("u", 4, "b"),
         ("u", 5, "a"), ("u", 6, "b")],
        "user string, ts long, ev string",
    )
    out = scan_steps(
        df,
        steps=[F.col("ev") == "a", F.col("ev") == "b"],
        order_by=["ts"],
        partition_by=["user"],
        concurrent=True,
        concurrent_partials=2,
    )
    got = sorted((r.ts, r.match_id, r.step_index) for r in out.collect())
    assert got == [
        # match 0 = a1; b2 + held b4, b6 (emitted at eviction by m2)
        (1, 0, 0), (2, 0, 1),
        # match 1 = a3; b4 + held b6
        (3, 1, 0), (4, 0, 1), (4, 1, 1),
        (5, 2, 0),  # match 2 = a5; b6
        (6, 0, 1), (6, 1, 1), (6, 2, 1),
    ]
