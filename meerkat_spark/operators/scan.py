"""KQL `scan` (sequence matching over ordered rows): detect runs of
rows where step predicates fire in order — funnels, process mining,
session forensics. Kusto semantics implemented: a sequence starts at a
row satisfying step 1, each later row either advances to the next step,
re-matches (extends) the current step — Kusto's step hold — or is
skipped. The FINAL step HOLDs exactly like Kusto (r16): after a
sequence reaches the last step, later rows matching the last step's
predicate keep extending the match (so the single-step cumulative-sum
idiom `scan declare (t:long=0) with (step s1: true => t = t + x;)`
yields a running total, one match over the whole stream); in the
default greedy mode the held match ends only when a row starts a NEW
sequence (matches step 1 but not the held final step) or the partition
ends (greedy, non-overlapping — the single-active-sequence subset of
Kusto's scan, which tracks one partial match per step). Per-step
`output` modes mirror Kusto ('all' | 'last' | 'none'), and `declare`d
variables with per-step assignments carry state across the sequence
(e.g. t0 = first step's timestamp ⇒ funnel latency on the last row).

Scale shape: step predicates AND assignment values are evaluated
JVM-side as ordinary columns BEFORE the sequential pass — codegen,
pushdown-friendly; the Python state machine only sees packed booleans
plus precomputed assignment values, and merely snapshots them per
matched row. Declared variables MAY appear inside step predicates
(full Kusto parity): such predicates are split by the caller into a
var-free conjunct (still precomputed JVM-side — the cheap gate) and a
var-dependent residual passed as `step_py_preds[k]`, evaluated
per-CANDIDATE-row inside the machine against the candidate sequence's
current variable values. The residual only runs on rows that already
passed the JVM gate, and the machine is an inherently-sequential
per-row loop regardless, so this adds no new asymptotic cost. The
sequential pass runs per `partition_by` group via applyInPandas (one
shuffle on the key). Sequence matching is inherently ordered; without
partition keys the scan degrades to a single sequential partition —
callers at corpus scale MUST partition (per user, per session, per
device), matching how Kusto scans are written in practice.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scan_steps(
    df: DataFrame,
    steps: list[Column],
    order_by: list[str],
    partition_by: list[str] | None = None,
    match_id_col: str = "match_id",
    step_output: list[str] | None = None,
    declare: dict[str, str] | None = None,
    declare_init: dict[str, object] | None = None,
    step_assign: list[dict[str, Column]] | None = None,
    concurrent: bool = False,
    step_py_preds: list | None = None,
    step_py_assigns: list | None = None,
    concurrent_partials: int = 1,
    max_unpartitioned_rows: int = 5_000_000,
) -> DataFrame:
    """Rows participating in completed step sequences, with
    (`match_id_col`, `step_index`) appended. A row advances the machine
    when it satisfies the NEXT step's predicate; otherwise, if it
    satisfies the CURRENT step's predicate, it extends that step's run
    (hold); otherwise it is skipped. A sequence that reaches the FINAL
    step HOLDs there (Kusto r16 semantics): later rows matching the
    final step's predicate extend the match; in greedy mode the match
    finalizes when a row starts a new sequence (satisfies step 1 but
    not the held final step) or the partition ends. Incomplete
    sequences at end-of-partition emit nothing; a held final-step
    sequence IS complete and emits. match_id numbers completed matches
    per partition group from 0.

    `step_output[i]` ∈ {'all','last','none'} controls which of step i's
    run rows are emitted (default 'all'). `declare` maps variable name →
    Spark type string; `step_assign[i]` maps variable → Column evaluated
    on each row that matches step i (advance or hold) — emitted rows
    carry each variable's value as of their own match, null before first
    assignment. `declare_init` maps variable → python literal: Kusto's
    `scan declare (k:long = 0)` defaults (r15) — each sequence's
    variables start at the default instead of null.

    `step_py_assigns[i]`, when given, maps variable → callable
    `(row: dict, vars: dict) -> value`: the var-REFERENCING assignments
    of step i (`total = total + value`, Kusto's accumulator form —
    r15). They cannot precompute JVM-side (declared variables are not
    columns), so they evaluate inside the machine against the
    sequence's variables as of BEFORE the row (all assignments in a
    step read the same pre-row snapshot), after the step's precomputed
    JVM assignments apply. Their presence forces the per-group python
    machine (same cost class as step_py_preds).

    `concurrent=True` lifts the greedy single-active-sequence subset to
    Kusto's concurrent model: ONE partial match may be active PER STEP
    (not one overall). Steps evaluate backwards per record (Kusto's
    rule, so one match never advances twice on one record); a record
    matching step k PROMOTES the step k-1 match to step k (moving it),
    else HOLDs an existing step-k match; a record matching step 1 while
    later steps hold other matches starts a new concurrent sequence. A
    promotion replaces any older match already at that step
    (newest-wins — the one-match-per-step simplification of Kusto's
    full state tables, which accumulate every partial match and can go
    quadratic on pathological inputs).

    `concurrent_partials` (with concurrent=True) lifts the
    one-match-per-step simplification: each step's state holds up to
    that many partial matches. A record then HOLDs every accepting
    partial at its step, PROMOTEs every accepting partial from the
    previous step (one record can advance several overlapping
    sequences — Kusto's full state tables behave this way on
    overlapping funnels), and a step-1 record additionally STARTS a
    new partial. Oldest partials evict beyond the bound, keeping state
    O(steps × bound) — the unbounded model can go quadratic on
    pathological inputs, which is exactly why the bound exists.
    Default 1 preserves the newest-wins subset bit-for-bit.

    `step_py_preds[k]`, when given, is `None` or a callable
    `(row: dict, vars: dict) -> bool` — the var-dependent residual of
    step k's predicate. A row matches step k only when BOTH the
    precomputed `steps[k]` flag is true AND the residual accepts the
    row under the CANDIDATE sequence's current variable values (the
    values before this row's own assignments). In concurrent mode the
    residual is evaluated per candidate state: promote is checked
    against the step-(k-1) match's variables, hold against the step-k
    match's variables — the same record can therefore fail a promote
    but still hold, exactly as variable-conditioned Kusto scans do."""
    n_steps = len(steps)
    if n_steps == 0:
        raise ValueError("scan needs at least one step")
    outs = list(step_output or ["all"] * n_steps)
    if len(outs) != n_steps or any(o not in ("all", "last", "none") for o in outs):
        raise ValueError("step_output must be one of all/last/none per step")
    decl = dict(declare or {})
    assigns = list(step_assign or [{} for _ in range(n_steps)])
    if len(assigns) != n_steps:
        raise ValueError("step_assign needs one (possibly empty) dict per step")
    bad = {v for a in assigns for v in a} - set(decl)
    if bad:
        raise ValueError(f"assignments to undeclared variables: {sorted(bad)}")
    clash = set(decl) & set(df.columns)
    if clash:
        raise ValueError(f"declared variables collide with columns: {sorted(clash)}")

    keys = list(partition_by or [])
    flag_cols = [f"__step{i}" for i in range(n_steps)]
    assign_cols: dict[tuple[int, str], str] = {
        (s, v): f"__as{s}__{v}" for s, a in enumerate(assigns) for v in a
    }
    work = df.select(
        "*",
        F.lit(0).alias("__grp"),
        *[s.cast("boolean").alias(c) for c, s in zip(flag_cols, steps)],
        *[
            assigns[s][v].cast(decl[v]).alias(name)
            for (s, v), name in assign_cols.items()
        ],
    )
    group_keys = keys or ["__grp"]

    helper = set(flag_cols) | set(assign_cols.values())
    out_fields = [f for f in work.schema.fields if f.name not in helper]
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
        + "".join(f", `{v}` {t}" for v, t in decl.items())
        + f", `{match_id_col}` long, `step_index` long"
    )
    order_cols = list(order_by)
    data_cols = [f.name for f in out_fields]
    var_names = list(decl)
    bad_init = set(declare_init or {}) - set(decl)
    if bad_init:
        raise ValueError(f"defaults for undeclared variables: {sorted(bad_init)}")
    # sequence-start variable values: the declared default, else null.
    # Plain python literals — this dict pickles into the workers.
    init_vals = {v: (declare_init or {}).get(v) for v in var_names}
    # the machine must close over NAMES only — Column objects hold JVM
    # references and don't pickle into the worker
    step_var_names = [list(a) for a in assigns]
    py_preds = list(step_py_preds or [None] * n_steps)
    if len(py_preds) != n_steps:
        raise ValueError("step_py_preds needs one entry (or None) per step")
    py_assigns = list(step_py_assigns or [{} for _ in range(n_steps)])
    if len(py_assigns) != n_steps:
        raise ValueError("step_py_assigns needs one dict (possibly empty) per step")
    bad_pa = {v for a in py_assigns for v in a} - set(decl)
    if bad_pa:
        raise ValueError(f"python assignments to undeclared variables: {sorted(bad_pa)}")
    has_py = any(p is not None for p in py_preds) or any(
        a for a in py_assigns
    )

    unpartitioned = not keys
    if unpartitioned:
        import warnings

        warnings.warn(
            "scan_steps called without partition_by: the sequential state "
            "machine degrades to ONE partition (no parallelism, all rows "
            "on one worker). Partition per user/session/device as Kusto "
            "scans are written in practice; groups above "
            f"{max_unpartitioned_rows:,} rows raise.",
            stacklevel=2,
        )

    def _greedy_fast_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        """Vectorized greedy matcher over a WHOLE hash partition (many
        groups at once — no python residuals, not concurrent: the
        common case). The machine's matches are fully determined by
        "first flag-k row after a position", so walk per MATCH with
        numpy searchsorted over per-step flag-index arrays instead of
        per ROW in Python; step-s run rows are exactly the flag-s rows
        in [adv_s, adv_{s+1}) (no such row can carry flag s+1, else it
        would BE adv_{s+1}), and the FINAL step's run holds through
        [adv_last, stop) where stop is the first later row that starts
        a NEW sequence (matches step 1 but not the final step — Kusto
        hold-at-final, r16). One lexsort orders the partition by
        (group codes, order_by); group boundaries come from factorized
        key codes — per-group pandas fixed costs (sort_values, frame
        getitem, Arrow exchange per group) were the measured bottleneck
        when applyInPandas fed thousands of small groups."""
        import numpy as np

        n = len(pdf)
        lex_keys = []
        for c in reversed(order_cols):
            a = pdf[c].to_numpy()
            if a.dtype == object:
                a = a.astype(str)
            lex_keys.append(a)
        codes_list = [
            pd.factorize(pdf[c], use_na_sentinel=False)[0] for c in group_keys
        ]
        for codes in reversed(codes_list):
            lex_keys.append(codes)
        order = np.lexsort(tuple(lex_keys))
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for codes in codes_list:
            cs = codes[order]
            change[1:] |= cs[1:] != cs[:-1]
        gstarts = np.flatnonzero(change)
        gends = np.append(gstarts[1:], n)
        fl = np.empty((n, n_steps), dtype=bool)
        for j, c in enumerate(flag_cols):
            a = pdf[c].to_numpy()
            if a.dtype != bool:
                a = pdf[c].fillna(False).to_numpy(dtype=bool)
            fl[:, j] = a
        flags = fl[order]
        step_idx = [np.flatnonzero(flags[:, k]) for k in range(n_steps)]
        # rows that can START a new sequence while one holds at the
        # final step: match step 1 but NOT the final step (hold wins
        # on rows matching both). For 1-step scans this is empty — the
        # whole group's flag rows form one held match.
        start_idx = np.flatnonzero(flags[:, 0] & ~flags[:, n_steps - 1])
        rows_parts: list[np.ndarray] = []
        steps_parts: list[np.ndarray] = []
        mids_parts: list[np.ndarray] = []
        gmid_parts: list[np.ndarray] = []
        emit_parts: list[np.ndarray] = []
        gmid = 0  # global running match id (snapshot reset detection)
        for g0, g1 in zip(gstarts, gends):
            if unpartitioned and (g1 - g0) > max_unpartitioned_rows:
                raise ValueError(
                    f"scan_steps without partition_by on {g1 - g0:,} rows "
                    f"(limit {max_unpartitioned_rows:,}): the single "
                    "sequential partition would serialize the whole input "
                    "through one worker. Pass partition_by=... (per user/"
                    "session/device) or raise max_unpartitioned_rows."
                )
            p = int(g0)
            mid = 0  # per-group match id (output contract)
            while True:
                adv: list[int] = []
                nxt = p
                ok = True
                for k in range(n_steps):
                    arr = step_idx[k]
                    pos = np.searchsorted(arr, nxt)
                    if pos == len(arr) or arr[pos] >= g1:
                        ok = False
                        break
                    a = int(arr[pos])
                    adv.append(a)
                    nxt = a + 1
                if not ok:
                    break
                # final-step hold: the match extends until the first
                # row that starts a new sequence, or group end
                spos = np.searchsorted(start_idx, adv[-1] + 1)
                stop = int(g1)
                if spos < len(start_idx) and start_idx[spos] < g1:
                    stop = int(start_idx[spos])
                for s in range(n_steps):
                    arr = step_idx[s]
                    lo = adv[s]
                    hi = adv[s + 1] if s + 1 < n_steps else stop
                    run = arr[np.searchsorted(arr, lo) : np.searchsorted(arr, hi)]
                    rows_parts.append(run)
                    steps_parts.append(np.full(len(run), s, dtype=np.int64))
                    mids_parts.append(np.full(len(run), mid, dtype=np.int64))
                    gmid_parts.append(np.full(len(run), gmid, dtype=np.int64))
                    if outs[s] == "all":
                        em = np.ones(len(run), dtype=bool)
                    else:
                        em = np.zeros(len(run), dtype=bool)
                        if outs[s] == "last":
                            em[-1] = True
                    emit_parts.append(em)
                p = stop
                mid += 1
                gmid += 1
                if stop >= g1:
                    break
        if rows_parts:
            midx = np.concatenate(rows_parts)
            msteps = np.concatenate(steps_parts)
            mmids = np.concatenate(mids_parts)
            mgmids = np.concatenate(gmid_parts)
            emits = np.concatenate(emit_parts)
        else:
            midx = msteps = mmids = mgmids = np.zeros(0, dtype=np.int64)
            emits = np.zeros(0, dtype=bool)
        snaps: list[dict] = []
        if var_names and len(midx):
            # snapshots over MATCHED rows only (holds assign even when
            # their output mode is 'none'); loop bounded by matched
            # rows, not input rows. Assign arrays indexed in ORIGINAL
            # row space via order[...]; dtype=object so datetime64
            # cells surface as pd.Timestamp (Arrow-convertible).
            acols = {
                (s, v): pdf[assign_cols[(s, v)]].to_numpy(dtype=object)
                for (s, v) in assign_cols
            }
            cur = dict(init_vals)
            prev = -1
            for i in range(len(midx)):
                if mgmids[i] != prev:
                    cur = dict(init_vals)
                    prev = mgmids[i]
                sv = step_var_names[int(msteps[i])]
                if sv:
                    cur = dict(cur)
                    for v in sv:
                        cur[v] = acols[(int(msteps[i]), v)][order[midx[i]]]
                snaps.append(cur)
        sel = order[midx[emits]]
        out = pdf.iloc[sel][data_cols].copy()
        for v in var_names:
            out[v] = pd.Series(
                [snaps[i][v] for i in np.flatnonzero(emits)],
                index=out.index,
                dtype=object,
            )
        out[match_id_col] = pd.Series(mmids[emits], index=out.index, dtype="int64")
        out["step_index"] = pd.Series(msteps[emits], index=out.index, dtype="int64")
        return out

    def fast_mapper(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        if not len(pdf):
            return
        yield _greedy_fast_partition(pdf)

    def machine(pdf: pd.DataFrame) -> pd.DataFrame:
        if unpartitioned and len(pdf) > max_unpartitioned_rows:
            raise ValueError(
                f"scan_steps without partition_by on {len(pdf):,} rows "
                f"(limit {max_unpartitioned_rows:,}): the single sequential "
                "partition would serialize the whole input through one "
                "worker. Pass partition_by=... (per user/session/device) "
                "or raise max_unpartitioned_rows explicitly."
            )
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        flags = pdf[flag_cols].fillna(False).to_numpy(dtype=bool)
        rows = pdf.to_dict("records") if has_py else None

        def pyok(k: int, i: int, var_vals: dict) -> bool:
            p = py_preds[k]
            return True if p is None else bool(p(rows[i], var_vals))

        def apply_assigns(s: int, i: int, var_vals: dict) -> dict:
            step_vars = step_var_names[s]
            pa = py_assigns[s]
            if step_vars or pa:
                pre = var_vals  # all assignments read the pre-row snapshot
                var_vals = dict(var_vals)
                for v in step_vars:
                    var_vals[v] = pdf.at[i, assign_cols[(s, v)]]
                for v, fn in pa.items():
                    var_vals[v] = fn(rows[i], pre)
            return var_vals

        keep_rows: list[int] = []
        keep_mid: list[int] = []
        keep_step: list[int] = []
        keep_vars: list[dict] = []

        def emit(runs: list[list[tuple[int, dict]]], match_id: int) -> None:
            for s, run in enumerate(runs):
                picked = (
                    run if outs[s] == "all" else run[-1:] if outs[s] == "last" else []
                )
                for row_idx, snap in picked:
                    keep_rows.append(row_idx)
                    keep_mid.append(match_id)
                    keep_step.append(s)
                    keep_vars.append(snap)

        if concurrent and concurrent_partials > 1:
            # bounded state tables: up to `concurrent_partials` partial
            # matches PER STEP. Backwards step evaluation per record;
            # a record promotes every accepting previous-step partial,
            # holds every accepting same-step partial — including
            # COMPLETED matches holding at the final step (Kusto
            # hold-at-final, r16; final-table entries carry their
            # assigned match id) — and (step 1) starts a new partial;
            # oldest evict beyond the bound. An evicted held-final
            # match is complete and emits at eviction; survivors emit
            # at end of partition.
            last = n_steps - 1
            tables: list[list] = [[] for _ in range(n_steps)]
            match_id = 0
            for i in range(len(pdf)):
                for k in range(n_steps - 1, -1, -1):
                    if not flags[i, k]:
                        continue
                    if k > 0:
                        promoted = []
                        kept = []
                        for runs, vv in tables[k - 1]:
                            if pyok(k, i, vv):
                                vv2 = apply_assigns(k, i, vv)
                                promoted.append((runs + [[(i, vv2)]], vv2))
                            else:
                                kept.append((runs, vv))
                        tables[k - 1] = kept
                        if k == last:
                            for j, (runs, vv, mid) in enumerate(tables[k]):
                                if pyok(k, i, vv):
                                    vv2 = apply_assigns(k, i, vv)
                                    runs[k].append((i, vv2))
                                    tables[k][j] = (runs, vv2, mid)
                            for runs, vv in promoted:
                                tables[k].append((runs, vv, match_id))
                                match_id += 1
                            for runs, _vv, mid in tables[k][:-concurrent_partials]:
                                emit(runs, mid)
                        else:
                            for j, (runs, vv) in enumerate(tables[k]):
                                if pyok(k, i, vv):
                                    vv2 = apply_assigns(k, i, vv)
                                    runs[k].append((i, vv2))
                                    tables[k][j] = (runs, vv2)
                            tables[k].extend(promoted)
                        del tables[k][:-concurrent_partials]
                    else:
                        fresh = dict(init_vals)
                        if n_steps == 1:
                            # the single step IS the final step: ONE
                            # held match per partition, extended by
                            # every accepting record (hold-at-final)
                            if tables[0] and pyok(0, i, tables[0][0][1]):
                                runs, vv, mid = tables[0][0]
                                vv = apply_assigns(0, i, vv)
                                runs[0].append((i, vv))
                                tables[0][0] = (runs, vv, mid)
                            elif not tables[0] and pyok(0, i, fresh):
                                vv = apply_assigns(0, i, fresh)
                                tables[0] = [([[(i, vv)]], vv, match_id)]
                                match_id += 1
                            continue
                        # bounded mode: a step-1 record STARTS its own
                        # partial (no hold into existing ones — holding
                        # would overwrite their variable snapshots and
                        # collapse distinguishable overlapping
                        # sequences, the exact case this mode exists
                        # for); same-step extension applies from step 2
                        # up, where the variable residual guards it
                        if pyok(0, i, fresh):
                            vv = apply_assigns(0, i, fresh)
                            tables[0].append(([[(i, vv)]], vv))
                        del tables[0][:-concurrent_partials]
            # end of partition: held final-step matches are complete
            for runs, _vv, mid in tables[last]:
                emit(runs, mid)
            out = pdf.iloc[keep_rows][data_cols].copy()
            for v in var_names:
                out[v] = pd.Series(
                    [snap[v] for snap in keep_vars], index=out.index, dtype=object
                )
            out[match_id_col] = pd.Series(keep_mid, index=out.index, dtype="int64")
            out["step_index"] = pd.Series(keep_step, index=out.index, dtype="int64")
            return out

        if concurrent:
            # one partial match per step: (runs, var_vals) or None.
            # `held` is the ONE completed match holding at the final
            # step (Kusto hold-at-final, r16): (runs, var_vals,
            # match_id). It extends on accepting final-step records,
            # finalizes (emits) when a newer promotion replaces it
            # (newest-wins) or the partition ends.
            last = n_steps - 1
            states: list[tuple[list, dict] | None] = [None] * n_steps
            held: tuple[list, dict, int] | None = None
            match_id = 0
            for i in range(len(pdf)):
                for k in range(n_steps - 1, -1, -1):
                    if not flags[i, k]:
                        continue
                    if k == 0:
                        fresh = dict(init_vals)
                        if n_steps == 1:
                            # the single step IS the final step: one
                            # held match extends across all accepting
                            # records (hold-at-final)
                            if held is not None and pyok(0, i, held[1]):
                                runs, vv, mid = held
                                vv = apply_assigns(0, i, vv)
                                runs[0].append((i, vv))
                                held = (runs, vv, mid)
                            elif held is None and pyok(0, i, fresh):
                                vv = apply_assigns(0, i, fresh)
                                held = ([[(i, vv)]], vv, match_id)
                                match_id += 1
                        elif states[0] is not None and pyok(0, i, states[0][1]):
                            runs, vv = states[0]  # hold at step 1
                            vv = apply_assigns(0, i, vv)
                            runs[0].append((i, vv))
                            states[0] = (runs, vv)
                        elif states[0] is None and pyok(0, i, fresh):
                            # start a new concurrent sequence
                            vv = apply_assigns(0, i, fresh)
                            states[0] = ([[(i, vv)]], vv)
                    elif states[k - 1] is not None and pyok(k, i, states[k - 1][1]):
                        runs, vv = states[k - 1]  # promote (move) k-1 → k
                        states[k - 1] = None
                        vv = apply_assigns(k, i, vv)
                        runs = runs + [[(i, vv)]]
                        if k == last:
                            # completed: holds at the final step; the
                            # previous held match is replaced
                            # (newest-wins) and finalizes now
                            if held is not None:
                                emit(held[0], held[2])
                            held = (runs, vv, match_id)
                            match_id += 1
                        else:
                            states[k] = (runs, vv)  # newest-wins at step k
                    elif k == last and held is not None and pyok(k, i, held[1]):
                        runs, vv, mid = held  # hold at the final step
                        vv = apply_assigns(k, i, vv)
                        runs[k].append((i, vv))
                        held = (runs, vv, mid)
                    elif k < last and states[k] is not None and pyok(k, i, states[k][1]):
                        runs, vv = states[k]  # hold at step k+1
                        vv = apply_assigns(k, i, vv)
                        runs[k].append((i, vv))
                        states[k] = (runs, vv)
            if held is not None:
                emit(held[0], held[2])  # held final-step match completes
            out = pdf.iloc[keep_rows][data_cols].copy()
            for v in var_names:
                out[v] = pd.Series(
                    [snap[v] for snap in keep_vars], index=out.index, dtype=object
                )
            out[match_id_col] = pd.Series(keep_mid, index=out.index, dtype="int64")
            out["step_index"] = pd.Series(keep_step, index=out.index, dtype="int64")
            return out

        state = 0  # step being sought; n_steps == held at the final step
        match_id = 0
        # per completed-so-far step: [(row_idx, var snapshot), ...]
        runs: list[list[tuple[int, dict]]] = []
        var_vals: dict = dict(init_vals)
        for i in range(len(pdf)):
            # advance beats hold (Kusto order); the python residual sees
            # the sequence's variables as of BEFORE this row. state ==
            # n_steps is the Kusto hold-at-final state (r16): the hold
            # branch keeps extending the final run; the match finalizes
            # only when a row STARTS a new sequence (third branch) or
            # the partition ends.
            if state < n_steps and flags[i, state] and pyok(state, i, var_vals):
                var_vals = apply_assigns(state, i, var_vals)
                runs.append([(i, var_vals)])
                state += 1
            elif (
                state > 0
                and flags[i, state - 1]
                and pyok(state - 1, i, var_vals)
            ):
                var_vals = apply_assigns(state - 1, i, var_vals)
                runs[state - 1].append((i, var_vals))  # hold: extend the run
            elif state == n_steps and flags[i, 0]:
                fresh = dict(init_vals)
                if pyok(0, i, fresh):
                    emit(runs, match_id)  # held match finalizes
                    match_id += 1
                    var_vals = apply_assigns(0, i, fresh)
                    runs = [[(i, var_vals)]]
                    state = 1
        if state == n_steps:
            emit(runs, match_id)  # a held final-step match IS complete
        out = pdf.iloc[keep_rows][data_cols].copy()
        for v in var_names:
            out[v] = pd.Series(
                [snap[v] for snap in keep_vars], index=out.index, dtype=object
            )
        out[match_id_col] = pd.Series(keep_mid, index=out.index, dtype="int64")
        out["step_index"] = pd.Series(keep_step, index=out.index, dtype="int64")
        return out

    if not has_py and not concurrent:
        # one hash shuffle on the keys, whole partitions through ONE
        # Arrow exchange each — groups are re-derived inside from
        # factorized key codes (same co-location guarantee as groupBy,
        # without per-group pandas/Arrow fixed costs)
        return (
            work.repartition(*group_keys)
            .mapInPandas(fast_mapper, schema=out_schema)
            .drop("__grp")
        )
    return (
        work.groupBy(*group_keys)
        .applyInPandas(machine, schema=out_schema)
        .drop("__grp")
    )
