"""KQL `scan` (sequence matching over ordered rows): detect runs of
rows where step predicates fire in order — funnels, process mining,
session forensics. Kusto semantics implemented: a sequence starts at a
row satisfying step 1, each later row either advances to the next step,
re-matches (extends) the current step — Kusto's step hold — or is
skipped; the sequence completes at the last step and the machine
resets (greedy, non-overlapping — the single-active-sequence subset of
Kusto's scan, which can track concurrent partial matches). Per-step
`output` modes mirror Kusto: 'all' (every row of the step's run,
default), 'last' (the run's final row), 'none'.

Scale shape: step predicates are evaluated JVM-side as ordinary
boolean columns BEFORE the sequential pass — codegen, pushdown-
friendly, and the Python state machine only ever sees packed boolean
arrays. The sequential pass itself runs per `partition_by` group via
applyInPandas (one shuffle on the key). Sequence matching is
inherently ordered; without partition keys the scan degrades to a
single sequential partition — callers at corpus scale MUST partition
(per user, per session, per device), matching how Kusto scans are
written in practice.
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
) -> DataFrame:
    """Rows participating in completed step sequences, with
    (`match_id_col`, `step_index`) appended. A row advances the machine
    when it satisfies the NEXT step's predicate; otherwise, if it
    satisfies the CURRENT step's predicate, it extends that step's run
    (hold); otherwise it is skipped. Incomplete sequences at
    end-of-partition emit nothing. match_id numbers completed matches
    per partition group from 0. `step_output[i]` ∈ {'all','last','none'}
    controls which of step i's run rows are emitted (default 'all')."""
    n_steps = len(steps)
    if n_steps == 0:
        raise ValueError("scan needs at least one step")
    outs = list(step_output or ["all"] * n_steps)
    if len(outs) != n_steps or any(o not in ("all", "last", "none") for o in outs):
        raise ValueError("step_output must be one of all/last/none per step")
    keys = list(partition_by or [])
    flag_cols = [f"__step{i}" for i in range(n_steps)]
    work = df.select(
        "*",
        F.lit(0).alias("__grp"),
        *[s.cast("boolean").alias(c) for c, s in zip(flag_cols, steps)],
    )
    group_keys = keys or ["__grp"]

    out_fields = [f for f in work.schema.fields if f.name not in flag_cols]
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
        + f", `{match_id_col}` long, `step_index` long"
    )
    order_cols = list(order_by)
    data_cols = [f.name for f in out_fields]

    def machine(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        flags = pdf[flag_cols].fillna(False).to_numpy(dtype=bool)
        state = 0                        # next step to satisfy
        match_id = 0
        runs: list[list[int]] = []       # row indices per completed-so-far step
        keep_rows: list[int] = []
        keep_mid: list[int] = []
        keep_step: list[int] = []
        for i in range(len(pdf)):
            if flags[i, state]:          # advance beats hold (Kusto order)
                runs.append([i])
                state += 1
                if state == n_steps:
                    for s, run in enumerate(runs):
                        emit = (
                            run
                            if outs[s] == "all"
                            else run[-1:] if outs[s] == "last" else []
                        )
                        keep_rows.extend(emit)
                        keep_mid.extend([match_id] * len(emit))
                        keep_step.extend([s] * len(emit))
                    match_id += 1
                    state = 0
                    runs = []
            elif state > 0 and flags[i, state - 1]:
                runs[state - 1].append(i)   # hold: extend the current step
        out = pdf.iloc[keep_rows][data_cols].copy()
        out[match_id_col] = pd.Series(keep_mid, index=out.index, dtype="int64")
        out["step_index"] = pd.Series(keep_step, index=out.index, dtype="int64")
        return out

    return (
        work.groupBy(*group_keys)
        .applyInPandas(machine, schema=out_schema)
        .drop("__grp")
    )
