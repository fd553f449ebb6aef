"""KQL `scan` (sequence matching over ordered rows): detect runs of
rows where step predicates fire in order — funnels, process mining,
session forensics. Kusto reference semantics: scan walks the
serialized row order, maintaining an active sequence that advances
through the declared steps; here we implement the common greedy
non-overlapping subset (one active sequence at a time, a completed
match emits its rows and resets the machine).

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
) -> DataFrame:
    """Rows participating in completed step sequences, with
    (`match_id_col`, `step_index`) appended. Greedy, non-overlapping:
    a sequence starts at a row satisfying steps[0] while no sequence is
    active, advances one step per qualifying row (a row may also
    re-satisfy the current step to stay, Kusto-style hold is NOT
    implemented — each row either advances the machine or is skipped),
    and completes at the last step; incomplete sequences at
    end-of-partition emit nothing. match_id numbers completed matches
    per partition group from 0."""
    n_steps = len(steps)
    if n_steps == 0:
        raise ValueError("scan needs at least one step")
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
        state = 0          # next step to satisfy
        match_id = 0
        active: list[int] = []
        keep_rows: list[int] = []
        keep_mid: list[int] = []
        keep_step: list[int] = []
        for i in range(len(pdf)):
            if flags[i, state]:
                active.append(i)
                state += 1
                if state == n_steps:
                    keep_rows.extend(active)
                    keep_mid.extend([match_id] * n_steps)
                    keep_step.extend(range(n_steps))
                    match_id += 1
                    state = 0
                    active = []
        out = pdf.iloc[keep_rows][data_cols].copy()
        out[match_id_col] = pd.Series(keep_mid, index=out.index, dtype="int64")
        out["step_index"] = pd.Series(keep_step, index=out.index, dtype="int64")
        return out

    return (
        work.groupBy(*group_keys)
        .applyInPandas(machine, schema=out_schema)
        .drop("__grp")
    )
