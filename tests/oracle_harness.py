"""Local replica of the driver's Spark-vs-DuckDB comparison: row count,
schema compatibility, and order-insensitive value comparison (exact for
ints/strings/timestamps, small-epsilon for floats)."""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from meerkat_spark.catalog import TABLES


def register_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    import os

    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def _norm_cell(v: Any) -> Any:
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            # NULL doubles surface as NaN via toPandas/duckdb.df alike
            return None
        # canonicalize to 9 significant digits so engine-level fp noise
        # below the comparison threshold doesn't flip sort order
        return float(f"{v:.9g}")
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None) if v.tzinfo else v
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = df[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in out.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> list[str]:
    """Returns a list of problems; empty list = match."""
    problems: list[str] = []
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).df()
    if len(s_pdf) != len(d_pdf):
        problems.append(f"{name}: row count spark={len(s_pdf)} duckdb={len(d_pdf)}")
        return problems
    s_cols, d_cols = sorted(s_pdf.columns), sorted(d_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"{name}: columns spark={s_cols} duckdb={d_cols}")
        return problems
    # Dtype strictness: the driver hashes stringified values, so an int
    # column on one side vs float on the other ("123" vs "123.0") is a hard
    # driver failure even when values are numerically equal.  DuckDB silently
    # promotes HUGEINT (e.g. uncast SUM ... OVER) to float64 through .df();
    # catch that here so local green predicts driver green.  int-with-nulls
    # becomes float64 on BOTH sides identically, so only flag columns where
    # neither side has nulls (a null-free int vs float pairing is always the
    # HUGEINT/uncast class, never the null-coercion class).
    for c in s_cols:
        sk, dk = s_pdf[c].dtype.kind, d_pdf[c].dtype.kind
        int_kinds = ("i", "u")
        if ((sk in int_kinds and dk == "f") or (dk in int_kinds and sk == "f")) and not (
            s_pdf[c].isna().any() or d_pdf[c].isna().any()
        ):
            problems.append(
                f"{name}: dtype mismatch col {c!r} spark={s_pdf[c].dtype} "
                f"duckdb={d_pdf[c].dtype} (int vs float hashes differently "
                f"on the driver — add an explicit CAST)"
            )
    if problems:
        return problems
    s_rows, d_rows = normalize(s_pdf), normalize(d_pdf)
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if not _rows_equal(a, b):
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"{name}: row {i} spark={a!r} duckdb={b!r}")
    if n_bad > 3:
        problems.append(f"{name}: … {n_bad} mismatched rows total of {len(s_rows)}")
    return problems


def _rows_equal(a: tuple, b: tuple) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x is None and y is None:
            continue
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif isinstance(x, float) or isinstance(y, float):
            try:
                if not math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9):
                    return False
            except (TypeError, ValueError):
                return False
        else:
            if x != y:
                return False
    return True
