"""PII redaction for training-data pipelines: regex scrubbing of
emails, IPv4 addresses, phone numbers, and SSN-like identifiers.

Scale shape: pure `regexp_replace` / `regexp_count` Column chains —
whole-stage codegen, row-local, shuffle-free; the cost is one linear
regex pass per pattern per row, nothing keyed, nothing quadratic, so
the op is embarrassingly parallel at 100 TB.

Patterns are restricted to the syntax subset where Java regex (Spark)
and RE2 (DuckDB) agree — no lookaround, no backreferences — so the
DuckDB oracle twin is exact (parity checked in tests/test_pii.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: emails first (they contain dots and digits that the later
# patterns could clip), then IPs, phones, SSNs (3-2-4 vs phone 3-3-4
# digit groups — disjoint).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "phone": (r"\(?\b\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
}


def redact_pii(text: Column, kinds: list[str] | None = None) -> Column:
    """`text` with every PII match replaced by its `<KIND>` token."""
    out = text
    for kind in kinds or PII_PATTERNS:
        pat, repl = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column, kinds: list[str] | None = None) -> list[Column]:
    """One `n_<kind>` bigint column per pattern (match counts)."""
    return [
        F.regexp_count(text, F.lit(PII_PATTERNS[k][0])).alias(f"n_{k}")
        for k in (kinds or PII_PATTERNS)
    ]


def redact(
    df: DataFrame,
    text_col: str = "text",
    kinds: list[str] | None = None,
    with_counts: bool = False,
) -> DataFrame:
    """All input columns with `text_col` scrubbed; optionally appends
    per-kind match-count columns (counted before redaction)."""
    cols = [c for c in df.columns]
    out = df
    if with_counts:
        out = out.select(*cols, *pii_counts(F.col(text_col), kinds))
    return out.withColumn(text_col, redact_pii(F.col(text_col), kinds))
