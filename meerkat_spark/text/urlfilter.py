"""URL / domain blocklist filtering — a standard pre-training corpus
gate (C4/RefinedWeb-style): drop documents whose URL's host matches a
blocklist entry either exactly or as a registrable-domain suffix
(blocking 'tracker.com' drops 'cdn.eu.tracker.com').

Scale shape (the part that matters at 100 TB): the blocklist is a
small dimension (10⁴–10⁶ rows) and each host has ≤ `max_levels`
meaningful suffixes, so the filter compiles to a CHAIN OF BROADCAST
LEFT-ANTI HASH JOINS — one per suffix depth, each an equi-join on a
precomputed suffix column. Every stage is map-side (no shuffle of the
fact table, no explode amplification of the corpus, no O(rows x
blocklist) broadcast-nested-loop that an `exists(...)` condition
would produce). Reference parity: the reference's storage layer has
no corpus gates; this extends the engine's LLM-pipeline suite
(SURVEY.md north-star extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme / userinfo stripped, host captured up to port/path/query
_HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)"


def url_host(url) -> Column:
    """Lowercased host part of a URL ('https://A.B.com:8080/x?q' →
    'a.b.com'); null when no host-shaped prefix exists. Pure JVM
    regex — codegen, pushdown-friendly."""
    c = url if isinstance(url, Column) else F.col(url)
    h = F.lower(F.regexp_extract(c, _HOST_RE, 1))
    return F.when(h != "", h)


def domain_suffix(host, levels: int) -> Column:
    """The last `levels` dot-labels of a host ('cdn.eu.tracker.com', 2
    → 'tracker.com'); null when the host has fewer labels (so a
    suffix-depth equi-join simply never matches)."""
    c = host if isinstance(host, Column) else F.col(host)
    parts = F.split(c, "\\.")
    n = F.size(parts)
    return F.when(
        n >= levels,
        F.array_join(F.slice(parts, n - levels + 1, levels), "."),
    )


def filter_blocked_urls(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    max_levels: int = 5,
) -> DataFrame:
    """Rows of `df` whose URL host matches NO blocklist entry — exact
    host or suffix at depths 2..max_levels. One broadcast left-anti
    hash join per depth (all map-side); blocklist domains are
    lowercased once on the build side."""
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(domain_col)).alias("__bl_domain")).distinct()
    )
    host = url_host(F.col(url_col))
    out = df.withColumn("__host", host)
    keys = [F.col("__host")] + [
        domain_suffix(F.col("__host"), d) for d in range(2, max_levels + 1)
    ]
    for i, k in enumerate(keys):
        out = out.withColumn(f"__sfx{i}", k)
        out = out.join(
            bl, on=out[f"__sfx{i}"] == bl["__bl_domain"], how="left_anti"
        )
    return out.drop("__host", *[f"__sfx{i}" for i in range(len(keys))])
