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


# Unambiguous click/campaign trackers only (r14, ADVICE r13): the
# generic `ref` param is often SEMANTIC (?ref=<branch> on code hosts,
# ?ref=<listing-id> on marketplaces) — stripping it would collapse
# genuinely distinct pages and dedup_by_url would silently drop
# non-duplicates. Callers who know their corpus can widen the set via
# `strip_params`. Entries are regex alternates matched against the
# full param name (anchored `name=`).
DEFAULT_TRACKING_PARAMS: tuple[str, ...] = (
    "utm_[a-z]+",
    "fbclid",
    "gclid",
    "msclkid",
    "dclid",
    "igshid",
    "mc_eid",
    "ref_src",
)


def _tracking_param_re(strip_params) -> str:
    return r"^(?i)(" + "|".join(strip_params) + r")="


def canonical_url(url, strip_params=DEFAULT_TRACKING_PARAMS) -> Column:
    """Canonical form of a URL for exact URL-level dedup — the standard
    first pass of a crawl pipeline (one crawl sees the same page as
    http/https, with/without www, with tracking params, reordered
    query strings, fragments, trailing slashes). Entirely JVM
    built-ins (regex + array ops, whole-stage codegen; no UDF):

      1. strip the fragment ('#...');
      2. drop the scheme (http == https for identity) and a leading
         'www.';
      3. lowercase the HOST only (paths are case-sensitive);
      4. drop tracking query params (`strip_params`, default the
         unambiguous set DEFAULT_TRACKING_PARAMS — utm_*, fbclid,
         gclid, ...), sort the survivors (param order is not
         identity), drop an empty '?';
      5. strip one trailing '/' from the path.

    Deterministic and engine-replayable: the DuckDB oracle reproduces
    every step with its own string/list functions."""
    strip_re = _tracking_param_re(strip_params)
    c = url if isinstance(url, Column) else F.col(url)
    no_frag = F.regexp_replace(c, r"#.*$", "")
    rest = F.regexp_replace(no_frag, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"^(?i)www\.", "")
    host = F.substring_index(rest, "/", 1)
    # host may itself carry a '?query' when there is no path
    host_only = F.substring_index(host, "?", 1)
    tail = F.substring(rest, F.length(host_only) + 1, F.lit(1 << 30))
    path = F.substring_index(tail, "?", 1)
    query = F.when(
        F.instr(tail, "?") > 0,
        F.substring(
            tail, F.instr(tail, "?") + 1, F.lit(1 << 30)
        ),
    ).otherwise(F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(strip_re),
        )
    )
    norm_q = F.array_join(kept, "&")
    norm_path = F.regexp_replace(path, r"/$", "")
    return F.concat(
        F.lower(host_only),
        norm_path,
        F.when(norm_q != "", F.concat(F.lit("?"), norm_q)).otherwise(
            F.lit("")
        ),
    )


def dedup_by_url(
    df: DataFrame,
    url_col: str,
    id_col: str,
    strip_params=DEFAULT_TRACKING_PARAMS,
) -> DataFrame:
    """Exact URL-level dedup: keep the smallest-id row per canonical
    URL. ONE keyed window on the canonical key (single shuffle, single
    corpus pass — the same shape as the exact text dedup keeper), not
    an aggregate-then-rejoin, which would scan the corpus twice.
    `strip_params` forwards to canonical_url for corpora where extra
    params are known-nonsemantic."""
    from pyspark.sql import Window as W

    canon = df.withColumn("__curl", canonical_url(url_col, strip_params))
    w = W.partitionBy("__curl").orderBy(F.col(id_col).asc())
    return (
        canon.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__curl")
    )
