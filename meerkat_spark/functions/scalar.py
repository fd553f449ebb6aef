"""KQL scalar functions with KQL names and semantics, as Column builders.

Every function returns a `pyspark.sql.Column` built from JVM-side
built-ins (`pyspark.sql.functions`) so expressions stay inside
whole-stage codegen — no Python UDFs in the hot path.

KQL semantic deltas encoded here once (SURVEY.md §7.4.3):
- `substring` is 0-based (Spark's is 1-based) — translator adds 1.
- `indexof` returns -1 when absent and is 0-based (Spark `locate` is
  1-based, 0 when absent).
- failed casts yield null (Spark try_cast semantics).
- `bin()` floors numerics to a multiple of size and timestamps to a
  multiple of a duration.

The reference declares the KQL surface at README.md:34; the type set is
src/store/segment_metadata.rs:131-142.
"""

from __future__ import annotations

import pandas as pd  # Arrow-kernel signatures (ipv4_range_to_cidr_list)
from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else (F.col(x) if isinstance(x, str) else F.lit(x))


def _lit(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


# ---------------------------------------------------------------- binning
def bin_numeric(x, size) -> Column:
    """KQL bin(x, size) for numerics: floor(x/size)*size."""
    return F.floor(_c(x) / _lit(size)) * _lit(size)


def bin_datetime(ts, seconds: int) -> Column:
    """KQL bin(ts, timespan) — floor timestamp to a multiple of `seconds`.

    Uses integer arithmetic on epoch seconds (codegen-friendly; prunable
    when partitioned on a derived date column, SURVEY.md §4)."""
    e = F.unix_timestamp(_c(ts))
    return F.timestamp_seconds((F.floor(e / seconds) * seconds).cast("long"))


def bin_auto(x, size) -> Column:
    """bin() dispatch: numbers → numeric, else datetime with size=seconds."""
    if isinstance(size, (int, float)):
        return bin_numeric(x, size)
    raise ValueError("use bin_numeric/bin_datetime explicitly for Column sizes")


# ---------------------------------------------------------------- datetime
def ago(delta_expr: str) -> Column:
    """KQL ago(1h) → now() - interval."""
    return F.current_timestamp() - F.expr(f"INTERVAL {delta_expr}")


def now() -> Column:
    return F.current_timestamp()


def startofday(ts, offset: int = 0) -> Column:
    base = F.date_trunc("day", _c(ts))
    return base + F.expr(f"INTERVAL {int(offset)} DAY") if offset else base


def startofweek(ts, offset: int = 0) -> Column:
    """KQL weeks start on Sunday; Spark date_trunc('week') is Monday.
    Shift forward a day, truncate to Monday, shift back → Sunday-aligned.
    `offset` shifts by whole weeks (Kusto's optional second argument)."""
    day = F.expr("INTERVAL 1 DAY")
    base = F.date_trunc("week", _c(ts) + day) - day
    return base + F.expr(f"INTERVAL {7 * int(offset)} DAY") if offset else base


def startofmonth(ts, offset: int = 0) -> Column:
    base = F.date_trunc("month", _c(ts))
    if offset:
        base = F.add_months(base, int(offset)).cast("timestamp")
    return base


def startofyear(ts, offset: int = 0) -> Column:
    base = F.date_trunc("year", _c(ts))
    if offset:
        base = F.add_months(base, 12 * int(offset)).cast("timestamp")
    return base


def datetime_add(part: str, amount, ts) -> Column:
    """KQL datetime_add(period, amount, dt). `ts` is a column name or SQL
    expression string (timestampadd has no Column-API form here)."""
    part = part.strip("'\"")
    return F.expr(f"timestampadd({part}, {amount}, {ts})")


def datetime_diff(part: str, ts1, ts2) -> Column:
    """KQL datetime_diff(period, dt1, dt2) = dt1 - dt2 in period units.
    `ts1`/`ts2` are column names or SQL expression strings."""
    part = part.strip("'\"")
    return F.expr(f"timestampdiff({part}, {ts2}, {ts1})")


def todatetime(x) -> Column:
    """KQL todatetime — ISO forms via the native cast, plus the
    US-style M/d/yyyy[ H:m[:s]] layouts Kusto also accepts; null on
    misparse (never an error)."""
    c = _c(x)
    iso = c.try_cast("timestamp")
    us = F.coalesce(
        *[
            F.try_to_timestamp(c.cast("string"), F.lit(p))
            for p in ("M/d/yyyy H:m:s", "M/d/yyyy H:m", "M/d/yyyy")
        ]
    )
    return F.coalesce(iso, us)


def format_datetime(ts, fmt: str) -> Column:
    """KQL format_datetime — KQL tokens map to the JVM pattern letters
    used by date_format; the divergent ones are rewritten here:
    f/ff/fff (fractional seconds) → S/SS/SSS and tt (AM/PM) → a."""
    import re as _re

    jvm = _re.sub(
        "f+", lambda m: "S" * len(m.group(0)), fmt.replace("tt", "a")
    )
    # Kusto treats [ and ] as plain separators; the JVM formatter reads
    # them as optional-section markers — quote them to keep them literal
    jvm = jvm.replace("[", "'['").replace("]", "']'")
    return F.date_format(_c(ts), jvm)


def dayofweek_timespan(ts) -> Column:
    """KQL dayofweek returns a timespan of N days since Sunday; we surface
    the integer day count (0=Sunday) — documented delta."""
    return F.dayofweek(_c(ts)) - 1


def hourofday(ts) -> Column:
    return F.hour(_c(ts))


def week_of_year(ts) -> Column:
    return F.weekofyear(_c(ts))


def unixtime_seconds_todatetime(x) -> Column:
    return F.timestamp_seconds(_c(x))


def unixtime_milliseconds_todatetime(x) -> Column:
    return F.timestamp_millis(_c(x).cast("long"))


# ---------------------------------------------------------------- strings
def strlen(x) -> Column:
    return F.length(_c(x))


def substring(x, start, length=None) -> Column:
    """KQL substring is 0-based; Spark 1-based. A NEGATIVE requested
    index is treated as 0 (Kusto semantics — Spark's substr would
    index from the string end instead)."""
    c = _c(x)
    s1 = F.greatest(_lit(start).cast("int"), F.lit(0)) + 1
    if length is None:
        return c.substr(s1, F.length(c))
    return c.substr(s1, F.greatest(_lit(length).cast("int"), F.lit(0)))


def strcat(*parts) -> Column:
    """Kusto strcat IGNORES null arguments (strcat('a', null, 'b') →
    'ab') — concat_ws('') gives exactly that; Spark's concat would
    null the whole result."""
    return F.concat_ws(
        "",
        *[
            (_c(p) if isinstance(p, Column) else F.lit(p)).cast("string")
            for p in parts
        ],
    )


def strcat_delim(delim: str, *parts) -> Column:
    return F.concat_ws(delim, *[_c(p) if isinstance(p, Column) else F.lit(p) for p in parts])


def split(x, delim: str, index: int | None = None) -> Column:
    """KQL split returns dynamic array; optional requested index
    (0-based; out-of-range or negative → null, Kusto's contract).
    Kusto's delimiter is a LITERAL string while Spark's F.split takes a
    regex — escape it, or split('a|b', '|') explodes per character
    (caught by the r8 mv-expand fuzzer)."""
    import re

    arr = F.split(_c(x), F.lit(re.escape(delim)), -1)
    if index is not None:
        if index < 0:
            return F.lit(None).cast("string")
        return F.try_element_at(arr, F.lit(index + 1))
    return arr


def tolower(x) -> Column:
    return F.lower(_c(x))


def toupper(x) -> Column:
    return F.upper(_c(x))


def trim(regex: str, x) -> Column:
    """KQL trim(regex, x) trims a *regex* from both ends."""
    return F.regexp_replace(F.regexp_replace(_c(x), f"^({regex})+", ""), f"({regex})+$", "")


def trim_start(regex: str, x) -> Column:
    return F.regexp_replace(_c(x), f"^({regex})+", "")


def trim_end(regex: str, x) -> Column:
    return F.regexp_replace(_c(x), f"({regex})+$", "")


def replace_string(x, search: str, repl: str) -> Column:
    return F.replace(_c(x), F.lit(search), F.lit(repl))


def replace_regex(x, pattern: str, repl: str) -> Column:
    return F.regexp_replace(_c(x), pattern, repl)


def extract(pattern: str, group: int, x) -> Column:
    """KQL extract(regex, captureGroup, text); null if no match (Spark
    regexp_extract returns '' — map '' from no-match to null via when)."""
    e = F.regexp_extract(_c(x), pattern, group)
    return F.when(e == "", F.lit(None)).otherwise(e)


def extract_all(pattern: str, x) -> Column:
    """KQL extract_all — all matches of the regex. One capture group →
    array of strings; MULTIPLE groups → array of per-match arrays
    (Kusto's contract). Group count is read from the compiled pattern
    at plan time; per-group extractions zip back together row-side."""
    import re as _re

    n_groups = _re.compile(pattern).groups
    if n_groups == 0:
        # no capture group: the whole match
        return F.regexp_extract_all(_c(x), F.lit(pattern), 0)
    if n_groups == 1:
        return F.regexp_extract_all(_c(x), F.lit(pattern), 1)
    per_group = [
        F.regexp_extract_all(_c(x), F.lit(pattern), g)
        for g in range(1, n_groups + 1)
    ]
    zipped = F.arrays_zip(*per_group)
    return F.transform(
        zipped, lambda s: F.array(*[s[str(i)] for i in range(n_groups)])
    )


def indexof(
    x, needle, start=None, length=None, occurrence: int | None = None
) -> Column:
    """KQL indexof(source, lookup[, start[, length[, occurrence]]]):
    0-based, -1 if absent. `start` may be negative (offset from the
    end, Kusto-documented); `length` bounds the examined window from
    start (-1 = to end); `occurrence` picks the n-th match (1-based,
    literal — the walk unrolls into a bounded locate chain). Spark
    locate is 1-based with 0-for-absent; a failed step propagates as
    null through the chain (r16 probe batch 18)."""
    needle_col = needle if isinstance(needle, Column) else F.lit(needle)
    src = _c(x)
    if start is None and length is None and occurrence is None:
        return (F.instr(src, needle_col) - 1).cast("long")
    s_raw = _c(start if start is not None else 0).cast("int")
    s = F.when(s_raw < 0, F.greatest(F.length(src) + s_raw, F.lit(0))).otherwise(
        s_raw
    )
    if length is None:
        win_len = F.length(src)
    else:
        ln = _c(length).cast("int")
        win_len = F.when(ln < 0, F.length(src)).otherwise(ln)
    win = src.substr(s + 1, win_len)
    # 1-based cursor within the window; null once a step fails
    pos = F.lit(0)
    for _ in range(1 if occurrence is None else max(int(occurrence), 1)):
        pos = F.nullif(
            F.call_function("locate", needle_col, win, pos + 1), F.lit(0)
        )
    return (
        F.when(pos.isNull(), F.lit(-1)).otherwise(pos - 1 + s).cast("long")
    )


def countof(x, needle: str) -> Column:
    """KQL countof (plain term count)."""
    return F.size(F.split(_c(x), F.lit(needle).cast("string"), -1)) - 1


def reverse(x) -> Column:
    return F.reverse(_c(x))


def tostring(x) -> Column:
    """KQL tostring — null renders as '' (Kusto's contract; KQL strings
    have no null, only empty)."""
    return F.coalesce(_c(x).cast("string"), F.lit(""))


def timespan_to_string(itv: Column) -> Column:
    """Kusto [d.]hh:mm:ss[.fffffff] rendering of a day-time INTERVAL
    column (r14 — datetime subtraction yields intervals, and Spark's
    native cast renders them as \"INTERVAL '…' DAY TO SECOND\"). Total
    microseconds come from anchoring the interval at the epoch —
    intervals don't cast to numerics directly; the fraction renders as
    Kusto's fixed 7-digit 100-ns tick field, mirroring the
    translate-time `_span_str` literal formatter."""
    us = F.unix_micros(F.timestamp_micros(F.lit(0)) + itv)
    sign = F.when(us < 0, F.lit("-")).otherwise(F.lit(""))
    a = F.abs(us)
    ticks = (a % 1_000_000) * 10
    total_s = F.floor(a / 1_000_000).cast("long")
    d = F.floor(total_s / 86400).cast("long")
    rem = total_s % 86400
    h = F.floor(rem / 3600).cast("long")
    m = F.floor((rem % 3600) / 60).cast("long")
    s = total_s % 60
    body = F.concat(
        F.when(d > 0, F.concat(d.cast("string"), F.lit(""))).otherwise(
            F.lit("")
        ),
        F.when(d > 0, F.lit(".")).otherwise(F.lit("")),
        F.lpad(h.cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(m.cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(s.cast("string"), 2, "0"),
        F.when(
            ticks > 0,
            F.concat(F.lit("."), F.lpad(ticks.cast("string"), 7, "0")),
        ).otherwise(F.lit("")),
    )
    return F.concat(sign, body)


def base64_encode_tostring(x) -> Column:
    return F.base64(_c(x).cast("binary"))


def base64_decode_tostring(x) -> Column:
    return F.unbase64(_c(x)).cast("string")


def hash_xx(x, mod: int | None = None) -> Column:
    """KQL hash() — xxhash64; optional modulus."""
    h = F.xxhash64(_c(x))
    if mod is not None:
        return F.pmod(h, F.lit(mod))
    return h


def hash_sha256(x) -> Column:
    return F.sha2(_c(x).cast("string"), 256)


def url_encode(x) -> Column:
    return F.url_encode(_c(x))


def url_decode(x) -> Column:
    return F.url_decode(_c(x))


def isempty(x) -> Column:
    c = _c(x)
    return c.isNull() | (c.cast("string") == "")


def isnotempty(x) -> Column:
    return ~isempty(x)


# predicates
def has_term(x, term: str, case_insensitive: bool = True) -> Column:
    """KQL `has` — whole-term match (token-indexed in Kusto; realized as a
    word-boundary regex — documented in SURVEY.md §2.2.3)."""
    flags = "(?i)" if case_insensitive else ""
    import re as _re

    pat = f"{flags}\\b{_re.escape(term)}\\b"
    return _c(x).rlike(pat)


def startswith(x, prefix: str) -> Column:
    return F.startswith(F.lower(_c(x)), F.lit(prefix.lower()))


def endswith(x, suffix: str) -> Column:
    return F.endswith(F.lower(_c(x)), F.lit(suffix.lower()))


def matches_regex(x, pattern: str) -> Column:
    return _c(x).rlike(pattern)


def in_list(x, values, case_insensitive: bool = False) -> Column:
    c = _c(x)
    if case_insensitive:
        return F.lower(c).isin([v.lower() for v in values])
    return c.isin(list(values))


def between(x, lo, hi) -> Column:
    return _c(x).between(_lit(lo), _lit(hi))


# ---------------------------------------------------------------- math
def ceiling(x) -> Column:
    return F.ceil(_c(x))


def log2(x) -> Column:
    return F.log2(_c(x))


def min_of(*xs) -> Column:
    return F.least(*[_c(x) for x in xs])


def max_of(*xs) -> Column:
    return F.greatest(*[_c(x) for x in xs])


# ---------------------------------------------------------------- nulls / conditional
def iff(cond: Column, then, otherwise) -> Column:
    return F.when(cond, _lit(then)).otherwise(_lit(otherwise))


iif = iff


def case(*args) -> Column:
    """KQL case(p1, v1, p2, v2, …, default). Literal-bool predicates
    (case(false, …)) are lifted to Columns."""
    if len(args) < 3 or len(args) % 2 == 0:
        raise ValueError("case needs pred/value pairs plus a default")

    def pred(p):
        return F.lit(p) if isinstance(p, bool) else p

    expr = F.when(pred(args[0]), _lit(args[1]))
    i = 2
    while i + 1 < len(args):
        expr = expr.when(pred(args[i]), _lit(args[i + 1]))
        i += 2
    return expr.otherwise(_lit(args[-1]))


def _hex_to_long(c: Column) -> Column:
    """'0x1a'-style hex strings → long (Kusto toint/tolong accept
    hex-prefixed literals); null when not a hex form."""
    s = F.lower(c.cast("string"))
    hexpart = F.regexp_extract(s, r"^0x([0-9a-f]{1,16})$", 1)
    return F.when(hexpart != "", F.conv(hexpart, 16, 10).cast("long"))


def toint(x) -> Column:
    c = _c(x)
    return F.coalesce(c.try_cast("int"), _hex_to_long(c).cast("int"))


def tolong(x) -> Column:
    c = _c(x)
    return F.coalesce(c.try_cast("long"), _hex_to_long(c))


def todouble(x) -> Column:
    return _c(x).try_cast("double")


toreal = todouble


def tobool(x) -> Column:
    return _c(x).try_cast("boolean")


def todecimal(x) -> Column:
    return _c(x).try_cast("decimal(38,18)")


# ---------------------------------------------------------------- dynamic / array
def array_length(x) -> Column:
    return F.size(_c(x)).cast("long")


def array_concat(*xs) -> Column:
    return F.concat(*[_c(x) for x in xs])


def array_slice(x, start, end) -> Column:
    """KQL array_slice(arr, start, end) — 0-based inclusive ends;
    negative indexes count from the end (Kusto: -1 is the last
    element). Inverted or fully out-of-range slices yield []."""
    arr = _c(x)
    n = F.size(arr)
    s = _lit(start).cast("int")
    e = _lit(end).cast("int")
    s = F.when(s >= 0, s).otherwise(n + s)
    e = F.when(e >= 0, e).otherwise(n + e)
    s = F.greatest(s, F.lit(0))
    length = F.greatest(e - s + 1, F.lit(0))
    return F.slice(arr, s + 1, length)


def array_sort_asc(x) -> Column:
    return F.sort_array(_c(x))


def repeat_value(value, count) -> Column:
    """KQL repeat(value, count) — array of `count` copies; negative
    count yields an empty array (Kusto returns null; empty keeps the
    expression null-safe for downstream mv-expand)."""
    n = _lit(count)
    return F.array_repeat(_c(value), F.greatest(n, F.lit(0)).cast("int"))


def array_split(x, index) -> Column:
    """KQL array_split(arr, index) — [prefix, suffix] split at the
    0-based index (single-index form; Kusto also accepts an index
    array). Negative index counts from the end, Kusto-style."""
    a = _c(x)
    i = _lit(index)
    pos = F.when(i < 0, F.greatest(F.size(a) + i, F.lit(0))).otherwise(
        F.least(i, F.size(a))
    )
    return F.array(
        F.slice(a, 1, pos.cast("int")),
        F.slice(
            a,
            (pos + 1).cast("int"),
            F.greatest(F.size(a) - pos, F.lit(0)).cast("int"),
        ),
    )


def array_sort_desc(x) -> Column:
    return F.sort_array(_c(x), asc=False)


def array_index_of(x, v, start: int = 0) -> Column:
    """KQL 0-based, -1 if missing (Spark array_position is 1-based, 0
    if missing); optional `start` searches from that index (the found
    position stays relative to the FULL array, Kusto's contract)."""
    if start:
        arr = _c(x)
        tail_pos = F.array_position(
            F.slice(arr, int(start) + 1, F.greatest(F.size(arr) - int(start), F.lit(0))),
            _lit(v),
        ).cast("long")
        return F.when(tail_pos > 0, tail_pos - 1 + int(start)).otherwise(-1)
    return F.array_position(_c(x), _lit(v)).cast("long") - 1


def set_union(*xs) -> Column:
    out = _c(xs[0])
    for x in xs[1:]:
        out = F.array_union(out, _c(x))
    return out


def set_intersect(a, b) -> Column:
    return F.array_intersect(_c(a), _c(b))


def set_difference(a, b) -> Column:
    return F.array_except(_c(a), _c(b))


def pack_array(*xs) -> Column:
    return F.array(*[_lit(x) if not isinstance(x, Column) else x for x in xs])


def zip_arrays(*arrays) -> Column:
    """KQL zip — variadic pairwise zip. Spark's struct-element shape
    (fields '0', '1', …) stands in for Kusto's inner arrays, which
    would need a common element type (documented delta)."""
    if len(arrays) < 2:
        raise ValueError("zip needs at least two arrays")
    return F.arrays_zip(*[_c(a) for a in arrays])


def array_sum(x) -> Column:
    return F.aggregate(_c(x), F.lit(0.0), lambda acc, v: acc + v.cast("double"))


def array_avg(x) -> Column:
    return array_sum(x) / F.size(_c(x))


def bag_keys(x) -> Column:
    """Keys of a dynamic (JSON object) value."""
    return F.json_object_keys(_c(x))


def pack(*kv) -> Column:
    """KQL pack(k1, v1, k2, v2, …) / bag_pack → JSON string.

    Literal keys build a typed struct (values keep their JSON types).
    COMPUTED keys (pack(strcat(...), v)) are legal Kusto too — those
    fall back to a runtime map, whose values serialize as strings
    (consistent with the engine's map<string,string> bag convention
    used by bag_merge/make_bag)."""
    if len(kv) % 2:
        raise ValueError("pack needs key/value pairs")
    if not any(isinstance(kv[i], Column) for i in range(0, len(kv), 2)):
        cols = []
        for i in range(0, len(kv), 2):
            key, val = kv[i], kv[i + 1]
            cols.append(
                (_lit(val) if not isinstance(val, Column) else val).alias(str(key))
            )
        return F.to_json(F.struct(*cols))
    ks, vs = [], []
    for i in range(0, len(kv), 2):
        key, val = kv[i], kv[i + 1]
        ks.append(
            (key if isinstance(key, Column) else F.lit(str(key))).cast("string")
        )
        vs.append(
            (val if isinstance(val, Column) else _lit(val)).cast("string")
        )
    entries = F.array(
        *[F.struct(k.alias("key"), v.alias("value")) for k, v in zip(ks, vs)]
    )
    return F.to_json(F.map_from_entries(_bag_entries(entries)))


def _bag_entries(entries: Column) -> Column:
    """Null-key and duplicate-key tolerant entry list for bag builds.
    Spark's default mapKeyDedupPolicy=EXCEPTION raises on either;
    Kusto skips null keys and tolerates duplicates (first key wins,
    the engine's bag_merge convention)."""
    nonnull = F.filter(entries, lambda e: e["key"].isNotNull())
    return F.filter(
        nonnull,
        lambda e, i: ~F.exists(
            F.slice(nonnull, F.lit(1), i), lambda p: p["key"] == e["key"]
        ),
    )


def bag_zip(keys, values) -> Column:
    """KQL bag_zip(keys, values) — build a bag from parallel arrays.
    Kusto semantics: keys without a matching value get null; surplus
    values are ignored (keys array drives the length); null keys are
    skipped. Values follow the engine's string bag convention."""
    ks = F.transform(_c(keys), lambda k: k.cast("string"))
    vs = _c(values)
    paired = F.transform(
        ks,
        lambda k, i: F.struct(
            k.alias("key"),
            F.try_element_at(vs, i + 1).cast("string").alias("value"),
        ),
    )
    return F.to_json(F.map_from_entries(_bag_entries(paired)))


def dynamic_to_json(d) -> Column:
    """KQL dynamic_to_json — canonical JSON with sorted keys. Subset:
    TOP-LEVEL object keys are sorted (nested bags pass through
    verbatim; arrays/scalars are already canonical)."""
    m = F.from_json(_c(d), "map<string,string>")
    sorted_obj = F.to_json(F.map_from_entries(F.sort_array(F.map_entries(m))))
    return F.coalesce(sorted_obj, _c(d))


def format_number(x, precision) -> Column:
    """KQL format_number — thousands separators + fixed decimals
    (Spark's format_number has the identical contract)."""
    return F.format_number(_c(x), int(_raw_int(precision)))


def _raw_int(v) -> int:
    if isinstance(v, Column):
        raise ValueError("format_number precision must be a literal")
    return int(v)


def parse_json_get(x, path: str) -> Column:
    """Dynamic member access d.x / d['x'] → get_json_object(d, '$.x')."""
    return F.get_json_object(_c(x), f"$.{path}")


todynamic = tostring  # dynamic carried as JSON string (types.py)


# ---- round-3 surface widening (common Kusto functions) -----------------
def datetime_add_col(part: str, amount, ts) -> Column:
    """Column-native datetime_add (KQL part names map to Spark units)."""
    return F.timestamp_add(part.strip("'\""), _c(amount), _c(ts))


def datetime_diff_col(part: str, ts1, ts2) -> Column:
    """KQL datetime_diff(period, dt1, dt2) = dt1 − dt2 in period units."""
    return F.timestamp_diff(part.strip("'\""), _c(ts2), _c(ts1))


_DT_PART_TO_SPARK = {
    "year": "YEAR",
    "quarter": "QUARTER",
    "month": "MONTH",
    "week_of_year": "WEEK",
    "weekofyear": "WEEK",
    "day": "DAY",
    "dayofyear": "DOY",
    "hour": "HOUR",
    "minute": "MINUTE",
}


def datetime_part(part: str, ts) -> Column:
    """Kusto datetime_part: Kusto part names mapped to Spark's extract
    fields (r15 — `dayofyear`/`week_of_year` are DOY/WEEK in Spark and
    raised INVALID_EXTRACT_FIELD when passed through). The sub-second
    parts are the Kusto COMPONENTS (millisecond 0-999, microsecond
    0-999999, nanosecond in 100ns-tick multiples) at the engine's µs
    resolution; `second` is the integer seconds component."""
    p = part.strip("'\"").lower()
    c = _c(ts)
    if p in _DT_PART_TO_SPARK:
        return F.date_part(F.lit(_DT_PART_TO_SPARK[p]), c).cast("int")
    us = F.pmod(F.unix_micros(c), F.lit(1_000_000))
    if p == "second":
        return F.floor(F.date_part(F.lit("SECOND"), c)).cast("int")
    if p == "millisecond":
        return F.floor(us / 1000).cast("int")
    if p == "microsecond":
        return us.cast("int")
    if p == "nanosecond":
        return (us * 1000).cast("long")
    return F.date_part(F.lit(part.strip("'\"")), c)


def make_datetime(y, mo, d, h=None, mi=None, s=None) -> Column:
    zero = F.lit(0)
    return F.make_timestamp(
        _c(y), _c(mo), _c(d),
        _c(h) if h is not None else zero,
        _c(mi) if mi is not None else zero,
        _c(s) if s is not None else zero,
    )


def _end_of(ts, unit: str) -> Column:
    """Last representable tick (µs here) of the period containing ts."""
    start = F.date_trunc(unit, _c(ts))
    return start + F.expr(f"INTERVAL 1 {unit}") - F.expr("INTERVAL 1 MICROSECOND")


def endofday(ts, offset: int = 0) -> Column:
    base = _end_of(ts, "day")
    return base + F.expr(f"INTERVAL {int(offset)} DAY") if offset else base


def endofweek(ts, offset: int = 0) -> Column:
    """Last µs of the KQL (Sunday-based) week containing ts — defined
    off startofweek so the [startofweek, endofweek] pair brackets ONE
    week (Spark's Monday-truncated 'week' unit would bracket 8 days for
    Monday timestamps and diverge from Kusto on every non-Sunday-aligned
    day)."""
    return (
        startofweek(ts, offset)
        + F.expr("INTERVAL 7 DAY")
        - F.expr("INTERVAL 1 MICROSECOND")
    )


def endofmonth(ts, offset: int = 0) -> Column:
    start = startofmonth(ts, offset)
    return F.add_months(start, 1).cast("timestamp") - F.expr(
        "INTERVAL 1 MICROSECOND"
    )


def endofyear(ts, offset: int = 0) -> Column:
    start = startofyear(ts, offset)
    return F.add_months(start, 12).cast("timestamp") - F.expr(
        "INTERVAL 1 MICROSECOND"
    )


def bin_at_numeric(v, size, fixed) -> Column:
    return _c(fixed) + F.floor((_c(v) - _c(fixed)) / F.lit(size)) * F.lit(size)


def bin_at_datetime(ts, step_s: float, fixed) -> Column:
    """bin_at for timestamps: bins aligned to `fixed` instead of epoch."""
    step_us = int(step_s * 1_000_000)
    delta = F.unix_micros(_c(ts)) - F.unix_micros(_c(fixed))
    binned = F.floor(delta / step_us).cast("long") * step_us + F.unix_micros(_c(fixed))
    return F.timestamp_micros(binned.cast("long"))


def strcat_array(arr, delim) -> Column:
    return F.array_join(_c(arr), delim if isinstance(delim, str) else _c(delim))


def strrep(value, multiplier, delimiter="") -> Column:
    d = delimiter if isinstance(delimiter, str) else _c(delimiter)
    return F.array_join(
        F.array_repeat(_c(value).cast("string"), _c(multiplier).cast("int")), d
    )


def translate_kql(search, replace, text) -> Column:
    """KQL arg order (searchList, replacementList, text)."""
    return F.translate(_c(text), str(search), str(replace))


def extract_json(path: str, source) -> Column:
    return F.get_json_object(_c(source), str(path))


def array_rotate_left(arr, n) -> Column:
    a = _c(arr)
    return F.transform(
        a, lambda x, i: F.element_at(a, (F.pmod(i + _c(n), F.size(a)) + 1).cast("int"))
    )


def array_rotate_right(arr, n) -> Column:
    a = _c(arr)
    return F.transform(
        a,
        lambda x, i: F.element_at(
            a, (F.pmod(i - _c(n), F.size(a)) + 1).cast("int")
        ),
    )


def _shift_pick(a: Column, idx: Column) -> Column:
    """a[idx] (1-based) or null — guards idx ≤ 0 (element_at(…, 0) throws
    even in the try_ variant)."""
    return F.when(idx >= 1, F.try_element_at(a, idx.cast("int")))


def _shift_fill(a: Column, idx: Column, fill) -> Column:
    """Element a[idx] (1-based) when idx is in range — keeping genuine
    null ELEMENTS null — else the fill value for the vacated slot
    (Kusto's optional fill_value, r16 probe batch 18)."""
    in_range = (idx >= 1) & (idx <= F.size(a))
    picked = F.when(idx >= 1, F.try_element_at(a, idx.cast("int")))
    if fill is None:
        return picked
    return F.when(in_range, picked).otherwise(_lit(fill))


def array_shift_left(arr, n, fill=None) -> Column:
    """Shift elements left by n; vacated slots take `fill` (null when
    omitted — the KQL default). Negative n shifts right."""
    a = _c(arr)
    return F.transform(a, lambda x, i: _shift_fill(a, i + _c(n) + 1, fill))


def array_shift_right(arr, n, fill=None) -> Column:
    a = _c(arr)
    return F.transform(a, lambda x, i: _shift_fill(a, i - _c(n) + 1, fill))


def jaccard_index(a, b) -> Column:
    """|A∩B| / |A∪B| over array-as-set columns."""
    inter = F.size(F.array_intersect(_c(a), _c(b)))
    union = F.size(F.array_union(_c(a), _c(b)))
    return inter / union


# ---------------------------------------------------------------- ipv4
def _ipv4_octets(ip) -> Column:
    return F.split(_c(ip), "\\.")


def ipv4_to_long(ip) -> Column:
    """Dotted-quad → 32-bit value (null for malformed input) — the
    comparison key for every ipv4_* function; pure codegen fold."""
    o = _ipv4_octets(ip)
    valid = (F.size(o) == 4) & F.forall(
        o, lambda x: x.rlike("^[0-9]{1,3}$") & (x.cast("long") <= 255)
    )
    val = F.aggregate(
        o, F.lit(0).cast("long"), lambda acc, x: acc * 256 + x.cast("long")
    )
    return F.when(valid, val)


def format_ipv4(value, prefix=None) -> Column:
    """Kusto format_ipv4 — dotted quad from a 32-bit value OR a
    dotted-quad string (r15: Kusto accepts both; the bare long cast
    raised CAST_INVALID_INPUT on strings under ANSI). The optional
    `prefix` applies the netmask first (format_ipv4_mask is the
    variant that also renders the /prefix suffix)."""
    ipc = _c(value)
    v = F.when(
        ipc.cast("string").rlike("^[0-9]+$"), ipc.cast("long")
    ).otherwise(ipv4_to_long(ipc))
    if prefix is not None:
        pfx = _c(prefix).cast("int")
        p = F.pow(F.lit(2.0), (32 - pfx).cast("double"))
        v = F.when(pfx.between(0, 32), (F.floor(v / p) * p).cast("long"))
    return F.when(
        v.isNotNull(),
        F.concat_ws(
            ".",
            (F.shiftright(v, 24) % 256).cast("string"),
            (F.shiftright(v, 16) % 256).cast("string"),
            (F.shiftright(v, 8) % 256).cast("string"),
            (v % 256).cast("string"),
        ),
    )


def ipv4_compare(a, b) -> Column:
    """-1/0/1 ordering of two IPv4 literals (null if either malformed).
    Either argument may carry an IP-prefix suffix ('x.y.z.w/24'); the
    comparison then uses the MOST specific common netmask — the least
    of the two suffixes — per the Kusto contract (r16 probe batch 19:
    the plain path previously nulled on any '/'-suffixed input)."""
    ca, cb = _c(a), _c(b)

    def split_ip(c):
        base = F.when(c.contains("/"), F.substring_index(c, "/", 1)).otherwise(c)
        bits = F.when(
            c.contains("/"), F.substring_index(c, "/", -1).cast("int")
        ).otherwise(F.lit(32))
        return ipv4_to_long(base), bits

    la, bits_a = split_ip(ca)
    lb, bits_b = split_ip(cb)
    bits = F.least(bits_a, bits_b)
    p = F.pow(F.lit(2.0), (F.lit(32) - bits).cast("double"))
    ma, mb = F.floor(la / p), F.floor(lb / p)
    return F.when(
        bits.between(0, 32),
        F.when(ma < mb, -1).when(ma > mb, 1).when(ma == mb, 0),
    )


def ipv4_is_in_range(ip, cidr) -> Column:
    """True when ip falls in 'a.b.c.d/prefix' (prefix omitted ⇒ /32)."""
    c = _c(cidr)
    base = F.when(c.contains("/"), F.substring_index(c, "/", 1)).otherwise(c)
    bits = F.when(c.contains("/"), F.substring_index(c, "/", -1).cast("int")).otherwise(
        F.lit(32)
    )
    mask_shift = F.lit(32) - bits
    lip, lbase = ipv4_to_long(ip), ipv4_to_long(base)
    # >> with column shift: divide by 2^shift (exact for non-negatives)
    p = F.pow(F.lit(2.0), mask_shift.cast("double"))
    return F.when(
        lip.isNotNull() & lbase.isNotNull() & bits.between(0, 32),
        F.floor(lip / p) == F.floor(lbase / p),
    )


def ipv4_is_private(ip) -> Column:
    """RFC1918: 10/8, 172.16/12, 192.168/16."""
    return (
        ipv4_is_in_range(ip, F.lit("10.0.0.0/8"))
        | ipv4_is_in_range(ip, F.lit("172.16.0.0/12"))
        | ipv4_is_in_range(ip, F.lit("192.168.0.0/16"))
    )


def parse_ipv4(ip) -> Column:
    """KQL parse_ipv4 — dotted quad (optionally with a /prefix netmask,
    which is APPLIED) → long; null for malformed input."""
    c = _c(ip)
    base = F.when(c.contains("/"), F.substring_index(c, "/", 1)).otherwise(c)
    bits = F.when(
        c.contains("/"), F.substring_index(c, "/", -1).cast("int")
    ).otherwise(F.lit(32))
    v = ipv4_to_long(base)
    p = F.pow(F.lit(2.0), (F.lit(32) - bits).cast("double"))
    return F.when(
        v.isNotNull() & bits.between(0, 32),
        (F.floor(v / p) * p).cast("long"),
    )


def parse_ipv4_mask(ip, prefix) -> Column:
    """KQL parse_ipv4_mask — ip masked to `prefix` bits, as long."""
    bits = _lit(prefix).cast("int")
    v = ipv4_to_long(ip)
    p = F.pow(F.lit(2.0), (F.lit(32) - bits).cast("double"))
    return F.when(
        v.isNotNull() & bits.between(0, 32), (F.floor(v / p) * p).cast("long")
    )


def _ipv4_term_ok(ip_lit: str) -> bool:
    parts = ip_lit.split(".")
    return len(parts) == 4 and all(
        p.isdigit() and 0 <= int(p) <= 255 for p in parts
    )


def has_ipv4(text, ip_lit: str) -> Column:
    """KQL has_ipv4 — true when the (validated) IPv4 literal appears as
    a delimited term in the text; false for malformed search IPs."""
    import re as _re

    if not _ipv4_term_ok(ip_lit):
        return F.lit(False)
    # Kusto requires NON-ALPHANUMERIC delimiters around the complete IP
    # term ('a10.1.2.3' does not match '10.1.2.3').
    pat = r"(^|[^0-9A-Za-z.])" + _re.escape(ip_lit) + r"($|[^0-9A-Za-z.])"
    return _c(text).rlike(pat)


def has_ipv4_prefix(text, prefix_lit: str) -> Column:
    """KQL has_ipv4_prefix — a delimited IPv4 term starting with the
    prefix ('10.1.' style) appears in the text."""
    import re as _re

    if not _re.fullmatch(r"[0-9.]+", prefix_lit or ""):
        return F.lit(False)
    # Delimited term that starts with the prefix AND is a well-formed
    # dotted quad: lookahead pins the prefix, the octet pattern
    # validates the complete term, and both ends need non-alphanumeric
    # delimiters (Kusto semantics).
    octet = r"(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])"
    pat = (
        r"(^|[^0-9A-Za-z.])(?="
        + _re.escape(prefix_lit)
        + r")("
        + octet
        + r"\.){3}"
        + octet
        + r"($|[^0-9A-Za-z.])"
    )
    return _c(text).rlike(pat)


def has_any_ipv4(text, ips: list) -> Column:
    """KQL has_any_ipv4 — any of the listed IPv4 literals as a term."""
    preds = [has_ipv4(text, str(v)) for v in ips]
    if not preds:
        return F.lit(False)
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def has_any_ipv4_prefix(text, prefixes: list) -> Column:
    """KQL has_any_ipv4_prefix — any of the listed prefixes."""
    preds = [has_ipv4_prefix(text, str(v)) for v in prefixes]
    if not preds:
        return F.lit(False)
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def parse_version(v) -> Column:
    """KQL parse_version: 'a.b.c.d' → one sortable BIGINT
    (a*10^12 + b*10^8 + c*10^4 + d; missing parts are 0, parts capped
    at 4, null for malformed/oversized parts — Kusto's comparable-key
    semantics)."""
    parts = F.split(_c(v), "\\.")
    ok = (
        _c(v).rlike("^[0-9]+(\\.[0-9]+){0,3}$")
        & F.forall(parts, lambda x: x.cast("long") <= 9999)
    )
    padded = F.concat(
        F.transform(parts, lambda x: x.cast("long")),
        F.array_repeat(F.lit(0).cast("long"), 4 - F.size(parts)),
    )
    val = F.aggregate(
        F.slice(padded, 1, 4),
        F.lit(0).cast("long"),
        lambda acc, x: acc * 10_000 + x,
    )
    return F.when(ok, val)


def geo_distance_2points(lon1, lat1, lon2, lat2) -> Column:
    """KQL geo_distance_2points: haversine great-circle distance in
    meters (WGS84 mean radius) — codegen trigonometry, row-local."""
    r = 6_371_008.8
    la1, la2 = F.radians(_c(lat1)), F.radians(_c(lat2))
    dla = F.radians(_c(lat2) - _c(lat1))
    dlo = F.radians(_c(lon2) - _c(lon1))
    a = (
        F.sin(dla / 2) * F.sin(dla / 2)
        + F.cos(la1) * F.cos(la2) * F.sin(dlo / 2) * F.sin(dlo / 2)
    )
    return F.lit(2.0 * r) * F.asin(F.sqrt(a))


def parse_url(u) -> Column:
    """KQL parse_url → struct (Scheme, Host, Port, Path, Username,
    Password, Query, Fragment) — Spark's JVM parse_url per component
    (null where absent). Documented deltas from Kusto's bag: Port is a
    LONG (Kusto renders a string), and the raw Query string stands in
    for Kusto's nested "Query Parameters" bag (parse_urlquery provides
    that shape). r16: credentials-qualified URLs
    ('scheme://user:pw@host:port/…') now extract Port, Username and
    Password (the old port regexp refused the '@' authority form)."""
    c = _c(u)
    # Spark's parse_url(PORT) returns null on this build — extract the
    # port with a regexp instead (optional userinfo@ before the host)
    port = F.regexp_extract(
        c, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/:?#]+:([0-9]+)", 1
    )
    userinfo = F.regexp_extract(
        c, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#@]*)@", 1
    )
    username = F.substring_index(userinfo, ":", 1)
    password = F.when(
        userinfo.contains(":"), F.substring_index(userinfo, ":", -1)
    )
    return F.struct(
        F.parse_url(c, F.lit("PROTOCOL")).alias("Scheme"),
        F.parse_url(c, F.lit("HOST")).alias("Host"),
        F.when(port != "", port.cast("long")).alias("Port"),
        F.parse_url(c, F.lit("PATH")).alias("Path"),
        F.when(userinfo != "", username).alias("Username"),
        password.alias("Password"),
        F.parse_url(c, F.lit("QUERY")).alias("Query"),
        F.parse_url(c, F.lit("REF")).alias("Fragment"),
    )


def parse_urlquery(q) -> Column:
    """KQL parse_urlquery → bag {"Query Parameters": {k: v, …}} —
    str_to_map on '&'/'=' with URL-decoded values, rendered as the
    nested-JSON shape Kusto emits. Row-local codegen."""
    c = _c(q)
    m = F.str_to_map(F.regexp_replace(c, r"^.*\?", ""), F.lit("&"), F.lit("="))
    decoded = F.transform_values(m, lambda k, v: F.url_decode(v))
    return F.to_json(
        F.create_map(F.lit("Query Parameters"), decoded)
    )


def parse_xml(x) -> Column:
    """KQL parse_xml — XML text → dynamic (canonical JSON text),
    following Kusto's documented mapping: `<e>text</e>` →
    {"e":"text"}, attributes prefix '@' ({"e":{"@a":"1","#text":"t"}}),
    child elements nest per tag, repeated sibling tags collect into an
    array, empty elements → null. Arrow batch kernel
    (xml.etree, stdlib); malformed XML → null (r16 probe batch 20)."""

    @F.pandas_udf("string")
    def kern(vals: pd.Series) -> pd.Series:
        import json
        import xml.etree.ElementTree as ET

        def node(el):
            out = {}
            for k, v in el.attrib.items():
                out["@" + k] = v
            for child in el:
                v = node(child)[child.tag]
                if child.tag in out:
                    prev = out[child.tag]
                    if isinstance(prev, list):
                        prev.append(v)
                    else:
                        out[child.tag] = [prev, v]
                else:
                    out[child.tag] = v
            text = (el.text or "").strip() or None
            if out:
                if text is not None:
                    out["#text"] = text
                return {el.tag: out}
            return {el.tag: text}

        def conv(s):
            if not s:
                return None
            try:
                return json.dumps(
                    node(ET.fromstring(s)), separators=(",", ":")
                )
            except ET.ParseError:
                return None

        return pd.Series([conv(v) for v in vals], dtype=object)

    return kern(_c(x))


def parse_command_line(cmd, parser_type="windows") -> Column:
    """KQL parse_command_line — split a command line into its argument
    array. 'windows' honors the MSVCRT rules (double quotes group,
    backslashes escape only before a quote, doubled "" emits a
    literal quote); any other parser type falls back to POSIX shlex.
    Arrow batch kernel; null/empty input → null (r16 probe batch 20)."""
    ptype = str(parser_type).lower()

    @F.pandas_udf("array<string>")
    def kern(vals: pd.Series) -> pd.Series:
        def win_split(s):
            args, cur, in_q, has = [], [], False, False
            i, n = 0, len(s)
            while i < n:
                ch = s[i]
                if ch == "\\":
                    # count backslashes; they escape only a following quote
                    j = i
                    while j < n and s[j] == "\\":
                        j += 1
                    nbs = j - i
                    if j < n and s[j] == '"':
                        cur.append("\\" * (nbs // 2))
                        if nbs % 2:
                            cur.append('"')
                            i = j + 1
                        else:
                            i = j
                        has = True
                        continue
                    cur.append("\\" * nbs)
                    i = j
                    has = True
                    continue
                if ch == '"':
                    if in_q and i + 1 < n and s[i + 1] == '"':
                        cur.append('"')
                        i += 2
                        continue
                    in_q = not in_q
                    has = True
                    i += 1
                    continue
                if ch in " \t" and not in_q:
                    if has or cur:
                        args.append("".join(cur))
                        cur, has = [], False
                    i += 1
                    continue
                cur.append(ch)
                has = True
                i += 1
            if has or cur:
                args.append("".join(cur))
            return args

        def conv(s):
            if not s:
                return None
            if ptype == "windows":
                return win_split(s)
            import shlex

            try:
                return shlex.split(s)
            except ValueError:
                return None

        return pd.Series([conv(v) for v in vals], dtype=object)

    return kern(_c(cmd))


def punycode_from_string(s) -> Column:
    """KQL punycode_from_string — encode a unicode string to its
    punycode form (no xn-- prefix, per Kusto). Arrow kernel (python's
    codec); null on failure."""

    @F.pandas_udf("string")
    def kern(vals: pd.Series) -> pd.Series:
        def enc(x):
            if x is None:
                return None
            try:
                return x.encode("punycode").decode("ascii")
            except (UnicodeError, ValueError):
                return None

        return vals.map(enc)

    return kern(_lit(s))


def punycode_to_string(s) -> Column:
    """KQL punycode_to_string — decode a punycode string (no xn--
    prefix); null on failure."""

    @F.pandas_udf("string")
    def kern(vals: pd.Series) -> pd.Series:
        def dec(x):
            if x is None:
                return None
            try:
                return x.encode("ascii").decode("punycode")
            except (UnicodeError, ValueError):
                return None

        return vals.map(dec)

    return kern(_lit(s))


def punycode_domain_from_string(s) -> Column:
    """KQL punycode_domain_from_string — decode an IDNA (xn--) domain
    to unicode, label-wise; labels without the ACE prefix pass through;
    null on malformed input."""

    @F.pandas_udf("string")
    def kern(vals: pd.Series) -> pd.Series:
        def dec(x):
            if x is None:
                return None
            try:
                out = []
                for label in x.split("."):
                    if label.lower().startswith("xn--"):
                        out.append(
                            label[4:].encode("ascii").decode("punycode")
                        )
                    else:
                        out.append(label)
                return ".".join(out)
            except (UnicodeError, ValueError):
                return None

        return vals.map(dec)

    return kern(_lit(s))


def punycode_domain_to_string(s) -> Column:
    """KQL punycode_domain_to_string — encode a unicode domain to its
    IDNA (xn--) form, label-wise; ASCII labels pass through."""

    @F.pandas_udf("string")
    def kern(vals: pd.Series) -> pd.Series:
        def enc(x):
            if x is None:
                return None
            try:
                out = []
                for label in x.split("."):
                    if label.isascii():
                        out.append(label)
                    else:
                        out.append(
                            "xn--" + label.encode("punycode").decode("ascii")
                        )
                return ".".join(out)
            except (UnicodeError, ValueError):
                return None

        return vals.map(enc)

    return kern(_lit(s))


def parse_path(p) -> Column:
    """KQL parse_path → struct (Scheme omitted — plain paths):
    (DirectoryPath, Filename, Extension, AlternateDataStreamName
    omitted). Separator-agnostic ('/' and '\\\\')."""
    c = F.regexp_replace(_c(p), "\\\\", "/")
    fname = F.substring_index(c, "/", -1)
    dirp = F.when(
        F.length(c) > F.length(fname),
        F.substring(c, 1, F.length(c) - F.length(fname) - 1),
    ).otherwise(F.lit(""))
    ext = F.when(
        fname.contains("."), F.substring_index(fname, ".", -1)
    ).otherwise(F.lit(""))
    return F.struct(
        dirp.alias("DirectoryPath"),
        fname.alias("Filename"),
        ext.alias("Extension"),
    )


# ------------------------------------------------- round-4 string/byte fns
def tohex(x, min_length: int | None = None) -> Column:
    """KQL tohex — lowercase hex string of an integer; min_length
    zero-pads but NEVER truncates (lpad alone would cut longer hex)."""
    h = F.lower(F.hex(_c(x).cast("long")))
    if min_length is not None:
        n = int(min_length)
        h = F.when(F.length(h) < n, F.lpad(h, n, "0")).otherwise(h)
    return h


def string_size(x) -> Column:
    """KQL string_size — size in BYTES (UTF-8), not characters."""
    return F.octet_length(_c(x)).cast("long")


def isascii(x) -> Column:
    """KQL isascii — true iff every character is 7-bit ASCII. In UTF-8 a
    character is single-byte iff its codepoint ≤ 0x7F, so byte length ==
    char length is exactly the predicate (no regex scan needed)."""
    c = _c(x)
    return c.isNotNull() & (F.octet_length(c) == F.length(c))


def indexof_regex(x, pattern: str) -> Column:
    """KQL indexof_regex — 0-based index of the first regex match, -1
    when absent (Spark regexp_instr is 1-based with 0-absent)."""
    return (F.regexp_instr(_c(x), F.lit(pattern)) - 1).cast("long")


def new_guid() -> Column:
    """KQL new_guid — random v4 uuid per row (nondeterministic)."""
    return F.uuid()


def unicode_codepoints_from_string(x) -> Column:
    """KQL unicode_codepoints_from_string — array of codepoints."""
    chars = F.filter(F.split(_c(x), ""), lambda ch: ch != "")
    return F.transform(chars, lambda ch: F.ascii(ch).cast("long"))


def unicode_codepoints_to_string(arr) -> Column:
    """KQL unicode_codepoints_to_string — string from codepoint array.
    format_string('%c') formats a true code point (incl. supplementary
    planes); F.char would be mod-256 and corrupt anything non-Latin-1."""
    return F.array_join(
        F.transform(_c(arr), lambda cp: F.format_string("%c", cp.cast("int"))), ""
    )


def replace_strings(text, lookups, rewrites) -> Column:
    """KQL replace_strings — apply each (lookup → rewrite) pair in order
    (sequential fold, matching Kusto's left-to-right semantics). Empty
    lookup arrays return the text unchanged (sequence(1, 0) would
    otherwise produce the DESCENDING [1, 0] and index out of bounds)."""
    lk, rw = _c(lookups), _c(rewrites)
    idx = F.sequence(F.lit(1), F.size(lk))
    folded = F.aggregate(
        idx,
        _c(text),
        lambda acc, i: F.replace(acc, F.element_at(lk, i), F.element_at(rw, i)),
    )
    # Kusto errors on mismatched lookup/rewrite lengths; without this
    # guard element_at past the shorter array would null the whole fold.
    mismatch = F.raise_error(
        F.concat(
            F.lit("replace_strings: lookups/rewrites length mismatch ("),
            F.size(lk).cast("string"),
            F.lit(" vs "),
            F.size(rw).cast("string"),
            F.lit(")"),
        )
    ).cast("string")
    return (
        F.when(F.size(lk) != F.size(rw), mismatch)
        .when(F.size(lk) <= 0, _c(text))
        .otherwise(folded)
    )


def has_any_index(x, terms) -> Column:
    """KQL has_any_index — 0-based index of the FIRST term in `terms`
    that the text `has` (whole-token match), -1 if none. Token semantics
    mirror has_term: split on non-word chars, case-insensitive.

    Terms containing non-word characters (phrases, punctuation) can't
    match any single token, so they fall back to case-insensitive
    substring containment — mirroring Kusto's `has` treating a
    multi-token term as a phrase match."""
    lowered = F.lower(_c(x))
    toks = F.filter(F.split(lowered, "\\W+"), lambda t: t != "")
    hits = F.filter(
        F.transform(
            _c(terms),
            lambda t, i: F.struct(
                i.cast("long").alias("i"),
                F.when(
                    F.lower(t.cast("string")).rlike("^\\w+$"),
                    F.array_contains(toks, F.lower(t.cast("string"))),
                )
                .otherwise(F.contains(lowered, F.lower(t.cast("string"))))
                .alias("m"),
            ),
        ),
        lambda s: s["m"],
    )
    return F.coalesce(F.try_element_at(hits, F.lit(1))["i"], F.lit(-1).cast("long"))


def format_bytes(size, precision: int = 0, units: str | None = None) -> Column:
    """KQL format_bytes — human-readable byte size ('1 KB', '2.5 GB').
    Auto-picks the largest binary unit unless `units` pins one."""
    s = _c(size).cast("double")
    scale = {"Bytes": 0, "KB": 1, "MB": 2, "GB": 3, "TB": 4, "PB": 5, "EB": 6}

    def fmt(unit: str) -> Column:
        v = s / F.lit(float(1024 ** scale[unit]))
        # format_number inserts thousands-separator commas ('3,906.25');
        # Kusto emits plain digits — strip them after rounding
        num = F.regexp_replace(F.format_number(v, precision), ",", "")
        return F.concat(num, F.lit(" " + unit))

    if units is not None:
        if units not in scale:
            raise ValueError(f"unknown unit {units!r}")
        return fmt(units)
    out = fmt("Bytes")
    for unit, p in list(scale.items())[1:]:
        out = F.when(s >= float(1024 ** p), fmt(unit)).otherwise(out)
    return out


def format_timespan(seconds, fmt: str = "hh:mm:ss") -> Column:
    """KQL format_timespan over the engine's seconds-valued timespans —
    the common patterns ('d.hh:mm:ss', 'hh:mm:ss', 'mm:ss'); fractional
    '.fff' suffix supported."""
    signed = _c(seconds).cast("double")
    # Fields are computed on |total|; a single leading '-' is prepended
    # for negative spans (Kusto renders -3661s as '-01:01:01', whereas
    # per-field floor/% on a negative double yields '-2:-2:-1').
    # All fields derive from ROUNDED 100-ns ticks — Kusto's native
    # resolution — so a binary double like 3.45 s (3.4499999…) renders
    # '.45', not the float-truncated '.44' (r16 probe batch 19).
    total = F.abs(signed)
    ticks = F.round(total * 1e7).cast("long")
    days = F.floor(ticks / 864_000_000_000).cast("long")
    hh = F.floor((ticks % 864_000_000_000) / 36_000_000_000).cast("long")
    mm = F.floor((ticks % 36_000_000_000) / 600_000_000).cast("long")
    ss = F.floor((ticks % 600_000_000) / 10_000_000).cast("long")
    p2 = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    parts: list[Column] = []
    base = fmt
    frac = None
    if "." in fmt.split(":")[-1] and fmt.rstrip("f") != fmt:
        base, frac_pat = fmt.rsplit(".", 1)
        frac = len(frac_pat)
    if base.startswith("d."):
        parts.append(F.concat(days.cast("string"), F.lit(".")))
        base = base[2:]
    fields = {"hh": p2(hh), "mm": p2(mm), "ss": p2(ss)}
    comps = [fields[f] for f in base.split(":") if f in fields]
    if not comps:
        raise ValueError(
            f"format_timespan: unsupported pattern {fmt!r} "
            "(expected fields from d.hh:mm:ss[.fff])"
        )
    out = comps[0]
    for c in comps[1:]:
        out = F.concat(out, F.lit(":"), c)
    if parts:
        out = F.concat(parts[0], out)
    if frac:
        sub = F.floor((ticks % 10_000_000) / (10 ** (7 - frac))).cast("long")
        out = F.concat(out, F.lit("."), F.lpad(sub.cast("string"), frac, "0"))
    return F.when(signed < 0, F.concat(F.lit("-"), out)).otherwise(out)


def series_dot_product(a, b) -> Column:
    """KQL series_dot_product — Σ aᵢ·bᵢ over two numeric arrays. Pure
    JVM HOFs (zip_with + aggregate), double accumulation left-to-right
    (deterministic; matches a sequential SQL fold)."""
    return F.aggregate(
        F.zip_with(
            _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def series_cosine_similarity(a, b) -> Column:
    """KQL series_cosine_similarity — dot/(‖a‖·‖b‖); null when either
    norm is zero (undefined angle)."""
    dot = series_dot_product(a, b)
    na = F.sqrt(series_dot_product(a, a))
    nb = F.sqrt(series_dot_product(b, b))
    return F.when((na > 0) & (nb > 0), dot / (na * nb))


def array_iff(cond, when_true, when_false) -> Column:
    """KQL array_iff — element-wise conditional over a bool array.
    Branch arguments may be arrays (indexed per element) or scalars
    (python literals, broadcast)."""
    cnd = _c(cond)

    def norm(branch):
        # array (Column or literal list) → indexed per element;
        # python scalar → broadcast
        if isinstance(branch, Column):
            return branch, True
        if isinstance(branch, (list, tuple)):
            return F.array(*[F.lit(v) for v in branch]), True
        return F.lit(branch), False

    tcol, t_arr = norm(when_true)
    fcol, f_arr = norm(when_false)
    return F.transform(
        cnd,
        lambda c, i: F.when(
            c.cast("boolean"),
            F.element_at(tcol, i + 1) if t_arr else tcol,
        ).otherwise(F.element_at(fcol, i + 1) if f_arr else fcol),
    )


def regex_quote(x) -> Column:
    """KQL regex_quote — escape regex metacharacters so the result
    matches the input literally."""
    return F.regexp_replace(_c(x), r"([\\.^$|?*+()\[\]{}])", r"\\$1")


def _bag_loads(v):
    """Tolerant JSON-object parse of a dynamic bag cell (JSON text
    engine-wide; a pre-parsed dict passes through)."""
    import json

    if isinstance(v, dict):
        return v
    if isinstance(v, str) and v:
        try:
            d = json.loads(v)
        except ValueError:
            return None
        return d if isinstance(d, dict) else None
    return None


def bag_merge(b1, b2) -> Column:
    """KQL bag_merge — merge two property bags (JSON objects); on key
    conflict the FIRST bag wins (Kusto order). Arrow batch kernel over
    the canonical JSON text so values KEEP their JSON types (the old
    map<string,string> round-trip re-rendered every number/bool/nested
    value as a quoted string — r16 probe batch 18); row-local,
    shuffle-free."""

    @F.pandas_udf("string")
    def kern(s1: pd.Series, s2: pd.Series) -> pd.Series:
        import json

        out = []
        for v1, v2 in zip(s1, s2):
            d1, d2 = _bag_loads(v1), _bag_loads(v2)
            if d1 is None and d2 is None:
                out.append(None)
                continue
            merged = dict(d1 or {})
            for k, v in (d2 or {}).items():
                merged.setdefault(k, v)
            out.append(json.dumps(merged, separators=(",", ":")))
        return pd.Series(out, dtype=object)

    return kern(_c(b1), _c(b2))


def treepath(bag) -> Column:
    """KQL treepath — every path expression into a dynamic bag, in
    Kusto's bracket syntax: objects recurse per key (["['d']",
    "['d']['e']", …]); an array contributes one representative "[0]"
    path and recurses into its first element (the shape the Kusto docs
    example shows). Arbitrary-JSON recursion → Arrow batch kernel."""
    import pyspark.sql.types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def kern(s: pd.Series) -> pd.Series:
        import json

        def walk(v, prefix: str, out: list) -> None:
            if isinstance(v, dict):
                for k, sub in v.items():
                    p = f"{prefix}['{k}']"
                    out.append(p)
                    walk(sub, p, out)
            elif isinstance(v, list) and v:
                p = f"{prefix}[0]"
                out.append(p)
                walk(v[0], p, out)

        res = []
        for x in s:
            if x is None:
                res.append(None)
                continue
            try:
                v = json.loads(x) if isinstance(x, str) else x
            except (ValueError, TypeError):
                res.append([])
                continue
            paths: list = []
            walk(v, "", paths)
            res.append(paths)
        return pd.Series(res)

    return kern(_lit(bag))


def bag_remove_keys(bag, keys) -> Column:
    """KQL bag_remove_keys — drop the listed keys from a property bag.
    Arrow batch kernel preserving the values' JSON types (see
    bag_merge); `keys` may arrive as a real array column or as JSON
    text."""
    ks = _c(keys)
    if not isinstance(keys, Column):
        ks = ks.cast("array<string>")

    @F.pandas_udf("string")
    def kern(bags: pd.Series, keyss: pd.Series) -> pd.Series:
        import json

        out = []
        for b, k in zip(bags, keyss):
            d = _bag_loads(b)
            if d is None:
                out.append(None)
                continue
            if isinstance(k, str):
                try:
                    k = json.loads(k)
                except ValueError:
                    k = []
            drop = {str(x) for x in (list(k) if k is not None else [])}
            out.append(
                json.dumps(
                    {kk: vv for kk, vv in d.items() if kk not in drop},
                    separators=(",", ":"),
                )
            )
        return pd.Series(out, dtype=object)

    return kern(_c(bag), ks)


def geo_point_in_circle(lon, lat, center_lon, center_lat, radius_m) -> Column:
    """KQL geo_point_in_circle — haversine distance ≤ radius (meters)."""
    return geo_distance_2points(lon, lat, center_lon, center_lat) <= _c(
        radius_m
    ).cast("double")


def parse_csv(x) -> Column:
    """KQL parse_csv — split one CSV record into a string array,
    honoring double-quoted fields with '""' escapes. Pure JVM regex
    (one field per match: quoted run or bare run)."""
    fields = F.regexp_extract_all(
        _c(x), F.lit('(?:^|,)("(?:[^"]|"")*"|[^,]*)'), 1
    )

    def unquote(s):
        inner = s.substr(F.lit(2), F.length(s) - 2)
        return F.when(
            F.startswith(s, F.lit('"')) & F.endswith(s, F.lit('"'))
            & (F.length(s) >= 2),
            F.replace(inner, F.lit('""'), F.lit('"')),
        ).otherwise(s)

    return F.transform(fields, unquote)


def parse_kv(x, pair_delim: str = ";", kv_delim: str = "=") -> Column:
    """KQL parse_kv (simplified signature: text, pair_delim, kv_delim
    instead of Kusto's keys-projection form) — key=value runs → JSON
    property bag via str_to_map (single JVM expression)."""
    return F.to_json(
        F.str_to_map(_c(x), F.lit(pair_delim), F.lit(kv_delim))
    )


def totimespan_str(x) -> Column:
    """KQL totimespan over strings: '[-][d.]hh:mm:ss[.fff]' → seconds
    double (the engine's timespan representation); null on misparse —
    the roundtrip partner of format_timespan."""
    s = F.trim(_c(x).cast("string"))
    sign = F.when(F.startswith(s, F.lit("-")), -1.0).otherwise(1.0)
    b = F.regexp_replace(s, "^-", "")
    pat = r"^(?:(\d+)\.)?(\d{1,2}):(\d{1,2}):(\d{1,2}(?:\.\d+)?)$"
    d = F.regexp_extract(b, pat, 1)
    hh = F.regexp_extract(b, pat, 2)
    mm = F.regexp_extract(b, pat, 3)
    ss = F.regexp_extract(b, pat, 4)
    total = (
        F.when(d == "", 0.0).otherwise(d.cast("double")) * 86400
        + hh.cast("double") * 3600
        + mm.cast("double") * 60
        + ss.cast("double")
    )
    return F.when(b.rlike(pat), sign * total)


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geo_point_to_geohash(lng, lat, precision: int = 5) -> Column:
    """KQL geo_point_to_geohash: base-32 geohash of (lng, lat) at the
    given precision (1-12 chars). Pure JVM: quantize, Morton-interleave
    (unrolled bit sum — the z-order machinery, operators/zorder.py),
    then ONE base-32 render via conv()+translate (geohash's alphabet
    skips a/i/l/o) so the interleave expression is embedded once, not
    once per output char. Null for out-of-range/null coordinates."""
    p = int(precision)
    if not 1 <= p <= 12:
        raise ValueError("geohash precision must be in 1..12")
    n = 5 * p
    nlng, nlat = (n + 1) // 2, n // 2
    lngc, latc = _c(lng).cast("double"), _c(lat).cast("double")
    lngq = F.least(
        F.lit((1 << nlng) - 1).cast("long"),
        F.floor((lngc + 180.0) / 360.0 * float(1 << nlng)).cast("long"),
    )
    latq = F.least(
        F.lit((1 << nlat) - 1).cast("long"),
        F.floor((latc + 90.0) / 180.0 * float(1 << nlat)).cast("long"),
    )
    # interleave, lng first at the MSB: out-bit (n-1-2i) ← lng bit
    # (nlng-1-i); out-bit (n-2-2i) ← lat bit (nlat-1-i)
    code = F.lit(0).cast("long")
    for i in range(nlng):
        bit = F.shiftright(lngq, nlng - 1 - i).bitwiseAND(F.lit(1))
        code = code + F.shiftleft(bit, n - 1 - 2 * i)
    for i in range(nlat):
        bit = F.shiftright(latq, nlat - 1 - i).bitwiseAND(F.lit(1))
        code = code + F.shiftleft(bit, n - 2 - 2 * i)
    rendered = F.translate(
        F.lpad(F.lower(F.conv(code.cast("string"), 10, 32)), p, "0"),
        "abcdefghijklmnopqrstuv",
        "bcdefghjkmnpqrstuvwxyz",
    )
    valid = (
        lngc.isNotNull() & latc.isNotNull()
        & lngc.between(-180.0, 180.0) & latc.between(-90.0, 90.0)
    )
    return F.when(valid, rendered)


def geo_geohash_to_central_point(gh) -> Column:
    """KQL geo_geohash_to_central_point: center of the geohash cell as
    struct(lng double, lat double) (KQL returns GeoJSON dynamic; wrap
    with to_json for the wire shape). Variable precision handled
    row-locally with higher-order functions: char→5-bit values via a
    literal map, then a per-CHAR de-interleaving fold (even chars give
    lng 3 bits/lat 2, odd chars the reverse) — small-int arithmetic
    only, no 60-bit intermediates, no UDF. Null for empty/invalid."""
    g = _c(gh)
    cmap = F.create_map(
        *[x for ch, v in ((c, i) for i, c in enumerate(_GEOHASH32))
          for x in (F.lit(ch), F.lit(v))]
    )
    pairs = F.transform(
        F.split(g, ""),
        lambda ch, i: F.struct(
            F.element_at(cmap, ch).cast("long").alias("v"), i.alias("c")
        ),
    )
    acc0 = F.struct(
        F.lit(0).cast("long").alias("lngq"), F.lit(0).cast("long").alias("latq")
    )

    def step(acc, p):
        v, c = p["v"], p["c"]
        b4, b3 = F.floor(v / 16) % 2, F.floor(v / 8) % 2
        b2, b1, b0 = F.floor(v / 4) % 2, F.floor(v / 2) % 2, v % 2
        even = c % 2 == 0
        return F.struct(
            F.when(even, acc["lngq"] * 8 + b4 * 4 + b2 * 2 + b0)
            .otherwise(acc["lngq"] * 4 + b3 * 2 + b1)
            .alias("lngq"),
            F.when(even, acc["latq"] * 4 + b3 * 2 + b1)
            .otherwise(acc["latq"] * 8 + b4 * 4 + b2 * 2 + b0)
            .alias("latq"),
        )

    unz = F.aggregate(pairs, acc0, step)
    n = F.length(g) * 5
    nlng = F.floor((n + 1) / 2)
    nlat = n - nlng
    lng = (unz["lngq"] + 0.5) / F.pow(F.lit(2.0), nlng.cast("double")) * 360.0 - 180.0
    lat = (unz["latq"] + 0.5) / F.pow(F.lit(2.0), nlat.cast("double")) * 180.0 - 90.0
    valid = (
        g.isNotNull() & (F.length(g) > 0) & (F.length(g) <= 12)
        & F.forall(F.split(g, ""), lambda ch: F.element_at(cmap, ch).isNotNull())
    )
    return F.when(valid, F.struct(lng.alias("lng"), lat.alias("lat")))


def strcmp(a, b) -> Column:
    """KQL strcmp: ordinal comparison → -1/0/1 (Spark string compare is
    binary UTF-8 — the same ordinal order). Null if either side null."""
    x, y = _c(a), _c(b)
    return (
        F.when(x.isNull() | y.isNull(), F.lit(None).cast("int"))
        .when(x < y, F.lit(-1))
        .when(x > y, F.lit(1))
        .otherwise(F.lit(0))
    )


def bitset_count_ones(x) -> Column:
    """KQL bitset_count_ones: population count of the 64-bit value."""
    return F.bit_count(_c(x).cast("long")).cast("long")


def base64_decode_toarray(s) -> Column:
    """KQL base64_decode_toarray: base-64 → array<long> of bytes.
    JVM-only path: unbase64 → hex → fixed 2-char slices → conv(16,10);
    invalid input (bad alphabet / length) yields null rather than an
    ANSI error (KQL null-on-invalid convention)."""
    c = _c(s)
    valid = c.rlike("^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$")
    h = F.hex(F.unbase64(c))
    arr = F.transform(
        F.sequence(F.lit(1), (F.length(h) / 2).cast("int")),
        lambda i: F.conv(F.substring(h, i * 2 - 1, F.lit(2)), 16, 10).cast("long"),
    )
    return F.when(c.isNotNull() & valid, arr)


def parse_ipv6(ip) -> Column:
    """KQL parse_ipv6: canonical form — 8 lowercase zero-padded hextets
    ('2001:0db8:0000:...:0001'). Handles '::' compression, an embedded
    dotted-quad tail (v4-mapped addresses), and plain IPv4 input
    (mapped to ::ffff:a.b.c.d, Kusto's convention). Null on invalid.
    All JVM array/string expressions — split, HOF filter/transform,
    one concat — no UDF."""
    raw = F.lower(F.trim(_c(ip)))
    # plain IPv4 → v4-mapped
    is_v4 = raw.rlike(r"^[0-9.]+$")
    s = F.when(is_v4, F.concat(F.lit("::ffff:"), raw)).otherwise(raw)
    # dotted-quad tail → two hextets
    v4tail = F.regexp_extract(s, r"([0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3})$", 1)
    v4long = ipv4_to_long(v4tail)
    tailhex = F.concat(
        F.lpad(F.lower(F.conv(F.shiftright(v4long, 16).cast("string"), 10, 16)), 4, "0"),
        F.lit(":"),
        F.lpad(F.lower(F.conv((v4long % 65536).cast("string"), 10, 16)), 4, "0"),
    )
    s = F.when(
        (v4tail != "") & v4long.isNotNull(),
        F.concat(F.regexp_replace(s, r"[0-9.]+$", ""), tailhex),
    ).otherwise(s)
    dc = F.split(s, "::", -1)
    n_dc = F.size(dc)

    def hextets(part):
        return F.filter(F.split(part, ":"), lambda x: x != "")

    left = hextets(F.element_at(dc, 1))
    right = F.when(n_dc == 2, hextets(F.element_at(dc, 2))).otherwise(
        F.array().cast("array<string>")
    )
    pad = F.when(
        n_dc == 2, F.array_repeat(F.lit("0"), 8 - F.size(left) - F.size(right))
    ).otherwise(F.array().cast("array<string>"))
    groups = F.concat(left, pad, right)
    ok = (
        s.isNotNull()
        & n_dc.between(1, 2)
        & (F.size(groups) == 8)
        & F.forall(groups, lambda g: g.rlike("^[0-9a-f]{1,4}$"))
        & F.when(n_dc == 1, ~s.contains("::")).otherwise(F.lit(True))
    )
    canon = F.array_join(F.transform(groups, lambda g: F.lpad(g, 4, "0")), ":")
    return F.when(ok, canon)


def ipv6_compare(a, b) -> Column:
    """KQL ipv6_compare: -1/0/1 over the 128-bit values (accepts IPv4
    input via the v4-mapped form). Canonical fixed-width lowercase hex
    makes string order == numeric order, so this is one compare."""
    ca, cb = parse_ipv6(a), parse_ipv6(b)
    return (
        F.when(ca.isNull() | cb.isNull(), F.lit(None).cast("int"))
        .when(ca < cb, F.lit(-1))
        .when(ca > cb, F.lit(1))
        .otherwise(F.lit(0))
    )


def ipv6_is_match(a, b, prefix=128) -> Column:
    """KQL ipv6_is_match: equality of the first `prefix` bits (default
    128). Hextets are masked per 16-bit group — bit i of group g is
    covered when prefix > 16*g + i — pure arithmetic over the zipped
    canonical groups."""
    pfx = _c(prefix).cast("int") if not isinstance(prefix, int) else F.lit(prefix)
    ca, cb = parse_ipv6(a), parse_ipv6(b)

    def groups(c):
        return F.transform(
            F.split(c, ":"), lambda g: F.conv(g, 16, 10).cast("long")
        )

    idx = F.sequence(F.lit(0), F.lit(7))
    matched = F.zip_with(
        F.zip_with(groups(ca), groups(cb), lambda x, y: F.struct(x.alias("x"), y.alias("y"))),
        idx,
        lambda p, i: F.struct(p["x"].alias("x"), p["y"].alias("y"), i.alias("i")),
    )
    per_group = F.forall(
        matched,
        lambda t: (
            F.floor(
                t["x"]
                / F.pow(
                    F.lit(2.0),
                    F.greatest(
                        F.lit(0.0),
                        F.least(F.lit(16.0), (16.0 - (pfx - 16 * t["i"])).cast("double")),
                    ),
                )
            )
            == F.floor(
                t["y"]
                / F.pow(
                    F.lit(2.0),
                    F.greatest(
                        F.lit(0.0),
                        F.least(F.lit(16.0), (16.0 - (pfx - 16 * t["i"])).cast("double")),
                    ),
                )
            )
        ),
    )
    return F.when(ca.isNotNull() & cb.isNotNull() & pfx.between(0, 128), per_group)


def ipv4_netmask_suffix(cidr) -> Column:
    """KQL ipv4_netmask_suffix — the prefix length of 'a.b.c.d/p'
    (missing suffix ⇒ 32); null when the address part is malformed or
    the suffix is outside 0..32."""
    c = _c(cidr)
    base = F.when(c.contains("/"), F.substring_index(c, "/", 1)).otherwise(c)
    bits = F.when(
        c.contains("/"), F.substring_index(c, "/", -1).try_cast("int")
    ).otherwise(F.lit(32))
    return F.when(ipv4_to_long(base).isNotNull() & bits.between(0, 32), bits)


def format_ipv4_mask(ip, prefix) -> Column:
    """KQL format_ipv4_mask — the network base of `ip` under `prefix`
    in CIDR notation ('192.168.1.0/24'). Accepts dotted-quad or
    numeric input; null on malformed input or prefix outside 0..32."""
    pfx = _c(prefix).cast("int")
    ipc = _c(ip)
    v = F.when(
        ipc.cast("string").rlike("^[0-9]+$"), ipc.cast("long")
    ).otherwise(ipv4_to_long(ipc))
    p = F.pow(F.lit(2.0), (32 - pfx).cast("double"))
    masked = (F.floor(v / p) * p).cast("long")
    return F.when(
        v.isNotNull() & pfx.between(0, 32),
        F.concat(format_ipv4(masked), F.lit("/"), pfx.cast("string")),
    )


def ipv4_is_in_any_range(ip, ranges) -> Column:
    """KQL ipv4_is_in_any_range — true when `ip` falls in ANY of the
    CIDR ranges (array column or list literal); null when `ip` itself
    is malformed, false when it merely matches nothing (Kusto's
    contract)."""
    arr = (
        F.array(*[F.lit(r) for r in ranges])
        if isinstance(ranges, (list, tuple))
        else _c(ranges)
    )
    hit = F.exists(arr, lambda r: F.coalesce(ipv4_is_in_range(ip, r), F.lit(False)))
    return F.when(ipv4_to_long(ip).isNotNull(), hit)


def ipv6_is_in_range(ip, cidr) -> Column:
    """KQL ipv6_is_in_range — ip within 'addr/prefix' (missing prefix
    ⇒ /128). Accepts v4-mapped and plain-IPv4 input like parse_ipv6."""
    c = _c(cidr)
    base = F.when(c.contains("/"), F.substring_index(c, "/", 1)).otherwise(c)
    bits = F.when(
        c.contains("/"), F.substring_index(c, "/", -1).try_cast("int")
    ).otherwise(F.lit(128))
    return F.when(
        bits.between(0, 128), ipv6_is_match(ip, base, bits)
    )


def ipv6_is_in_any_range(ip, ranges) -> Column:
    """KQL ipv6_is_in_any_range — any-of over IPv6 CIDR ranges; null
    when `ip` is malformed."""
    arr = (
        F.array(*[F.lit(r) for r in ranges])
        if isinstance(ranges, (list, tuple))
        else _c(ranges)
    )
    hit = F.exists(arr, lambda r: F.coalesce(ipv6_is_in_range(ip, r), F.lit(False)))
    return F.when(parse_ipv6(ip).isNotNull(), hit)


def ipv4_range_to_cidr_list(start, end) -> Column:
    """KQL ipv4_range_to_cidr_list — minimal CIDR cover of [start, end]
    (greedy largest-aligned-block, the classic algorithm). The loop is
    data-dependent (≤ 64 blocks), so this is an Arrow kernel — row-
    local, no shuffle; null on malformed input or start > end."""
    from pyspark.sql import types as T

    def to_long(s):
        try:
            parts = [int(p) for p in str(s).strip().split(".")]
            if len(parts) != 4 or any(p < 0 or p > 255 for p in parts):
                return None
            return (parts[0] << 24) | (parts[1] << 16) | (parts[2] << 8) | parts[3]
        except (ValueError, AttributeError):
            return None

    def fmt(v):
        return f"{(v >> 24) & 255}.{(v >> 16) & 255}.{(v >> 8) & 255}.{v & 255}"

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def cover(s1: pd.Series, s2: pd.Series) -> pd.Series:
        out = []
        for a, b in zip(s1, s2):
            lo, hi = to_long(a), to_long(b)
            if lo is None or hi is None or lo > hi:
                out.append(None)
                continue
            cidrs = []
            while lo <= hi:
                # largest block aligned at lo that fits within [lo, hi]
                max_align = (lo & -lo).bit_length() - 1 if lo else 32
                max_fit = (hi - lo + 1).bit_length() - 1
                size = min(max_align, max_fit)
                cidrs.append(f"{fmt(lo)}/{32 - size}")
                lo += 1 << size
            out.append(cidrs)
        return pd.Series(out)

    return cover(_c(start), _c(end))


def _codec_kernel(mode: str):
    """Arrow kernels for KQL's compression string functions. zlib/gzip
    bytes are produced with level 6 and (for gzip) mtime=0 so the
    output is deterministic across runs/executors — required for the
    engine's reproducibility contract. Row-local, shuffle-free."""
    import gzip as _gzip
    import zlib as _zlib
    import base64 as _b64

    def enc_zlib(s: str) -> str:
        return _b64.b64encode(_zlib.compress(s.encode("utf-8"), 6)).decode("ascii")

    def dec_zlib(s: str):
        try:
            return _zlib.decompress(_b64.b64decode(s, validate=True)).decode("utf-8")
        except Exception:  # noqa: BLE001 — Kusto yields empty on bad input
            return ""

    def enc_gzip(s: str) -> str:
        return _b64.b64encode(
            _gzip.compress(s.encode("utf-8"), compresslevel=6, mtime=0)
        ).decode("ascii")

    def dec_gzip(s: str):
        try:
            return _gzip.decompress(_b64.b64decode(s, validate=True)).decode("utf-8")
        except Exception:  # noqa: BLE001
            return ""

    fn = {
        "zc": enc_zlib,
        "zd": dec_zlib,
        "gc": enc_gzip,
        "gd": dec_gzip,
    }[mode]

    @F.pandas_udf("string")
    def kern(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else fn(v))

    return kern


def zlib_compress_to_base64_string(text) -> Column:
    """KQL zlib_compress_to_base64_string (deterministic level-6
    deflate)."""
    return _codec_kernel("zc")(_c(text))


def zlib_decompress_from_base64_string(text) -> Column:
    """KQL zlib_decompress_from_base64_string — '' on invalid input
    (Kusto's contract)."""
    return _codec_kernel("zd")(_c(text))


def gzip_compress_to_base64_string(text) -> Column:
    """KQL gzip_compress_to_base64_string (level 6, mtime pinned to 0
    for reproducibility)."""
    return _codec_kernel("gc")(_c(text))


def gzip_decompress_from_base64_string(text) -> Column:
    """KQL gzip_decompress_from_base64_string — '' on invalid input."""
    return _codec_kernel("gd")(_c(text))


# ---------------------------------------------------------- special math
# Lanczos / Abramowitz-Stegun approximations as pure JVM expressions —
# the classic public-domain coefficient sets. Accuracy: loggamma ~1e-13
# relative (g=7, 9 terms), erf ≤ 1.5e-7 absolute (A&S 7.1.26) —
# documented as approximations; known-answer pytest vs python math.

_LANCZOS_G = 7.0
_LANCZOS_C = [
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
]


def _lgamma_pos(x: Column) -> Column:
    """log Γ(x) for x > 0.5 (Lanczos g=7)."""
    z = x - 1.0
    base = z + _LANCZOS_G + 0.5
    s = F.lit(_LANCZOS_C[0])
    for i, c in enumerate(_LANCZOS_C[1:], start=1):
        s = s + F.lit(c) / (z + float(i))
    return (
        F.lit(0.9189385332046727)  # 0.5*log(2*pi)
        + (z + 0.5) * F.log(base)
        - base
        + F.log(s)
    )


def loggamma(x) -> Column:
    """KQL loggamma — log |Γ(x)|; null at non-positive integers (poles).
    Reflection formula below 0.5."""
    v = _c(x).cast("double")
    pole = (v <= 0) & (v == F.floor(v))
    refl = (
        F.log(F.lit(3.141592653589793))
        - F.log(F.abs(F.sin(F.lit(3.141592653589793) * v)))
        - _lgamma_pos(1.0 - v)
    )
    return F.when(~pole, F.when(v >= 0.5, _lgamma_pos(v)).otherwise(refl))


def gamma(x) -> Column:
    """KQL gamma — Γ(x) with sign handled via the reflection formula;
    null at the poles."""
    v = _c(x).cast("double")
    pole = (v <= 0) & (v == F.floor(v))
    pos = F.exp(_lgamma_pos(v))
    refl = F.lit(3.141592653589793) / (
        F.sin(F.lit(3.141592653589793) * v) * F.exp(_lgamma_pos(1.0 - v))
    )
    return F.when(~pole, F.when(v >= 0.5, pos).otherwise(refl))


def erf(x) -> Column:
    """KQL erf — A&S 7.1.26 rational approximation (|err| ≤ 1.5e-7),
    odd-extended via sign."""
    v = _c(x).cast("double")
    a = F.abs(v)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = (
        t
        * (
            F.lit(0.254829592)
            + t
            * (
                F.lit(-0.284496736)
                + t * (F.lit(1.421413741) + t * (F.lit(-1.453152027) + t * 1.061405429))
            )
        )
    )
    mag = 1.0 - poly * F.exp(-(a * a))
    return F.signum(v) * mag


def erfc(x) -> Column:
    """KQL erfc = 1 − erf(x)."""
    return 1.0 - erf(x)


def _betacf(a: float, b: float, x: float) -> float:
    """Lentz continued fraction for the regularized incomplete beta
    (classic Numerical-Recipes-style public algorithm) — shared by
    welch_test and the beta_* distribution kernels."""
    import math  # noqa: F401 — parity with _ibeta's imports

    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 200):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 3e-15:
            break
    return h


def _ibeta(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    import math

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    front = math.exp(ln)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def welch_test(mean1, var1, count1, mean2, var2, count2) -> Column:
    """KQL welch_test — two-sided p-value of Welch's unequal-variance
    t-test from the six summary statistics. The t statistic and
    Satterthwaite df are JVM expressions; the Student-t CDF needs the
    regularized incomplete beta, evaluated in an Arrow kernel with the
    standard Lentz continued fraction (row-local)."""
    m1, v1 = _c(mean1).cast("double"), _c(var1).cast("double")
    m2, v2 = _c(mean2).cast("double"), _c(var2).cast("double")
    n1, n2 = _c(count1).cast("double"), _c(count2).cast("double")
    se1, se2 = v1 / n1, v2 / n2
    tstat = (m1 - m2) / F.sqrt(se1 + se2)
    df = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0)
    )

    @F.pandas_udf("double")
    def pval(ts: pd.Series, dfs: pd.Series) -> pd.Series:
        out = []
        for t, d in zip(ts, dfs):
            if t is None or d is None or not (d > 0):
                out.append(None)
                continue
            x = d / (d + t * t)
            out.append(round(_ibeta(d / 2.0, 0.5, x), 10))
        return pd.Series(out)

    return pval(tstat, df)


# ------------------------------------------------------------- geo shapes
def _geojson_ring(poly) -> Column:
    """Outer ring of a GeoJSON Polygon carried as the engine's dynamic
    (JSON string): array of [lng, lat] points."""
    coords = F.from_json(
        _c(poly), "struct<type:string, coordinates:array<array<array<double>>>>"
    )
    return F.element_at(coords["coordinates"], 1)


def geo_point_in_polygon(lng, lat, polygon) -> Column:
    """KQL geo_point_in_polygon — even-odd ray casting over the
    polygon's outer ring, all JVM HOFs (zip consecutive vertices →
    count crossings → parity). Planar edges (lng/lat treated as a
    plane) — a documented delta from Kusto's spherical geodesics,
    accurate for the small, antimeridian-free polygons these gates
    use. Null when the polygon JSON is malformed."""
    x, y = _c(lng).cast("double"), _c(lat).cast("double")
    ring = _geojson_ring(polygon)
    n = F.size(ring)
    # drop an explicit closing vertex (GeoJSON rings repeat the first)
    open_ring = F.when(
        (n > 1)
        & (F.element_at(ring, 1)[0] == F.element_at(ring, -1)[0])
        & (F.element_at(ring, 1)[1] == F.element_at(ring, -1)[1]),
        F.slice(ring, 1, n - 1),
    ).otherwise(ring)
    m = F.size(open_ring)
    nxt = F.concat(F.slice(open_ring, 2, m - 1), F.slice(open_ring, 1, 1))
    edges = F.zip_with(
        open_ring, nxt, lambda p, q: F.struct(
            p[0].alias("x1"), p[1].alias("y1"), q[0].alias("x2"), q[1].alias("y2")
        )
    )
    crossings = F.size(
        F.filter(
            edges,
            lambda e: ((e["y1"] > y) != (e["y2"] > y))
            & (
                x
                < (e["x2"] - e["x1"]) * (y - e["y1"])
                / (e["y2"] - e["y1"])
                + e["x1"]
            ),
        )
    )
    return F.when(m >= 3, crossings % 2 == 1)


def geo_line_length(line) -> Column:
    """KQL geo_line_length — meters along a GeoJSON LineString: sum of
    haversine segment lengths (same kernel as geo_distance_2points),
    folded left-to-right over consecutive vertex pairs. Null on
    malformed input; 0.0 for a single-point line."""
    coords = F.from_json(
        _c(line), "struct<type:string, coordinates:array<array<double>>>"
    )["coordinates"]
    n = F.size(coords)
    nxt = F.slice(coords, 2, n - 1)
    prev = F.slice(coords, 1, n - 1)
    segs = F.zip_with(
        prev, nxt, lambda p, q: geo_distance_2points(p[0], p[1], q[0], q[1])
    )
    total = F.aggregate(segs, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(n >= 1, total)


def datetime_utc_to_local(ts, tz) -> Column:
    """KQL datetime_utc_to_local — wall-clock time of a UTC instant in
    the IANA zone `tz` (JVM tzdb; DST-aware). The engine's datetimes
    are naive-UTC, so the result is a naive local timestamp."""
    return F.from_utc_timestamp(_c(ts), _c(tz) if isinstance(tz, Column) else tz)


def datetime_local_to_utc(ts, tz) -> Column:
    """KQL datetime_local_to_utc — UTC instant of a wall-clock reading
    in `tz` (inverse of datetime_utc_to_local up to DST folds)."""
    return F.to_utc_timestamp(_c(ts), _c(tz) if isinstance(tz, Column) else tz)


_UA_BROWSERS = [
    ("Edge", r"Edg(?:e|A|iOS)?/([0-9.]+)"),
    ("Opera", r"OPR/([0-9.]+)"),
    ("Chrome", r"Chrome/([0-9.]+)"),
    ("Firefox", r"Firefox/([0-9.]+)"),
    ("Safari", r"Version/([0-9.]+).*Safari"),
    ("IE", r"MSIE ([0-9.]+)"),
]
_UA_OS = [
    ("Windows", r"Windows NT ([0-9.]+)"),
    ("iOS", r"(?:iPhone|iPad).*? OS ([0-9_]+)"),
    ("macOS", r"Mac OS X ([0-9_.]+)"),
    ("Android", r"Android ([0-9.]+)"),
    ("Linux", r"(Linux)"),
]


def parse_user_agent(ua) -> Column:
    """parse_user_agent (lite): browser family+version and OS
    family+version from the classic token patterns — the documented
    subset of Kusto's parser (which carries a large device DB). One
    chained regexp_extract per family, pure codegen; returns a struct
    (browser, browser_version, os, os_version), families 'Other' when
    nothing matches. Order encodes precedence (Edge before Chrome,
    Chrome before Safari) exactly as real UA strings require."""
    c = _c(ua)
    browser = F.lit("Other")
    bver = F.lit(None).cast("string")
    for name, pat in reversed(_UA_BROWSERS):
        hit = F.regexp_extract(c, pat, 1)
        browser = F.when(hit != "", F.lit(name)).otherwise(browser)
        bver = F.when(hit != "", hit).otherwise(bver)
    osname = F.lit("Other")
    over = F.lit(None).cast("string")
    for name, pat in reversed(_UA_OS):
        hit = F.regexp_extract(c, pat, 1)
        osname = F.when(hit != "", F.lit(name)).otherwise(osname)
        over = F.when(
            hit != "", F.regexp_replace(hit, "_", ".")
        ).otherwise(over)
    over = F.when(osname == "Linux", F.lit(None).cast("string")).otherwise(over)
    return F.struct(
        browser.alias("browser"),
        bver.alias("browser_version"),
        osname.alias("os"),
        over.alias("os_version"),
    )


# --------------------------------------------------------- unit converts
# KQL convert_* family. Unit names follow Kusto's docs; conversions are
# one JVM multiply by a Python-precomputed factor (temperature is the
# affine exception). Unknown units raise at plan time with the valid
# list — never a silent null.

_UNIT_TABLES: dict[str, dict[str, float]] = {
    "length": {  # base meter
        "Angstrom": 1e-10, "Nanometer": 1e-9, "Micrometer": 1e-6,
        "Millimeter": 1e-3, "Centimeter": 1e-2, "Decimeter": 0.1,
        "Meter": 1.0, "Decameter": 10.0, "Hectometer": 100.0,
        "Kilometer": 1000.0, "Inch": 0.0254, "Foot": 0.3048,
        "Yard": 0.9144, "Mile": 1609.344, "NauticalMile": 1852.0,
        "AstronomicalUnit": 149597870700.0,
    },
    "mass": {  # base kilogram
        "Microgram": 1e-9, "Milligram": 1e-6, "Gram": 1e-3,
        "Kilogram": 1.0, "Tonne": 1000.0, "Ounce": 0.028349523125,
        "Pound": 0.45359237, "Stone": 6.35029318,
        "ShortTon": 907.18474, "LongTon": 1016.0469088,
    },
    "speed": {  # base meter/second
        "MeterPerSecond": 1.0, "KilometerPerHour": 1000.0 / 3600.0,
        "MilePerHour": 0.44704, "Knot": 1852.0 / 3600.0,
        "FootPerSecond": 0.3048,
    },
    "energy": {  # base joule
        "Joule": 1.0, "Kilojoule": 1e3, "Megajoule": 1e6,
        "Calorie": 4.184, "Kilocalorie": 4184.0, "WattHour": 3600.0,
        "KilowattHour": 3.6e6, "BritishThermalUnit": 1055.05585262,
        "Electronvolt": 1.602176634e-19,
    },
    "angle": {  # base radian
        "Radian": 1.0, "Degree": 0.017453292519943295,
        "Gradian": 0.015707963267948967, "Revolution": 6.283185307179586,
        "Arcminute": 0.0002908882086657216,
        "Arcsecond": 4.84813681109536e-06,
    },
    "force": {  # base newton
        "Newton": 1.0, "Kilonewton": 1000.0,
        "PoundForce": 4.4482216152605, "KilogramForce": 9.80665,
        "Dyne": 1e-5,
    },
    "volume": {  # base cubic meter
        "CubicMeter": 1.0, "Liter": 1e-3, "Milliliter": 1e-6,
        "CubicFoot": 0.028316846592, "CubicInch": 1.6387064e-5,
        "UsGallon": 0.003785411784, "ImperialGallon": 0.00454609,
    },
}


def _convert_factor(kind: str, from_unit: str, to_unit: str) -> float:
    table = _UNIT_TABLES[kind]
    for u in (from_unit, to_unit):
        if u not in table:
            raise ValueError(
                f"convert_{kind}: unknown unit {u!r} "
                f"(expected one of {sorted(table)})"
            )
    return table[from_unit] / table[to_unit]


def _make_convert(kind: str):
    def conv(value, from_unit: str, to_unit: str) -> Column:
        return _c(value).cast("double") * F.lit(_convert_factor(kind, from_unit, to_unit))

    conv.__name__ = f"convert_{kind}"
    conv.__doc__ = (
        f"KQL convert_{kind}(value, from_unit, to_unit) — one multiply "
        "by a plan-time factor; unknown units raise at plan time."
    )
    return conv


convert_length = _make_convert("length")
convert_mass = _make_convert("mass")
convert_speed = _make_convert("speed")
convert_energy = _make_convert("energy")
convert_angle = _make_convert("angle")
convert_force = _make_convert("force")
convert_volume = _make_convert("volume")


def convert_temperature(value, from_unit: str, to_unit: str) -> Column:
    """KQL convert_temperature — affine Kelvin/Celsius/Fahrenheit."""
    v = _c(value).cast("double")
    to_k = {
        "Kelvin": lambda x: x,
        "DegreeCelsius": lambda x: x + 273.15,
        "DegreeFahrenheit": lambda x: (x - 32.0) * (5.0 / 9.0) + 273.15,
    }
    from_k = {
        "Kelvin": lambda k: k,
        "DegreeCelsius": lambda k: k - 273.15,
        "DegreeFahrenheit": lambda k: (k - 273.15) * 1.8 + 32.0,
    }
    for u in (from_unit, to_unit):
        if u not in to_k:
            raise ValueError(
                f"convert_temperature: unknown unit {u!r} "
                f"(expected one of {sorted(to_k)})"
            )
    return from_k[to_unit](to_k[from_unit](v))


def beta_pdf(x, a, b) -> Column:
    """KQL beta_pdf — x^(a−1)(1−x)^(b−1)/B(a,b), computed through the
    log domain with the Lanczos loggamma: PURE codegen (no kernel).
    Null outside (0,1) boundaries where the density is undefined for
    a<1/b<1; 0 at the boundaries otherwise."""
    xv = _c(x).cast("double")
    av, bv = _c(a).cast("double"), _c(b).cast("double")
    ln = (
        (av - 1.0) * F.log(xv)
        + (bv - 1.0) * F.log(1.0 - xv)
        + _lgamma_pos(av + bv)
        - _lgamma_pos(av)
        - _lgamma_pos(bv)
    )
    inside = (xv > 0) & (xv < 1)
    at_edge = (xv == 0) | (xv == 1)
    return (
        F.when(inside, F.exp(ln))
        .when(at_edge & (av >= 1) & (bv >= 1), F.lit(0.0))
    )


def _beta_kernel(mode: str):
    @F.pandas_udf("double")
    def kern(xs: pd.Series, aas: pd.Series, bs: pd.Series) -> pd.Series:
        out = []
        for x, a, b in zip(xs, aas, bs):
            if x is None or a is None or b is None or a <= 0 or b <= 0:
                out.append(None)
                continue
            if mode == "cdf":
                if x < 0 or x > 1:
                    out.append(None)
                    continue
                out.append(_ibeta(float(a), float(b), float(x)))
            else:  # inv
                p = float(x)
                if p < 0 or p > 1:
                    out.append(None)
                    continue
                lo, hi = 0.0, 1.0
                for _ in range(80):  # bisection: 2^-80 < 1 ulp
                    mid = 0.5 * (lo + hi)
                    if _ibeta(float(a), float(b), mid) < p:
                        lo = mid
                    else:
                        hi = mid
                out.append(0.5 * (lo + hi))
        return pd.Series(out, dtype="float64")

    return kern


def beta_cdf(x, a, b) -> Column:
    """KQL beta_cdf — regularized incomplete beta I_x(a,b); Arrow
    kernel (Lentz continued fraction), row-local."""
    return _beta_kernel("cdf")(
        _c(x).cast("double"), _c(a).cast("double"), _c(b).cast("double")
    )


def beta_inv(p, a, b) -> Column:
    """KQL beta_inv — inverse beta CDF by bisection on I_x(a,b)
    (80 halvings → full double precision); Arrow kernel."""
    return _beta_kernel("inv")(
        _c(p).cast("double"), _c(a).cast("double"), _c(b).cast("double")
    )


def toguid(x) -> Column:
    """KQL toguid — canonical lowercase 8-4-4-4-12 GUID, null on
    malformed input (accepts braces and uppercase)."""
    t = F.lower(F.regexp_replace(F.trim(_c(x)), "[{}]", ""))
    ok = t.rlike(
        "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
    )
    return F.when(ok, t)


def startofquarter(ts, offset: int = 0) -> Column:
    """KQL startofquarter (+ optional quarter offset)."""
    base = F.date_trunc("quarter", _c(ts))
    if offset:
        base = F.date_trunc(
            "quarter", F.add_months(base, 3 * int(offset)).cast("timestamp")
        )
    return base


def endofquarter(ts, offset: int = 0) -> Column:
    """KQL endofquarter — last µs of the (offset-shifted) quarter."""
    start = startofquarter(ts, offset)
    return (
        F.add_months(start, 3).cast("timestamp")
        - F.expr("INTERVAL 1 MICROSECOND")
    )


def datetime_diff_boundaries(part: str, dt1, dt2) -> Column:
    """KQL datetime_diff — the number of PERIOD BOUNDARIES crossed
    between dt2 and dt1 (Kusto's calendrical semantics: one day apart
    across New Year is year-diff 1), NOT elapsed whole periods
    (Spark's timestamp_diff). Calendar parts difference truncated
    period indexes; clock parts difference unit-truncated instants."""
    p = part.strip("'\"").lower()
    a, b = _c(dt1), _c(dt2)
    if p == "year":
        return (F.year(a) - F.year(b)).cast("long")
    if p == "quarter":
        return (
            (F.year(a) * 4 + F.quarter(a)) - (F.year(b) * 4 + F.quarter(b))
        ).cast("long")
    if p == "month":
        return (
            (F.year(a) * 12 + F.month(a)) - (F.year(b) * 12 + F.month(b))
        ).cast("long")
    if p == "week":
        # Sunday-aligned week starts (KQL weeks)
        return (F.datediff(startofweek(a), startofweek(b)) / 7).cast("long")
    if p == "day":
        return F.datediff(a, b).cast("long")
    if p in ("hour", "minute", "second"):
        ta, tb = F.date_trunc(p, a), F.date_trunc(p, b)
        return F.timestamp_diff(p, tb, ta).cast("long")
    if p in ("millisecond", "microsecond"):
        scale = 1000 if p == "millisecond" else 1
        return ((F.unix_micros(a) // scale) - (F.unix_micros(b) // scale)).cast(
            "long"
        )
    raise ValueError(f"datetime_diff: unsupported part {part!r}")


# ---------------------------------------------------------------- round 7
def make_timespan(*parts) -> Column:
    """KQL make_timespan — (hour, minute) / (hour, minute, second) /
    (day, hour, minute, second) → timespan (the engine's seconds-double
    representation, same as totimespan)."""
    cols = [_c(p).cast("double") for p in parts]
    if len(cols) == 2:
        d, h, m, s = F.lit(0.0), cols[0], cols[1], F.lit(0.0)
    elif len(cols) == 3:
        d, h, m, s = F.lit(0.0), cols[0], cols[1], cols[2]
    elif len(cols) == 4:
        d, h, m, s = cols
    else:
        raise ValueError("make_timespan takes 2-4 arguments")
    return d * 86400.0 + h * 3600.0 + m * 60.0 + s


def unixtime_milliseconds_todatetime(x) -> Column:
    """Epoch milliseconds (int or real) → datetime (µs precision).
    DECIMAL arithmetic, not double: epoch-scale integers exceed
    float64's exact-integer range, so a double round-trip could shift
    the microsecond."""
    return F.timestamp_micros(
        F.floor(_c(x).cast("decimal(31,7)") * 1000).cast("long")
    )


def unixtime_microseconds_todatetime(x) -> Column:
    return F.timestamp_micros(_c(x).cast("long"))


def unixtime_nanoseconds_todatetime(x) -> Column:
    """Epoch nanoseconds → datetime; sub-µs digits are truncated
    (engine datetime precision is µs — SURVEY-sanctioned delta).
    DECIMAL division keeps the integer nanos exact (float64 is ~128 ns
    off at 2019 epoch scale)."""
    return F.timestamp_micros(
        F.floor(_c(x).cast("decimal(28,0)") / 1000).cast("long")
    )


def bag_has_key(bag, key) -> Column:
    """KQL bag_has_key — TOP-LEVEL key presence in a property bag
    (JSON object). Kusto also accepts '$.a.b' JSONPath keys; the
    nested form is served by get_json_object when the key starts with
    '$' (presence = non-null leaf, a documented subset: a null-valued
    nested key reads as absent)."""
    k = _c(key) if isinstance(key, Column) else F.lit(key)
    top = F.array_contains(F.coalesce(bag_keys(bag), F.array()), k)
    if not isinstance(key, Column) and str(key).startswith("$"):
        return F.get_json_object(_c(bag), str(key)).isNotNull()
    return top


def bag_set_key(bag, key, value) -> Column:
    """KQL bag_set_key — upsert a TOP-LEVEL key: merge semantics where
    the (key, value) pair wins over the existing bag entry
    (bag_merge keeps the FIRST bag's key on conflict, so packing the
    new pair first implements the upsert). Values keep their JSON
    types (the r16 bag_merge convention)."""
    return bag_merge(pack(key, value), _c(bag))


def hash_sha1(x) -> Column:
    return F.sha1(_c(x).cast("string"))


def hash_combine(*hashes) -> Column:
    """KQL hash_combine — combine hash values. Kusto's mixing function
    is unpublished (its hashes are engine-specific anyway, like this
    engine's xxhash64-based hash()); combining by xxhash64 over the
    ordered value tuple is deterministic, order-sensitive, and stays in
    codegen without ANSI-mode overflow."""
    return F.xxhash64(*[_c(h).cast("long") for h in hashes])


def ipv4_is_match(a, b, prefix: int = 32) -> Column:
    """KQL ipv4_is_match(ip1, ip2[, prefix]) — equality under the
    EFFECTIVE prefix: min of each ip's own '/suffix' (default 32) and
    the prefix argument. Null for malformed input."""
    ca, cb = _c(a), _c(b)

    def base_bits(c):
        base = F.when(c.contains("/"), F.substring_index(c, "/", 1)).otherwise(c)
        bits = F.when(
            c.contains("/"), F.substring_index(c, "/", -1).cast("int")
        ).otherwise(F.lit(32))
        return base, bits

    base_a, bits_a = base_bits(ca)
    base_b, bits_b = base_bits(cb)
    eff = F.least(bits_a, bits_b, F.lit(int(prefix)))
    ok = eff.between(0, 32)
    p = F.pow(F.lit(2.0), (F.lit(32) - eff).cast("double"))
    la, lb = ipv4_to_long(base_a), ipv4_to_long(base_b)
    return F.when(
        ok & la.isNotNull() & lb.isNotNull(),
        F.floor(la / p) == F.floor(lb / p),
    )


def base64_encode_fromarray(arr) -> Column:
    """KQL base64_encode_fromarray — byte array (dynamic of 0..255
    ints) → base64 string: hex-render each byte JVM-side, unhex to
    binary, base64. Null when any element is out of byte range."""
    a = _c(arr)
    valid = F.forall(a, lambda x: x.cast("long").between(0, 255))
    hexstr = F.array_join(
        F.transform(a, lambda x: F.lpad(F.hex(x.cast("long")), 2, "0")), ""
    )
    return F.when(valid, F.base64(F.unhex(hexstr)))


def isutf8(x) -> Column:
    """KQL isutf8 — Spark strings are UTF-8 by construction, so any
    non-null string value is valid UTF-8 (bytes that were not valid
    UTF-8 could not have become a string column)."""
    return _c(x).isNotNull()
