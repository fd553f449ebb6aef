"""Kusto time-series evaluate plugins rebuilt Spark-first:
`rows_near`, `sliding_window_counts`, `rolling_percentile`,
`activity_counts_metrics`, plus the retention triangle at the core of
`new_activity_metrics`.

These are the activity-analytics plugins Kusto users run against event
streams (docs: evaluate plugin reference). None needs a UDF — each is
a composition of built-in expressions:

- rows_near: one window (max of the condition flag over a bounded
  ROWS frame on the serialization order) — whole-stage codegen, no
  shuffle beyond the ordering the caller already established.
- sliding_window_counts / rolling_percentile: explode each event to
  the output bins its lookback window covers (amplification factor =
  lookback/bin, a user-chosen constant independent of corpus size),
  then ONE aggregation on the bin key with map-side partials. This is
  the classic scale-out shape for sliding distinct-counts: no
  self-join of events against events, no per-bin rescan; the shuffle
  carries (bin, id) pairs only. All bin arithmetic is exact integer
  microseconds (no float drift on timestamps).

Reference anchor: the reference's KQL surface declaration
(README.md:34) names the query language; the plugin set itself has no
reference implementation (design-only engine) — semantics follow the
public Kusto docs, deterministic variants where Kusto is heuristic.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _usec(ts: _dt.datetime | str) -> int:
    if isinstance(ts, str):
        ts = _dt.datetime.fromisoformat(ts)
    return int(ts.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)


def rows_near(
    df: DataFrame,
    condition: Column,
    order_by: list[Column | str],
    rows_before: int,
    rows_after: int | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Kusto `evaluate rows_near(Condition, NumRows[, RowsAfter])`:
    rows within `rows_before` rows before or `rows_after` rows after
    any row satisfying Condition (matching rows themselves included).
    rows_after defaults to rows_before (Kusto default).

    A row r qualifies iff some condition row exists in r's ROWS frame
    [-rows_after, +rows_before] — one bounded window over the caller's
    serialization order, optionally per partition key."""
    if rows_after is None:
        rows_after = rows_before
    if rows_before < 0 or rows_after < 0:
        raise ValueError("rows_near offsets must be non-negative")
    base = W.partitionBy(*partition_by) if partition_by else W.partitionBy()
    w = base.orderBy(*order_by).rowsBetween(-rows_after, rows_before)
    flagged = df.withColumn(
        "__near", F.max(condition.cast("int")).over(w) == 1
    )
    return flagged.filter(F.col("__near")).drop("__near")


def sliding_window_counts(
    df: DataFrame,
    id_col: str,
    time_col: str,
    start: _dt.datetime | str,
    end: _dt.datetime | str,
    lookback_sec: int,
    bin_sec: int,
) -> DataFrame:
    """Kusto `evaluate sliding_window_counts(Id, Timeline, Start, End,
    LookbackWindow, Bin)`: for each grid point t = Start + k*Bin ≤ End,
    Count = events and Dcount = distinct ids with timeline in
    (t - Lookback, t]. Output (t timestamp, Count, Dcount) for every
    grid point in range (bins with no activity emit 0).

    Each event explodes to the ⌈Lookback/Bin⌉ grid points whose window
    contains it — k from ceil((τ-Start)/Bin) to ceil((τ+L-Start)/Bin)-1,
    exact integer-µs arithmetic — then one groupBy on k."""
    if bin_sec <= 0 or lookback_sec <= 0:
        raise ValueError("bin and lookback must be positive")
    s_us, e_us = _usec(start), _usec(end)
    bin_us, look_us = bin_sec * 1_000_000, lookback_sec * 1_000_000
    n_bins = (e_us - s_us) // bin_us  # grid k = 0..n_bins
    if n_bins < 0:
        raise ValueError("end before start")
    tau = F.unix_micros(F.col(time_col).cast("timestamp")) - F.lit(s_us)
    # k_min = ceil(tau/bin) ; k_max = ceil((tau+L)/bin) - 1   (τ ≤ t < τ+L)
    k_min = F.greatest(F.lit(0), -F.floor(-tau / F.lit(bin_us)))
    k_max = F.least(
        F.lit(n_bins), -F.floor(-(tau + F.lit(look_us)) / F.lit(bin_us)) - 1
    )
    exploded = (
        df.select(F.col(id_col).alias("__id"), k_min.alias("__k0"), k_max.alias("__k1"))
        .filter(F.col("__k0") <= F.col("__k1"))
        .select("__id", F.explode(F.sequence("__k0", "__k1")).alias("__k"))
    )
    counted = exploded.groupBy("__k").agg(
        F.count(F.lit(1)).alias("Count"),
        F.count_distinct("__id").alias("Dcount"),
    )
    spark = df.sparkSession
    grid = spark.range(0, n_bins + 1).select(F.col("id").alias("__k"))
    return (
        grid.join(counted, "__k", "left")
        .select(
            F.timestamp_micros(F.col("__k") * F.lit(bin_us) + F.lit(s_us)).alias("t"),
            F.coalesce("Count", F.lit(0)).alias("Count"),
            F.coalesce("Dcount", F.lit(0)).alias("Dcount"),
        )
        .orderBy("t")
    )


def rolling_percentile(
    df: DataFrame,
    value_col: str,
    percentile: float,
    time_col: str,
    bin_sec: int,
    bins_per_window: int,
) -> DataFrame:
    """Kusto `evaluate rolling_percentile(Value, Percentile, Timeline,
    Bin, BinsPerWindow)`: for each data bin b (epoch-aligned floor bins
    over the data's own range), the exact interpolated percentile of
    values whose bin lies in the window (b - BinsPerWindow·Bin, b] —
    i.e. the current bin and the BinsPerWindow-1 preceding ones.
    Output (t, p<percentile>) for every bin in [min_bin, max_bin];
    value rounded to 4dp (cross-engine double-sum convention).

    Each value explodes to the ≤ BinsPerWindow bins it contributes to;
    one groupBy computes all percentiles (no per-bin rescans)."""
    if not 0.0 <= percentile <= 1.0:
        raise ValueError("percentile must be in [0, 1]")
    if bin_sec <= 0 or bins_per_window <= 0:
        raise ValueError("bin and bins_per_window must be positive")
    bin_us = bin_sec * 1_000_000
    binned = df.select(
        F.col(value_col).cast("double").alias("__v"),
        F.floor(F.unix_micros(F.col(time_col).cast("timestamp")) / F.lit(bin_us)).alias(
            "__b"
        ),
    )
    lo, hi = binned.agg(F.min("__b"), F.max("__b")).first()
    exploded = binned.select(
        "__v", F.explode(F.sequence("__b", F.col("__b") + F.lit(bins_per_window - 1))).alias("__tb")
    ).filter((F.col("__tb") >= F.lit(lo)) & (F.col("__tb") <= F.lit(hi)))
    out_col = f"p{int(round(percentile * 100))}"
    return (
        exploded.groupBy("__tb")
        .agg(F.round(F.percentile("__v", F.lit(percentile)), 4).alias(out_col))
        .select(
            F.timestamp_micros(F.col("__tb") * F.lit(bin_us)).alias("t"),
            out_col,
        )
        .orderBy("t")
    )


def activity_counts_metrics(
    df: DataFrame,
    id_col: str,
    time_col: str,
    start: _dt.datetime | str,
    end: _dt.datetime | str,
    bin_sec: int,
) -> DataFrame:
    """Kusto `evaluate activity_counts_metrics(Id, Timeline, Start,
    End, Step)`: per bin t in [Start, End] — `count` (events),
    `dcount` (distinct ids), `new_dcount` (ids whose FIRST activity in
    range falls in this bin), `aggregated_dcount` (distinct ids from
    Start through the end of this bin — the cumulative user curve).

    Two aggregations and a window cumsum, no sliding explode:
    per-bin count/dcount is one groupBy; first-activity bins come from
    a min-bin-per-id aggregate (shuffle on the id key, the natural
    partitioning); aggregated_dcount = running sum of new_dcount over
    the (tiny) bin axis — cheaper and exact versus re-counting
    distinct ids per prefix, because cumulative distinct IS the sum of
    first-appearances."""
    if bin_sec <= 0:
        raise ValueError("bin must be positive")
    s_us, e_us = _usec(start), _usec(end)
    bin_us = bin_sec * 1_000_000
    n_bins = (e_us - s_us) // bin_us
    if n_bins < 0:
        raise ValueError("end before start")
    tau = F.unix_micros(F.col(time_col).cast("timestamp")) - F.lit(s_us)
    binned = df.select(
        F.col(id_col).alias("__id"), F.floor(tau / F.lit(bin_us)).alias("__k")
    ).filter((F.col("__k") >= 0) & (F.col("__k") <= F.lit(n_bins)))
    per_bin = binned.groupBy("__k").agg(
        F.count(F.lit(1)).alias("count"),
        F.count_distinct("__id").alias("dcount"),
    )
    first_seen = (
        binned.groupBy("__id")
        .agg(F.min("__k").alias("__k"))
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("new_dcount"))
    )
    spark = df.sparkSession
    grid = spark.range(0, n_bins + 1).select(F.col("id").alias("__k"))
    joined = (
        grid.join(per_bin, "__k", "left")
        .join(first_seen, "__k", "left")
        .select(
            "__k",
            F.coalesce("count", F.lit(0)).alias("count"),
            F.coalesce("dcount", F.lit(0)).alias("dcount"),
            F.coalesce("new_dcount", F.lit(0)).alias("new_dcount"),
        )
    )
    w = W.orderBy("__k").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        joined.withColumn("aggregated_dcount", F.sum("new_dcount").over(w))
        .select(
            F.timestamp_micros(F.col("__k") * F.lit(bin_us) + F.lit(s_us)).alias("t"),
            "count",
            "dcount",
            "new_dcount",
            "aggregated_dcount",
        )
        .orderBy("t")
    )


def retention_metrics(
    df: DataFrame,
    id_col: str,
    time_col: str,
    start: _dt.datetime | str,
    end: _dt.datetime | str,
    bin_sec: int,
) -> DataFrame:
    """Cohort retention triangle — the deterministic core of Kusto's
    `evaluate new_activity_metrics`: ids are cohorted by the bin of
    their FIRST activity in range; for every (cohort, activity bin ≥
    cohort) pair, `retained` = distinct cohort ids active in that bin
    and `retention_rate` = retained / cohort size (4dp). The cohort's
    own bin yields rate 1.0 by construction.

    Shape: one min-bin-per-id aggregate (cohort assignment, shuffled
    on the id key), one distinct on (id, bin), one broadcast-sized
    join of per-(cohort, bin) counts to cohort sizes — the matrix axis
    is bins², never corpus-sized. Output
    (cohort timestamp, t timestamp, cohort_size, retained,
    retention_rate) ordered by (cohort, t)."""
    if bin_sec <= 0:
        raise ValueError("bin must be positive")
    s_us, e_us = _usec(start), _usec(end)
    bin_us = bin_sec * 1_000_000
    n_bins = (e_us - s_us) // bin_us
    if n_bins < 0:
        raise ValueError("end before start")
    tau = F.unix_micros(F.col(time_col).cast("timestamp")) - F.lit(s_us)
    binned = (
        df.select(
            F.col(id_col).alias("__id"), F.floor(tau / F.lit(bin_us)).alias("__k")
        )
        .filter((F.col("__k") >= 0) & (F.col("__k") <= F.lit(n_bins)))
        .distinct()
    )
    cohort = binned.groupBy("__id").agg(F.min("__k").alias("__c"))
    activity = binned.join(cohort, "__id")
    cell = activity.groupBy("__c", "__k").agg(
        F.count(F.lit(1)).alias("retained")  # (id, k) already distinct
    )
    size = cohort.groupBy("__c").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        cell.join(F.broadcast(size), "__c")
        .select(
            F.timestamp_micros(F.col("__c") * F.lit(bin_us) + F.lit(s_us)).alias(
                "cohort"
            ),
            F.timestamp_micros(F.col("__k") * F.lit(bin_us) + F.lit(s_us)).alias("t"),
            "cohort_size",
            "retained",
            F.round(F.col("retained") / F.col("cohort_size"), 4).alias(
                "retention_rate"
            ),
        )
        .orderBy("cohort", "t")
    )


def active_users_count(
    df: DataFrame,
    id_col: str,
    time_col: str,
    start: _dt.datetime | str,
    end: _dt.datetime | str,
    lookback_sec: int,
    period_sec: int,
    min_active_periods: int,
    bin_sec: int,
) -> DataFrame:
    """Kusto `evaluate active_users_count(Id, Timeline, Start, End,
    LookbackWindow, Period, ActivePeriodsCount, Bin)`: per grid bin t,
    the number of distinct ids with activity in at least
    `min_active_periods` DISTINCT periods of the lookback window —
    periods are `period_sec` slices ending at t (period j of an event
    at τ is floor((t-τ)/Period), window τ ∈ (t-Lookback, t]). The
    fuzzy-MAU metric: "users active on ≥ m of the last k days".

    Shape: the same explode-to-bins as sliding_window_counts
    (amplification = lookback/bin), the period index computed per
    (event, bin) as plain arithmetic, then distinct (bin, id, period)
    → per-(bin, id) period counts → threshold filter → per-bin count.
    Two keyed aggregations, no per-bin rescans, grid join fills empty
    bins with 0."""
    if min(bin_sec, lookback_sec, period_sec) <= 0 or min_active_periods <= 0:
        raise ValueError("bin/lookback/period/min_active_periods must be positive")
    s_us, e_us = _usec(start), _usec(end)
    bin_us, look_us = bin_sec * 1_000_000, lookback_sec * 1_000_000
    per_us = period_sec * 1_000_000
    n_bins = (e_us - s_us) // bin_us
    if n_bins < 0:
        raise ValueError("end before start")
    tau = F.unix_micros(F.col(time_col).cast("timestamp")) - F.lit(s_us)
    k_min = F.greatest(F.lit(0), -F.floor(-tau / F.lit(bin_us)))
    k_max = F.least(
        F.lit(n_bins), -F.floor(-(tau + F.lit(look_us)) / F.lit(bin_us)) - 1
    )
    hits = (
        df.select(
            F.col(id_col).alias("__id"),
            tau.alias("__tau"),
            k_min.alias("__k0"),
            k_max.alias("__k1"),
        )
        .filter(F.col("__k0") <= F.col("__k1"))
        .select(
            "__id",
            "__tau",
            F.explode(F.sequence("__k0", "__k1")).alias("__k"),
        )
        .select(
            "__id",
            "__k",
            F.floor(
                (F.col("__k") * F.lit(bin_us) - F.col("__tau")) / F.lit(per_us)
            ).alias("__j"),
        )
        .distinct()
    )
    qualified = (
        hits.groupBy("__k", "__id")
        .agg(F.count(F.lit(1)).alias("__nper"))  # (__k,__id,__j) distinct
        .filter(F.col("__nper") >= min_active_periods)
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    spark = df.sparkSession
    grid = spark.range(0, n_bins + 1).select(F.col("id").alias("__k"))
    return (
        grid.join(qualified, "__k", "left")
        .select(
            F.timestamp_micros(F.col("__k") * F.lit(bin_us) + F.lit(s_us)).alias("t"),
            F.coalesce("active_users", F.lit(0)).alias("active_users"),
        )
        .orderBy("t")
    )


def funnel_sequence(
    df: DataFrame,
    id_col: str,
    time_col: str,
    state_col: str,
    sequence: list[str],
    max_step_sec: int | None = None,
    start: _dt.datetime | str | None = None,
    end: _dt.datetime | str | None = None,
) -> DataFrame:
    """Kusto `evaluate funnel_sequence(Id, Timeline, Start, End,
    MaxSequenceStepWindow, Step, StateColumn, Sequence)` — the
    prev/next distribution around a searched state sequence: for every
    occurrence of `sequence` as CONSECUTIVE states in an id's
    timeline (consecutive duplicate states collapsed first, Kusto's
    convention; successive steps within `max_step_sec` when given),
    record the state immediately before and immediately after the
    occurrence. Output (prev, next, dcount) — distinct ids per
    (prev, next) pair, null prev/next at timeline edges — ordered by
    dcount desc then (prev, next) for determinism.

    Shape: ONE shuffle on the id key (the per-id window), lag/lead
    expressions for the fixed-length match — no self-joins, no state
    machine needed for a fixed sequence (the general regex-over-states
    case is `scan`'s job, operators/scan.py)."""
    if not sequence:
        raise ValueError("sequence must be non-empty")
    ts = F.col(time_col).cast("timestamp")
    base = df.select(
        F.col(id_col).alias("__id"), ts.alias("__ts"), F.col(state_col).alias("__st")
    )
    if start is not None:
        base = base.filter(F.col("__ts") >= F.lit(_usec(start) / 1e6).cast("timestamp"))
    if end is not None:
        base = base.filter(F.col("__ts") <= F.lit(_usec(end) / 1e6).cast("timestamp"))
    w = W.partitionBy("__id").orderBy("__ts", "__st")
    # collapse consecutive duplicate states per id
    dedup = (
        base.withColumn("__prev_st", F.lag("__st").over(w))
        .filter(F.col("__prev_st").isNull() | (F.col("__st") != F.col("__prev_st")))
        .drop("__prev_st")
    )
    m = len(sequence)
    w2 = W.partitionBy("__id").orderBy("__ts", "__st")
    cond = F.col("__st") == F.lit(sequence[0])
    for i in range(1, m):
        cond = cond & (F.lead("__st", i).over(w2) == F.lit(sequence[i]))
    if max_step_sec is not None:
        for i in range(1, m):
            gap = F.unix_micros(F.lead("__ts", i).over(w2)) - F.unix_micros(
                F.lead("__ts", i - 1).over(w2)
            )
            cond = cond & (gap <= max_step_sec * 1_000_000)
    hits = (
        dedup.withColumn("__prev", F.lag("__st").over(w2))
        .withColumn("__next", F.lead("__st", m).over(w2))
        # window expressions can't sit inside a WHERE — project the
        # match flag first, then filter the materialized column
        .withColumn("__match", cond)
        .filter(F.col("__match"))
    )
    return (
        hits.groupBy(F.col("__prev").alias("prev"), F.col("__next").alias("next"))
        .agg(F.count_distinct("__id").alias("dcount"))
        .orderBy(F.col("dcount").desc(), F.col("prev").asc_nulls_first(),
                 F.col("next").asc_nulls_first())
    )


def session_count(
    df: DataFrame,
    id_col: str,
    time_col: str,
    start: _dt.datetime | str,
    end: _dt.datetime | str,
    bin_sec: int,
    lookback_sec: int,
) -> DataFrame:
    """Kusto `evaluate session_count(Id, Timeline, Start, End, Bin,
    LookBackWindow)`: per grid bin t, the number of active sessions —
    an id's session is active at t iff the id has at least one event
    with timeline in (t - LookBackWindow, t] (Kusto's definition; a
    "session" is the id's presence inside the lookback horizon).
    Output (t, count_sessions) for every grid point, empty bins 0.

    Shape: the sliding_window_counts explode-to-bins (amplification =
    lookback/bin, a user constant), distinct (bin, id), ONE keyed
    aggregation — no per-bin rescans, no events×grid join."""
    if bin_sec <= 0 or lookback_sec <= 0:
        raise ValueError("bin and lookback must be positive")
    s_us, e_us = _usec(start), _usec(end)
    bin_us, look_us = bin_sec * 1_000_000, lookback_sec * 1_000_000
    n_bins = (e_us - s_us) // bin_us
    if n_bins < 0:
        raise ValueError("end before start")
    tau = F.unix_micros(F.col(time_col).cast("timestamp")) - F.lit(s_us)
    k_min = F.greatest(F.lit(0), -F.floor(-tau / F.lit(bin_us)))
    k_max = F.least(
        F.lit(n_bins), -F.floor(-(tau + F.lit(look_us)) / F.lit(bin_us)) - 1
    )
    counted = (
        df.select(F.col(id_col).alias("__id"), k_min.alias("__k0"), k_max.alias("__k1"))
        .filter(F.col("__k0") <= F.col("__k1"))
        .select("__id", F.explode(F.sequence("__k0", "__k1")).alias("__k"))
        .groupBy("__k")
        .agg(F.count_distinct("__id").alias("count_sessions"))
    )
    spark = df.sparkSession
    grid = spark.range(0, n_bins + 1).select(F.col("id").alias("__k"))
    return (
        grid.join(counted, "__k", "left")
        .select(
            F.timestamp_micros(F.col("__k") * F.lit(bin_us) + F.lit(s_us)).alias("t"),
            F.coalesce("count_sessions", F.lit(0)).alias("count_sessions"),
        )
        .orderBy("t")
    )


def activity_engagement(
    df: DataFrame,
    id_col: str,
    time_col: str,
    start: _dt.datetime | str,
    end: _dt.datetime | str,
    inner_sec: int,
    outer_sec: int,
) -> DataFrame:
    """Kusto `evaluate activity_engagement(Id, Timeline, Start, End,
    InnerActivityWindow, OuterActivityWindow)` — the DAU/MAU
    engagement ratio: timeline stepped by the inner window; at each
    grid point t, dcount of ids active in (t-inner, t] and in
    (t-outer, t], and their ratio. Output
    (t, dcount_activities_inner, dcount_activities_outer,
    activity_ratio) with ratio rounded to 6dp (0.0 when outer is 0).

    Shape: ONE explode-to-bins pass per window length (outer
    amplification = outer/inner), distinct (bin, id), keyed
    aggregations joined on the bin key — never events×grid."""
    if inner_sec <= 0 or outer_sec <= 0 or outer_sec < inner_sec:
        raise ValueError("need 0 < inner <= outer")
    s_us, e_us = _usec(start), _usec(end)
    in_us, out_us = inner_sec * 1_000_000, outer_sec * 1_000_000
    n_bins = (e_us - s_us) // in_us  # grid k = 1..n_bins (t = start + k*inner)
    if n_bins < 1:
        raise ValueError("range shorter than one inner window")
    tau = F.unix_micros(F.col(time_col).cast("timestamp")) - F.lit(s_us)

    def dcounts(look_us: int, alias: str) -> DataFrame:
        k_min = F.greatest(F.lit(1), -F.floor(-tau / F.lit(in_us)))
        k_max = F.least(
            F.lit(n_bins), -F.floor(-(tau + F.lit(look_us)) / F.lit(in_us)) - 1
        )
        return (
            df.select(
                F.col(id_col).alias("__id"),
                k_min.alias("__k0"),
                k_max.alias("__k1"),
            )
            .filter(F.col("__k0") <= F.col("__k1"))
            .select("__id", F.explode(F.sequence("__k0", "__k1")).alias("__k"))
            .groupBy("__k")
            .agg(F.count_distinct("__id").alias(alias))
        )

    inner_c = dcounts(in_us, "dcount_activities_inner")
    outer_c = dcounts(out_us, "dcount_activities_outer")
    spark = df.sparkSession
    grid = spark.range(1, n_bins + 1).select(F.col("id").alias("__k"))
    return (
        grid.join(inner_c, "__k", "left")
        .join(outer_c, "__k", "left")
        .select(
            F.timestamp_micros(F.col("__k") * F.lit(in_us) + F.lit(s_us)).alias("t"),
            F.coalesce("dcount_activities_inner", F.lit(0)).alias(
                "dcount_activities_inner"
            ),
            F.coalesce("dcount_activities_outer", F.lit(0)).alias(
                "dcount_activities_outer"
            ),
            F.when(F.coalesce("dcount_activities_outer", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.coalesce("dcount_activities_inner", F.lit(0))
                    / F.col("dcount_activities_outer"),
                    6,
                )
            )
            .alias("activity_ratio"),
        )
        .orderBy("t")
    )


def _earliest_following(
    matches: DataFrame,
    events: DataFrame,
    from_col: str,
    new_col: str,
    max_gap_us: int | None,
) -> DataFrame:
    """For each match row, the EARLIEST event (same ``__id``) with
    timestamp strictly after ``from_col`` and within ``max_gap_us``.
    ``events`` must have columns (__id, __ets).

    Union+window shape (the as-of join trick, operators/asof.py, run
    forward): tag events 0 / matches 1, per-id window ordered by
    (ts, tag) — events at equal ts sort before the match row and thus
    fall outside the strictly-following frame, giving the strict-`>`
    step semantics — then first(ignorenulls) over (+1, ∞). ONE shuffle
    on the id key per step, no pairwise join blowup; successive steps
    reuse the same hash partitioning so the exchange is shared."""
    ev = events.select(
        "__id",
        F.col("__ets").alias("__ord"),
        F.col("__ets").alias("__eval"),
        F.lit(0).alias("__tag"),
    )
    mt = matches.withColumn("__ord", F.col(from_col)).withColumn("__tag", F.lit(1))
    u = mt.unionByName(ev, allowMissingColumns=True)
    w = (
        W.partitionBy("__id")
        .orderBy(F.col("__ord").asc(), F.col("__tag").asc())
        .rowsBetween(1, W.unboundedFollowing)
    )
    out = (
        u.withColumn(new_col, F.first("__eval", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
        .drop("__ord", "__tag", "__eval")
        .filter(F.col(new_col).isNotNull())
    )
    if max_gap_us is not None:
        out = out.filter(
            F.unix_micros(F.col(new_col)) - F.unix_micros(F.col(from_col))
            <= max_gap_us
        )
    return out


def sequence_detect(
    df: DataFrame,
    id_col: str,
    time_col: str,
    exprs: list,
    max_step_sec: int,
    max_span_sec: int,
    names: list[str] | None = None,
) -> DataFrame:
    """Kusto `evaluate sequence_detect(Timeline, MaxSequenceStepWindow,
    MaxSequenceSpanWindow, Expr1, …, ExprK, Id)`: detect event
    sequences per id — a sequence is one event matching each Expr_i in
    chronological order, each step within MaxSequenceStepWindow of the
    previous and the whole span within MaxSequenceSpanWindow. Output:
    (id, <name_1>…<name_k> step timestamps, duration seconds), one row
    per anchor (Expr1 event) whose chain completes; each later step is
    the EARLIEST qualifying event (greedy-earliest is reachability-
    optimal: an earlier step-i time only widens the step-i+1 search
    window). Delta from Kusto documented: Kusto also collapses
    sequences sharing a tail; we keep one row per anchor.

    Shape: K-1 forward as-of passes (union+window, one shuffle each,
    all on the same id key so the exchange is reused) — no self-joins,
    no events×events blowup; per-step event sets are pre-filtered so
    each pass carries only (anchors + step events)."""
    k = len(exprs)
    if k < 2:
        raise ValueError("sequence_detect needs at least two step expressions")
    if names is None:
        names = [f"step_{i + 1}" for i in range(k)]
    if len(names) != k:
        raise ValueError("names must match exprs")
    step_us = max_step_sec * 1_000_000
    span_us = max_span_sec * 1_000_000
    ts = F.col(time_col).cast("timestamp")
    base = df.select(F.col(id_col).alias("__id"), ts.alias("__ets"), "*")
    matches = (
        base.filter(exprs[0])
        .select("__id", F.col("__ets").alias(names[0]))
    )
    for i in range(1, k):
        events_i = base.filter(exprs[i]).select("__id", "__ets")
        matches = _earliest_following(
            matches, events_i, names[i - 1], names[i], step_us
        )
    dur_us = F.unix_micros(F.col(names[-1])) - F.unix_micros(F.col(names[0]))
    return (
        matches.filter(dur_us <= span_us)
        .select(
            F.col("__id").alias(id_col),
            *names,
            F.round(dur_us / 1_000_000, 6).alias("duration"),
        )
        .orderBy(id_col, names[0])
    )


def funnel_sequence_completion(
    df: DataFrame,
    id_col: str,
    time_col: str,
    state_col: str,
    sequence: list[str],
    max_window_sec: list[int],
    start: _dt.datetime | str,
    end: _dt.datetime | str,
    bin_sec: int,
) -> DataFrame:
    """Kusto `evaluate funnel_sequence_completion(Id, Timeline, Start,
    End, Bin, State, Sequence, MaxSequenceWindows)`: funnel completion
    rates per period — for each timeline bin and each sequence prefix
    i, the number of distinct ids with a funnel start (an event in
    state Sequence[0] inside the bin) that reached Sequence[i-1]
    within MaxSequenceWindows[i-1] of the start (steps strictly
    ordered in time; each windows entry bounds start→step-i, Kusto's
    convention). Output (t, state, dcount) ordered by (t, funnel
    position).

    Shape: the sequence_detect chain (forward as-of passes on the id
    key) run WITHOUT per-step truncation, then one groupBy per prefix
    on (bin, id) — union of K small aggregates. An id counts for
    prefix i if ANY of its anchors in the bin completes step i; since
    every anchor is chained greedy-earliest (reachability-optimal),
    anchor-level success is exactly id-level reachability."""
    k = len(sequence)
    if k == 0 or len(max_window_sec) != k:
        raise ValueError("sequence and max_window_sec must align")
    s_us, e_us = _usec(start), _usec(end)
    bin_us = bin_sec * 1_000_000
    ts = F.col(time_col).cast("timestamp")
    base = df.select(
        F.col(id_col).alias("__id"), ts.alias("__ets"), F.col(state_col).alias("__st")
    ).filter(
        (F.unix_micros(F.col("__ets")) >= s_us) & (F.unix_micros(F.col("__ets")) <= e_us)
    )
    names = [f"__t{i + 1}" for i in range(k)]
    matches = base.filter(F.col("__st") == sequence[0]).select(
        "__id", F.col("__ets").alias(names[0])
    )
    prefixes = []
    for i in range(k):
        if i > 0:
            events_i = base.filter(F.col("__st") == sequence[i]).select("__id", "__ets")
            matches = _earliest_following(
                matches, events_i, names[i - 1], names[i], None
            )
        within = (
            F.unix_micros(F.col(names[i])) - F.unix_micros(F.col(names[0]))
            <= max_window_sec[i] * 1_000_000
        )
        stage = (
            matches.filter(within)
            .select(
                "__id",
                (
                    F.floor(
                        (F.unix_micros(F.col(names[0])) - F.lit(s_us))
                        / F.lit(bin_us)
                    )
                ).alias("__k"),
            )
            .distinct()
            .groupBy("__k")
            .agg(F.count_distinct("__id").alias("dcount"))
            .select(
                "__k",
                F.lit(i).alias("__pos"),
                F.lit(sequence[i]).alias("state"),
                "dcount",
            )
        )
        prefixes.append(stage)
    out = prefixes[0]
    for p in prefixes[1:]:
        out = out.unionByName(p)
    return out.select(
        F.timestamp_micros(F.col("__k") * F.lit(bin_us) + F.lit(s_us)).alias("t"),
        "state",
        "dcount",
        "__pos",
    ).orderBy("t", "__pos").drop("__pos")


def new_activity_metrics(
    df: DataFrame,
    id_col: str,
    time_col: str,
    start: _dt.datetime | str,
    end: _dt.datetime | str,
    bin_sec: int,
) -> DataFrame:
    """Kusto `evaluate new_activity_metrics(Id, Timeline, Start, End,
    Window)` — COHORT retention: for every (from_bin, to_bin) pair with
    to ≥ from, the cohort is the ids whose FIRST activity lands in
    from_bin; `dcount_new_values` is the cohort size,
    `dcount_retained_values` how many are active in to_bin,
    `dcount_churn_values` the rest, rates = retained/new (6dp, Kusto's
    from==to row is retention 1.0 by construction).

    Shape: distinct (bin, id) once; cohorts from the min-bin-per-id
    aggregate; retained = ONE equi-join on id (cohort × activity, both
    keyed on id — co-partitioned shuffle, never a per-pair pass), then
    a (from, to) groupBy. Pair count ≤ bins², rows not data."""
    if bin_sec <= 0:
        raise ValueError("bin must be positive")
    s_us, e_us = _usec(start), _usec(end)
    bin_us = bin_sec * 1_000_000
    n_bins = (e_us - s_us) // bin_us
    if n_bins < 0:
        raise ValueError("end before start")
    tau = F.unix_micros(F.col(time_col).cast("timestamp")) - F.lit(s_us)
    # Kusto's Timeline bound is Start <= ts <= End — clip by TIMESTAMP,
    # not bin index (a bin-index clip would admit events up to one full
    # window past End through the trailing partial bin).
    actives = (
        df.filter((tau >= 0) & (tau <= F.lit(e_us - s_us)))
        .select(
            F.col(id_col).alias("__id"),
            F.floor(tau / F.lit(bin_us)).alias("__k"),
        )
        .distinct()
    )
    cohort = actives.groupBy("__id").agg(F.min("__k").alias("__from"))
    cohort_sizes = cohort.groupBy("__from").agg(
        F.count(F.lit(1)).alias("dcount_new_values")
    )
    retained = (
        cohort.join(actives, "__id")
        .filter(F.col("__k") >= F.col("__from"))
        .groupBy("__from", F.col("__k").alias("__to"))
        .agg(F.count(F.lit(1)).alias("dcount_retained_values"))
    )
    new_c = F.col("dcount_new_values")
    ret_c = F.col("dcount_retained_values")
    ts_of = lambda k: F.timestamp_micros(k * F.lit(bin_us) + F.lit(s_us))  # noqa: E731
    return (
        retained.join(cohort_sizes, "__from")
        .select(
            ts_of(F.col("__from")).alias(f"from_{time_col}"),
            ts_of(F.col("__to")).alias(f"to_{time_col}"),
            new_c,
            ret_c,
            (new_c - ret_c).alias("dcount_churn_values"),
            F.round(ret_c / new_c, 6).alias("retention_rate"),
            F.round((new_c - ret_c) / new_c, 6).alias("churn_rate"),
        )
        .orderBy(f"from_{time_col}", f"to_{time_col}")
    )


def activity_metrics(
    df: DataFrame,
    id_col: str,
    time_col: str,
    start: _dt.datetime | str,
    end: _dt.datetime | str,
    bin_sec: int,
) -> DataFrame:
    """Kusto `evaluate activity_metrics(Id, Timeline, Start, End,
    Window)`: per window bin — `dcount_values`, `dcount_newvalues`
    (first-ever-in-range ids), `retention_rate` (share of THIS bin's
    actives also active in the NEXT bin — Kusto's definition) and
    `churn_rate` (share NOT active in the next bin; retention + churn
    = 1 on bins with actives, both 0 on the last bin/empty bins).

    Shape: distinct (bin, id) once; retained = ONE self-equi-join on
    (id, bin+1) — co-keyed shuffle, never a set-collect; new ids from
    the min-bin-per-id aggregate. 6dp rates for cross-engine hashing."""
    if bin_sec <= 0:
        raise ValueError("bin must be positive")
    s_us, e_us = _usec(start), _usec(end)
    bin_us = bin_sec * 1_000_000
    n_bins = (e_us - s_us) // bin_us
    if n_bins < 0:
        raise ValueError("end before start")
    tau = F.unix_micros(F.col(time_col).cast("timestamp")) - F.lit(s_us)
    actives = (
        df.select(
            F.col(id_col).alias("__id"),
            F.floor(tau / F.lit(bin_us)).alias("__k"),
        )
        .filter((F.col("__k") >= 0) & (F.col("__k") <= F.lit(n_bins)))
        .distinct()
    )
    per_bin = actives.groupBy("__k").agg(
        F.count(F.lit(1)).alias("dcount_values")
    )
    nxt = actives.select((F.col("__k") - 1).alias("__k"), "__id")
    retained = (
        actives.join(nxt, ["__k", "__id"], "left_semi")
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__retained"))
    )
    first_seen = (
        actives.groupBy("__id")
        .agg(F.min("__k").alias("__k"))
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("dcount_newvalues"))
    )
    spark = df.sparkSession
    grid = spark.range(0, n_bins + 1).select(F.col("id").alias("__k"))
    d = F.col("dcount_values")
    r = F.col("__retained")
    return (
        grid.join(per_bin, "__k", "left")
        .join(retained, "__k", "left")
        .join(first_seen, "__k", "left")
        .select(
            F.timestamp_micros(F.col("__k") * F.lit(bin_us) + F.lit(s_us)).alias("t"),
            F.coalesce(d, F.lit(0)).alias("dcount_values"),
            F.coalesce("dcount_newvalues", F.lit(0)).alias("dcount_newvalues"),
            F.when(
                (F.col("__k") < n_bins) & d.isNotNull() & (d > 0),
                F.round(F.coalesce(r, F.lit(0)) / d, 6),
            )
            .otherwise(F.lit(0.0))
            .alias("retention_rate"),
            F.when(
                (F.col("__k") < n_bins) & d.isNotNull() & (d > 0),
                F.round((d - F.coalesce(r, F.lit(0))) / d, 6),
            )
            .otherwise(F.lit(0.0))
            .alias("churn_rate"),
        )
        .orderBy("t")
    )
