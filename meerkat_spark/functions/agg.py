"""KQL aggregation functions (inside `summarize`) as Column builders.

All of these compile to Spark's partial+final HashAggregateExec — the
distributed partial/final aggregation the reference planned
(reference README.md:34) is Catalyst's default physical strategy, so
nothing imperative is built here (SURVEY.md §2.2.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


# counting -----------------------------------------------------------
def count() -> Column:
    return F.count(F.lit(1))


def countif(pred: Column) -> Column:
    return F.count(F.when(pred, 1))


def dcount(x, exact: bool = True, rsd: float = 0.05) -> Column:
    """KQL dcount is approximate (HLL). `exact=True` uses countDistinct
    for oracle parity; exact=False → approx_count_distinct (the scale
    path: mergeable sketch, no shuffle of distinct values)."""
    return F.countDistinct(_c(x)) if exact else F.approx_count_distinct(_c(x), rsd)


def dcountif(x, pred: Column, exact: bool = True) -> Column:
    return F.countDistinct(F.when(pred, _c(x))) if exact else F.approx_count_distinct(F.when(pred, _c(x)))


# conditional arithmetic ----------------------------------------------
def sumif(x, pred: Column) -> Column:
    return F.sum(F.when(pred, _c(x)))


def avgif(x, pred: Column) -> Column:
    return F.avg(F.when(pred, _c(x)))


def minif(x, pred: Column) -> Column:
    return F.min(F.when(pred, _c(x)))


def maxif(x, pred: Column) -> Column:
    return F.max(F.when(pred, _c(x)))


# arg extremes ---------------------------------------------------------
def arg_max(ord_col, ret_col) -> Column:
    """KQL arg_max(ord, ret) → max_by. NOTE: non-deterministic under ties;
    oracle queries must use tie-free orderings."""
    return F.max_by(_c(ret_col), _c(ord_col))


def arg_min(ord_col, ret_col) -> Column:
    return F.min_by(_c(ret_col), _c(ord_col))


def take_any(x) -> Column:
    return F.any_value(_c(x), ignoreNulls=True)


# distribution ---------------------------------------------------------
def percentile(x, p: float, exact: bool = True) -> Column:
    """KQL percentile is T-digest-approximate; exact=True uses Spark's
    exact percentile for oracle parity, exact=False the mergeable
    percentile_approx sketch (the 100TB path)."""
    if exact:
        return F.percentile(_c(x), F.lit(p))
    return F.percentile_approx(_c(x), F.lit(p))


def percentiles(x, *ps: float, exact: bool = True) -> Column:
    if exact:
        return F.percentile(_c(x), F.array(*[F.lit(p) for p in ps]))
    return F.percentile_approx(_c(x), F.array(*[F.lit(p) for p in ps]))


def percentilew(x, w, p: float) -> Column:
    """Kusto percentilew — exact weighted percentile (lower-bound
    variant): smallest value whose cumulative weight reaches p of the
    total. Expression-level formulation so it composes inside any
    summarize: sorted (value, weight) pairs via collect_list, then two
    JVM folds (total weight, first crossing). Same per-group
    memory caveat as exact percentile; the keyed-window operator form
    (operators/sampling.py:percentilew_exact) is the bulk path."""
    xv, wv = _c(x).cast("double"), _c(w).cast("double")
    pairs = F.sort_array(
        F.collect_list(
            # Kusto aggregates ignore nulls: a null value or weight must
            # not enter the fold (a null weight would null the running
            # cumulative sum from that struct onward).
            F.when(
                xv.isNotNull() & wv.isNotNull(),
                F.struct(xv.alias("v"), wv.alias("w")),
            )
        )
    )
    total = F.aggregate(pairs, F.lit(0.0), lambda a, s: a + s["w"])
    return F.aggregate(
        pairs,
        F.struct(
            F.lit(0.0).alias("c"), F.lit(None).cast("double").alias("ans")
        ),
        lambda acc, s: F.struct(
            (acc["c"] + s["w"]).alias("c"),
            F.when(acc["ans"].isNotNull(), acc["ans"])
            .when(acc["c"] + s["w"] >= F.lit(p) * total, s["v"])
            .alias("ans"),
        ),
    )["ans"]


def percentilesw(x, w, *ps: float) -> Column:
    """Kusto percentilesw — array of exact weighted percentiles."""
    return F.array(*[percentilew(x, w, p) for p in ps])


def stdev(x) -> Column:
    return F.stddev_samp(_c(x))


def stdevp(x) -> Column:
    return F.stddev_pop(_c(x))


def variance(x) -> Column:
    return F.var_samp(_c(x))


def variancep(x) -> Column:
    return F.var_pop(_c(x))


# collections ----------------------------------------------------------
def make_list(x, sort: bool = False) -> Column:
    """collect_list; sort=True canonicalizes order (collect order is
    partition-dependent — required for deterministic comparison)."""
    c = F.collect_list(_c(x))
    return F.sort_array(c) if sort else c


def make_set(x, sort: bool = True) -> Column:
    c = F.collect_set(_c(x))
    return F.sort_array(c) if sort else c


def make_list_if(x, pred: Column, sort: bool = False) -> Column:
    c = F.collect_list(F.when(pred, _c(x)))
    return F.sort_array(c) if sort else c


def make_set_if(x, pred: Column, sort: bool = True) -> Column:
    c = F.collect_set(F.when(pred, _c(x)))
    return F.sort_array(c) if sort else c


def make_bag(k, v) -> Column:
    """(k, v) pair-collection convenience form — collect entries into a
    JSON object (dynamic). The Kusto-faithful aggregate over EXISTING
    bags is make_bag_merge below (KQL make_bag maps to that)."""
    return F.to_json(F.map_from_entries(F.collect_list(F.struct(_c(k), _c(v)))))


def make_bag_merge(bag, max_size: int | None = None) -> Column:
    """Kusto make_bag(bag [, maxSize]) — merge property bags across
    rows into one dynamic. Key conflicts: first encountered bag wins
    (Kusto documents the winner as arbitrary; the fold order is the
    collected row order). maxSize caps the number of KEYS kept, in
    merge order. One collect + a JVM fold — no Python, no shuffle
    beyond the aggregation itself."""
    bags = F.collect_list(_c(bag))
    merged = F.aggregate(
        bags,
        F.expr("map()").cast("map<string,string>"),
        # coalesce: a null/unparseable bag (or make_bag_if's filtered
        # when()-null) must be a no-op, not a null-propagating poison
        lambda acc, b: F.map_concat(
            acc,
            F.map_filter(
                F.coalesce(
                    F.from_json(b, "map<string,string>"),
                    F.expr("map()").cast("map<string,string>"),
                ),
                lambda k, v: ~F.array_contains(F.map_keys(acc), k),
            ),
        ),
    )
    if max_size is not None:
        merged = F.map_from_entries(
            F.slice(F.map_entries(merged), 1, int(max_size))
        )
    return F.to_json(merged)


# bitwise --------------------------------------------------------------
def binary_all_and(x) -> Column:
    return F.bit_and(_c(x))


def binary_all_or(x) -> Column:
    return F.bit_or(_c(x))


def binary_all_xor(x) -> Column:
    return F.bit_xor(_c(x))


# sketches (T2: hll / tdigest) ------------------------------------------
def hll(x, lg_k: int = 12) -> Column:
    """KQL hll(x) — mergeable HLL sketch (Spark ≥3.5 Datasketches)."""
    return F.hll_sketch_agg(_c(x), lg_k)


def hll_merge(sketch_col) -> Column:
    return F.hll_union_agg(_c(sketch_col))


def dcount_hll(sketch_col) -> Column:
    return F.hll_sketch_estimate(_c(sketch_col))


# ------------------------------------------------------------- round 7
def _schema_shape(v):
    """Recursive type shape of one parsed JSON value (Kusto buildschema
    vocabulary: long/real/string/bool; arrays keyed 'indexer')."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "long"
    if isinstance(v, float):
        return "real"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        s = None
        for x in v:
            s = _schema_merge(s, _schema_shape(x))
        return {"indexer": s if s is not None else "dynamic"}
    if isinstance(v, dict):
        out = {}
        for k, x in v.items():
            sh = _schema_shape(x)
            if sh is not None:
                out[k] = sh
        return out
    return "dynamic"


def _schema_merge(a, b):
    """Merge two shapes: equal → itself; dict alternatives merge
    per key; differing scalars become a SORTED list of alternatives
    (deterministic rendering)."""
    if a is None:
        return b
    if b is None:
        return a
    if a == b:
        return a
    la = a if isinstance(a, list) else [a]
    lb = b if isinstance(b, list) else [b]
    dicts = [x for x in la + lb if isinstance(x, dict)]
    scalars = []
    for x in la + lb:
        if not isinstance(x, dict) and x not in scalars:
            scalars.append(x)
    merged = []
    if dicts:
        d = {}
        for x in dicts:
            for k, v in x.items():
                d[k] = _schema_merge(d.get(k), v)
        merged.append(d)
    merged.extend(sorted(scalars))
    return merged[0] if len(merged) == 1 else merged


def buildschema(x) -> Column:
    """Kusto buildschema — minimal schema admitting every dynamic
    value of the group. Two-phase distributed shape: an Arrow kernel
    maps each row to its type-shape JSON (row-local), collect_set
    dedups shapes map-side (distinct shapes, not rows — tiny), and a
    row-local Arrow kernel folds the shape set into the final schema.
    Canonical rendering (sorted keys/alternatives) keeps the output
    deterministic across partitionings."""
    import json

    import pandas as pd

    from pyspark.sql import types as T

    def row_shape(vals):
        out = []
        for v in vals:
            if v is None:
                out.append(None)
                continue
            try:
                parsed = json.loads(v) if isinstance(v, str) else v
            except (ValueError, TypeError):
                parsed = v  # non-JSON scalar → its own type
            out.append(
                json.dumps(_schema_shape(parsed), sort_keys=True,
                           separators=(",", ":"))
            )
        return pd.Series(out)

    def merge_shapes(shape_sets):
        out = []
        for shapes in shape_sets:
            s = None
            for sh in (shapes if shapes is not None else []):
                if sh is not None:
                    s = _schema_merge(s, json.loads(sh))
            out.append(
                json.dumps(s, sort_keys=True, separators=(",", ":"))
                if s is not None
                else None
            )
        return pd.Series(out)

    # `from __future__ import annotations` stringifies hints, so bind
    # the pandas signature explicitly before wrapping
    row_shape.__annotations__ = {"vals": pd.Series, "return": pd.Series}
    merge_shapes.__annotations__ = {
        "shape_sets": pd.Series,
        "return": pd.Series,
    }
    row_udf = F.pandas_udf(T.StringType())(row_shape)
    merge_udf = F.pandas_udf(T.StringType())(merge_shapes)
    return merge_udf(F.collect_set(row_udf(_c(x))))
