"""Randomized KQL-vs-DuckDB differential fuzz: a seeded generator
emits the SAME random pipeline as both a KQL string and a DuckDB SQL
twin (filters → projections → aggregation → total-order sort), and the
driver-grade harness compares them. Deterministic seeds — failures
reproduce by case id. This generalizes the hand-written CASES table in
tests/test_kql.py to machine-made shapes."""

from __future__ import annotations

import random

import pytest

from meerkat_spark.engine import MeerkatEngine
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, register_views

N_CASES = 30


def _gen_pred(rng: random.Random) -> tuple[str, str]:
    kind = rng.randrange(5)
    if kind == 0:
        x = round(rng.uniform(0, 100), 2)
        op = rng.choice([">", "<", ">=", "<="])
        return f"value {op} {x}", f"value {op} {x}"
    if kind == 1:
        k, r = rng.randrange(2, 7), rng.randrange(0, 2)
        return f"user_id % {k} == {r}", f"user_id % {k} = {r}"
    if kind == 2:
        t = rng.choice(["click", "view", "purchase", "scroll"])
        neg = rng.random() < 0.3
        return (
            f"event_type {'!=' if neg else '=='} '{t}'",
            f"event_type {'<>' if neg else '='} '{t}'",
        )
    if kind == 3:
        n = rng.randrange(3, 8)
        return f"strlen(event_type) >= {n}", f"length(event_type) >= {n}"
    lo, hi = sorted(round(rng.uniform(0, 100), 1) for _ in range(2))
    return (
        f"value between ({lo} .. {hi})",
        f"value BETWEEN {lo} AND {hi}",
    )


def _gen_proj(rng: random.Random) -> tuple[str, str, str]:
    """(name, kql_expr, sql_expr) — row-level computed column."""
    kind = rng.randrange(5)
    if kind == 0:
        a, b = round(rng.uniform(0.5, 3), 2), round(rng.uniform(-5, 5), 2)
        return "c_arith", f"value * {a} + {b}", f"value * {a} + {b}"
    if kind == 1:
        return "c_upper", "toupper(event_type)", "upper(event_type)"
    if kind == 2:
        return (
            "c_cat",
            "strcat(event_type, '-', tostring(user_id))",
            "event_type || '-' || CAST(user_id AS VARCHAR)",
        )
    if kind == 3:
        return "c_len", "strlen(event_type)", "CAST(length(event_type) AS BIGINT)"
    k = rng.randrange(2, 9)
    return "c_mod", f"user_id % {k}", f"user_id % {k}"


def _gen_aggs(rng: random.Random) -> list[tuple[str, str, str]]:
    """[(name, kql, sql)] aggregate list (doubles rounded both sides —
    the suite's cross-engine summation convention)."""
    pool = [
        ("a_n", "count()", "COUNT(*)"),
        ("a_sum", "round(sum(value), 2)", "ROUND(SUM(value), 2)"),
        # avg deliberately absent: tiny random groups over the 2dp
        # value column land EXACTLY on rounding boundaries, where the
        # engines' 1-ulp summation noise legitimately rounds apart
        # (observed at ~0.7% of seeds). The hand-written suite keeps
        # avg coverage on large, boundary-free groups.
        ("a_min", "min(value)", "MIN(value)"),
        ("a_max", "max(value)", "MAX(value)"),
        ("a_dc", "dcount(user_id)", "COUNT(DISTINCT user_id)"),
        (
            "a_cif",
            "countif(value > 50)",
            "COUNT(CASE WHEN value > 50 THEN 1 END)",
        ),
    ]
    n = rng.randrange(1, 4)
    return rng.sample(pool, n)


def _gen_case(seed: int) -> tuple[str, str]:
    rng = random.Random(seed)
    kql = ["events"]
    sql_where, sql_cols = [], []
    for _ in range(rng.randrange(0, 3)):
        kp, sp = _gen_pred(rng)
        kql.append(f"| where {kp}")
        sql_where.append(sp)
    where = (" WHERE " + " AND ".join(sql_where)) if sql_where else ""
    shape = rng.random()
    if shape < 0.1:
        # string scalar pipeline — the 0-based/1-based trap zone:
        # KQL substring/indexof are 0-based, SQL's are 1-based
        i, n = rng.randrange(0, 4), rng.randrange(1, 5)
        ch = rng.choice(["c", "i", "e", "u", "zz"])
        n_take = rng.randrange(10, 50)
        kql.append(
            f"| project event_id, ss = substring(event_type, {i}, {n}),"
            f" ix = indexof(event_type, '{ch}'),"
            f" rp = replace_string(event_type, '{ch}', '#'),"
            " lo = tolower(strcat(event_type, '_X'))"
        )
        kql.append(f"| sort by event_id asc | take {n_take}")
        sql = (
            f"SELECT event_id, substr(event_type, {i + 1}, {n}) AS ss,"
            f" CAST(strpos(event_type, '{ch}') - 1 AS BIGINT) AS ix,"
            f" replace(event_type, '{ch}', '#') AS rp,"
            " lower(event_type || '_X') AS lo"
            f" FROM events{where} ORDER BY event_id LIMIT {n_take}"
        )
        return " ".join(kql), sql
    if shape < 0.2:
        # datetime scalar pipeline (trunc/add/part twins)
        k = rng.randrange(1, 48)
        unit_k, unit_s = rng.choice(
            [("hour", "HOUR"), ("day", "DAY"), ("minute", "MINUTE")]
        )
        n_take = rng.randrange(10, 50)
        kql.append(
            "| project event_id, d0 = startofday(ts),"
            f" da = datetime_add('{unit_k}', {k}, ts),"
            " hh = hourofday(ts), dow = dayofmonth(ts)"
        )
        kql.append(f"| sort by event_id asc | take {n_take}")
        sql = (
            "SELECT event_id, date_trunc('day', ts) AS d0,"
            f" ts + INTERVAL {k} {unit_s} AS da,"
            " CAST(hour(ts) AS INT) AS hh,"
            " CAST(day(ts) AS INT) AS dow"
            f" FROM events{where} ORDER BY event_id LIMIT {n_take}"
        )
        return " ".join(kql), sql
    if shape < 0.25:
        # time-binned aggregation (bin → time_bucket twin)
        unit_k, unit_s = rng.choice(
            [("1h", "1 hour"), ("1d", "1 day"), ("6h", "6 hours")]
        )
        kql.append(
            f"| summarize n = count(), s = round(sum(value), 2)"
            f" by event_type, b = bin(ts, {unit_k})"
        )
        sql = (
            "SELECT event_type,"
            f" time_bucket(INTERVAL '{unit_s}', ts) AS b,"
            " COUNT(*) AS n, ROUND(SUM(value), 2) AS s"
            f" FROM events{where} GROUP BY 1, 2"
        )
        return " ".join(kql), sql
    if shape < 0.3:
        # self-join per-user rollup: totals joined back to rows
        t = rng.choice(["click", "view", "purchase"])
        n_take = rng.randrange(10, 60)
        kql.append(
            "| join kind=inner (events | where event_type =="
            f" '{t}' | summarize u_n = count() by user_id) on user_id"
        )
        kql.append("| project event_id, user_id, u_n")
        kql.append(f"| sort by event_id asc | take {n_take}")
        sql = (
            "SELECT event_id, e.user_id AS user_id, u_n"
            f" FROM (SELECT * FROM events{where}) e"
            " JOIN (SELECT user_id, COUNT(*) AS u_n FROM events WHERE"
            f" event_type = '{t}' GROUP BY user_id) g"
            " ON e.user_id = g.user_id"
            f" ORDER BY event_id LIMIT {n_take}"
        )
        return " ".join(kql), sql
    name, kexpr, sexpr = _gen_proj(rng)
    kql.append(f"| extend {name} = {kexpr}")
    if rng.random() < 0.6:
        # aggregate tail
        aggs = _gen_aggs(rng)
        keys = rng.sample(
            [("event_type", "event_type"), (name, name)], rng.randrange(1, 3)
        )
        kql.append(
            "| summarize "
            + ", ".join(f"{n} = {k}" for n, k, _ in aggs)
            + " by "
            + ", ".join(k for k, _ in keys)
        )
        sql = (
            "SELECT "
            + ", ".join(k for k, _ in keys)
            + ", "
            + ", ".join(f"{s} AS {n}" for n, _, s in aggs)
            + f" FROM (SELECT *, {sexpr} AS {name} FROM events{where})"
            + " GROUP BY "
            + ", ".join(k for k, _ in keys)
        )
    else:
        # row-level tail with a total-order top-k
        n_take = rng.randrange(5, 40)
        kql.append(f"| project event_id, {name}")
        kql.append(f"| sort by event_id asc | take {n_take}")
        sql = (
            f"SELECT event_id, {sexpr} AS {name} FROM events{where}"
            f" ORDER BY event_id LIMIT {n_take}"
        )
    return " ".join(kql), sql


@pytest.mark.parametrize("seed", range(N_CASES))
def test_random_pipeline_matches_duckdb(spark, duck, seed):
    register_views(duck, SF_ORACLE)
    kql, sql = _gen_case(seed)
    df = MeerkatEngine(spark, SF_ORACLE).kql(kql).to_df()
    probs = compare(df, duck, sql, f"fuzz{seed}")
    assert not probs, (kql, sql, probs)
