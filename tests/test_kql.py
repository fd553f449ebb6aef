"""KQL front-end tests: each KQL query is checked against a DuckDB SQL
oracle through the same differential harness the driver uses."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meerkat_spark.engine import MeerkatEngine
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, register_views

CASES: dict[str, tuple[str, str]] = {
    "where_project": (
        """events | where event_type == 'click' and value > 10
           | project event_id, user_id, vat = value * 1.21""",
        "SELECT event_id, user_id, value*1.21 AS vat FROM events "
        "WHERE event_type='click' AND value > 10",
    ),
    "summarize_bin": (
        """events | where event_type == 'click'
           | summarize n=count(), v=round(avg(value), 4) by user_id, h=bin(ts, 1h)""",
        "SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS h, COUNT(*) AS n, "
        "ROUND(AVG(value),4) AS v FROM events WHERE event_type='click' GROUP BY 1,2",
    ),
    "top_tiebreak": (
        "orders | project o_orderkey, o_totalprice | sort by o_totalprice desc, o_orderkey asc | take 10",
        "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    ),
    "join_inner": (
        """orders | join kind=inner (customer) on $left.o_custkey == $right.c_custkey
           | summarize revenue=round(sum(o_totalprice), 2) by c_mktsegment""",
        "SELECT c_mktsegment, ROUND(SUM(o_totalprice),2) AS revenue FROM orders "
        "JOIN customer ON o_custkey=c_custkey GROUP BY c_mktsegment",
    ),
    "join_leftanti": (
        "customer | join kind=leftanti (orders) on $left.c_custkey == $right.o_custkey | project c_custkey",
        "SELECT c_custkey FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",
    ),
    "distinct": (
        "events | distinct event_type",
        "SELECT DISTINCT event_type FROM events",
    ),
    "count": ("events | count", "SELECT COUNT(*) AS Count FROM events"),
    "extend_case_funcs": (
        """lineitem | extend disc = l_extendedprice * (1 - l_discount)
           | extend band = iff(l_quantity < 25, 'small', 'big')
           | project l_orderkey, l_linenumber, disc, band""",
        "SELECT l_orderkey, l_linenumber, l_extendedprice*(1-l_discount) AS disc, "
        "CASE WHEN l_quantity < 25 THEN 'small' ELSE 'big' END AS band FROM lineitem",
    ),
    "string_funcs": (
        """documents | where doc_id < 50
           | project doc_id, up = toupper(substring(text, 0, 4)),
                     n = strlen(text), first = split(text, ' ', 0)""",
        "SELECT doc_id, upper(substring(text,1,4)) AS up, length(text) AS n, "
        "string_split(text,' ')[1] AS first FROM documents WHERE doc_id < 50",
    ),
    "has_predicate": (
        "documents | where text has 'spark' | project doc_id",
        "SELECT doc_id FROM documents WHERE regexp_matches(text, '(?i)\\bspark\\b')",
    ),
    "in_and_between": (
        """events | where event_type in ('click', 'view') and value between (10 .. 20)
           | project event_id, value""",
        "SELECT event_id, value FROM events WHERE event_type IN ('click','view') "
        "AND value BETWEEN 10 AND 20",
    ),
    "datetime_funcs": (
        """events | where event_id < 100
           | project event_id, d = startofday(ts), hh = hourofday(ts), q = bin(ts, 15m)""",
        "SELECT event_id, date_trunc('day', ts) AS d, hour(ts) AS hh, "
        "time_bucket(INTERVAL '15 minutes', ts) AS q FROM events WHERE event_id < 100",
    ),
    "dynamic_member": (
        "events | where event_id < 100 | project event_id, k = toint(props.k)",
        "SELECT event_id, CAST(json_extract_string(props,'$.k') AS INT) AS k "
        "FROM events WHERE event_id < 100",
    ),
    "union_kql": (
        """customer | project key = c_custkey, bal = c_acctbal
           | union kind=inner (supplier | project key = s_suppkey, bal = s_acctbal)""",
        "SELECT c_custkey AS key, c_acctbal AS bal FROM customer "
        "UNION ALL SELECT s_suppkey, s_acctbal FROM supplier",
    ),
    "range_source": (
        "range x from 1 to 100 step 3 | extend x2 = x * x",
        "SELECT x, x*x AS x2 FROM generate_series(1, 100, 3) t(x)",
    ),
    "print_source": (
        "print a = 1 + 2, s = strcat('ab', '-', 'cd')",
        "SELECT CAST(3 AS BIGINT) AS a, 'ab-cd' AS s",
    ),
    "let_lambda_invoke": (
        """let vat = (p: real) { p * 1.21 };
           let big = (p: real, cutoff: long) { iff(p > cutoff, 'big', 'small') };
           orders | where o_orderkey < 500
           | project o_orderkey, taxed = vat(o_totalprice),
                     size_band = big(o_totalprice, 250000)""",
        """
        SELECT o_orderkey, o_totalprice * 1.21 AS taxed,
               CASE WHEN o_totalprice > 250000 THEN 'big' ELSE 'small' END AS size_band
        FROM orders WHERE o_orderkey < 500
        """,
    ),
    "as_operator": (
        """events | where value > 95 | as hot
           | join kind=leftsemi hot on $left.event_id == $right.event_id
           | summarize n = count() by event_type""",
        """
        SELECT event_type, COUNT(*) AS n FROM events WHERE value > 95
        GROUP BY event_type
        """,
    ),
    "let_scalar": (
        """let threshold = 90;
           events | where value > threshold | summarize n = count() by event_type""",
        "SELECT event_type, COUNT(*) AS n FROM events WHERE value > 90 GROUP BY event_type",
    ),
    "let_table": (
        """let big = events | where value > 90;
           big | summarize n = count() by event_type""",
        "SELECT event_type, COUNT(*) AS n FROM events WHERE value > 90 GROUP BY event_type",
    ),
    "mv_expand_kql": (
        """documents | where doc_id < 5 | project doc_id, w = split(text, ' ')
           | mv-expand w | summarize n = count() by w""",
        "SELECT w, COUNT(*) AS n FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w "
        "FROM documents WHERE doc_id < 5) GROUP BY w",
    ),
    "parse_where_op": (
        "documents | parse-where source with 'src' src_num:int | project doc_id, src_num",
        "SELECT doc_id, TRY_CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) AS src_num "
        "FROM documents WHERE regexp_matches(source, 'src(\\d+)')",
    ),
    "parse_op": (
        "documents | parse source with 'src' src_num:int | project doc_id, src_num",
        "SELECT doc_id, TRY_CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) AS src_num "
        "FROM documents",
    ),
    "summarize_agg_funcs": (
        """lineitem | summarize s = round(sum(l_quantity), 2),
                     d = dcount(l_partkey),
                     m = max(l_extendedprice),
                     cif = countif(l_quantity > 25) by l_returnflag""",
        "SELECT l_returnflag, ROUND(SUM(l_quantity),2) AS s, COUNT(DISTINCT l_partkey) AS d, "
        "MAX(l_extendedprice) AS m, COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS cif "
        "FROM lineitem GROUP BY l_returnflag",
    ),
    "window_funcs_serialized": (
        """events | where user_id == 5 | sort by ts asc, event_id asc
           | extend rn = row_number(), pv = prev(value),
                    cum = round(row_cumsum(value), 4)
           | project event_id, rn, pv, cum""",
        """
        SELECT event_id,
               CAST(row_number() OVER w AS INT) AS rn,
               lag(value) OVER w AS pv,
               ROUND(SUM(value) OVER (ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum
        FROM events WHERE user_id = 5
        WINDOW w AS (ORDER BY ts, event_id)
        """,
    ),
    "partition_by_topk": (
        # order key is unique (event_id) so the top-k set is deterministic
        """events | partition by event_type ( top 3 by event_id )
           | project event_type, event_id, value""",
        """
        SELECT event_type, event_id, value FROM (
          SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY event_id DESC) AS rk
          FROM events) WHERE rk <= 3
        """,
    ),
    "mv_apply_subquery": (
        """documents | where doc_id < 40
           | extend words = split(text, ' ')
           | mv-apply w = words on (
               where strlen(w) > 3
               | summarize n_long = count(), longest = max(strlen(w)) )
           | project doc_id, n_long, longest""",
        """
        SELECT doc_id,
               COUNT(*) AS n_long,
               CAST(MAX(length(w)) AS BIGINT) AS longest
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE doc_id < 40)
        WHERE length(w) > 3
        GROUP BY doc_id
        """,
    ),
    "top_nested_two_levels": (
        """customer
           | join kind=inner nation on $left.c_nationkey == $right.n_nationkey
           | join kind=inner region on $left.n_regionkey == $right.r_regionkey
           | top-nested 3 of r_name by n_cust = count(),
             top-nested 2 of n_name by n_cust_nation = count()""",
        """
        WITH base AS (
          SELECT r_name, n_name FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        ), l1 AS (
          SELECT r_name, COUNT(*) AS n_cust,
                 row_number() OVER (ORDER BY COUNT(*) DESC, r_name) AS rk
          FROM base GROUP BY r_name
        ), l2 AS (
          SELECT r_name, n_name, COUNT(*) AS n_cust_nation,
                 row_number() OVER (PARTITION BY r_name
                                    ORDER BY COUNT(*) DESC, n_name) AS rk
          FROM base GROUP BY r_name, n_name
        )
        SELECT l1.r_name, l1.n_cust, l2.n_name, l2.n_cust_nation
        FROM l1 JOIN l2 ON l1.r_name = l2.r_name
        WHERE l1.rk <= 3 AND l2.rk <= 2
        """,
    ),
    "ago_now_sanity": (
        "events | where ts < now() | count",
        "SELECT COUNT(*) AS Count FROM events WHERE ts < now()",
    ),
    "search_kql": (
        "documents | search 'vector' | project doc_id",
        "SELECT doc_id FROM documents WHERE lower(text) LIKE '%vector%' "
        "OR lower(lang) LIKE '%vector%' OR lower(source) LIKE '%vector%'",
    ),
    "timespan_arith": (
        "events | where event_id < 50 | project event_id, later = ts + 1h, earlier = ts - 30m",
        "SELECT event_id, ts + INTERVAL '1 hour' AS later, ts - INTERVAL '30 minutes' AS earlier "
        "FROM events WHERE event_id < 50",
    ),
    "evaluate_sliding_window_counts": (
        """events | evaluate sliding_window_counts(user_id, ts,
             datetime(2024-01-08), datetime(2024-01-28), 7d, 1d)""",
        "WITH grid AS (SELECT g AS t FROM generate_series("
        "TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-28', INTERVAL 1 DAY) s(g)) "
        "SELECT grid.t, count(e.user_id) AS \"Count\", "
        "count(DISTINCT e.user_id) AS \"Dcount\" FROM grid LEFT JOIN events e "
        "ON e.ts > grid.t - INTERVAL 7 DAY AND e.ts <= grid.t GROUP BY grid.t",
    ),
    "evaluate_activity_counts_metrics": (
        """events | evaluate activity_counts_metrics(user_id, ts,
             datetime(2024-01-01), datetime(2024-01-30), 1d)""",
        "WITH binned AS (SELECT user_id, CAST(floor((epoch_us(ts) - "
        "epoch_us(TIMESTAMP '2024-01-01')) / 86400000000) AS BIGINT) AS k "
        "FROM events), b AS (SELECT * FROM binned WHERE k BETWEEN 0 AND 29), "
        "grid AS (SELECT unnest(range(0, 30)) AS k), "
        "per_bin AS (SELECT k, count(*) AS cnt, count(distinct user_id) AS dc "
        "FROM b GROUP BY k), "
        "fs AS (SELECT user_id, min(k) AS k FROM b GROUP BY user_id), "
        "nd AS (SELECT k, count(*) AS ndc FROM fs GROUP BY k), "
        "j AS (SELECT grid.k, coalesce(cnt,0) AS \"count\", "
        "coalesce(dc,0) AS dcount, coalesce(ndc,0) AS new_dcount "
        "FROM grid LEFT JOIN per_bin USING (k) LEFT JOIN nd USING (k)) "
        "SELECT make_timestamp(k * 86400000000 + "
        "epoch_us(TIMESTAMP '2024-01-01')) AS t, \"count\", dcount, new_dcount, "
        "CAST(sum(new_dcount) OVER (ORDER BY k) AS BIGINT) AS aggregated_dcount FROM j",
    ),
    "evaluate_rolling_percentile": (
        "events | evaluate rolling_percentile(value, 50, ts, 1d, 7)",
        "WITH b AS (SELECT value, CAST(floor(epoch_us(ts) / 86400000000) "
        "AS BIGINT) AS bb FROM events), "
        "bounds AS (SELECT min(bb) AS lo, max(bb) AS hi FROM b), "
        "ex AS (SELECT b.value, b.bb + s.j AS tb FROM b "
        "CROSS JOIN generate_series(0, 6) AS s(j)) "
        "SELECT make_timestamp(tb * 86400000000) AS t, "
        "round(quantile_cont(value, 0.5), 4) AS p50 FROM ex, bounds "
        "WHERE tb BETWEEN bounds.lo AND bounds.hi GROUP BY tb",
    ),
    "evaluate_rows_near": (
        """events | sort by ts asc, event_id asc
           | evaluate rows_near(event_type == 'error', 2, 1)
           | project event_id, event_type""",
        "WITH f AS (SELECT event_id, event_type, "
        "max(CASE WHEN event_type='error' THEN 1 ELSE 0 END) OVER ("
        "ORDER BY ts, event_id ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING) AS nearf "
        "FROM events) SELECT event_id, event_type FROM f WHERE nearf=1",
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_kql_vs_sql(spark, duck, name):
    kql, sql = CASES[name]
    register_views(duck, SF_ORACLE)
    eng = MeerkatEngine(spark, SF_ORACLE)
    df = eng.kql(kql).to_df()
    problems = compare(df, duck, sql, name)
    assert not problems, "\n".join(problems)


def test_kql_make_series(spark):
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, SF_ORACLE)
    df = eng.kql(
        """events | make-series n = count() default = 0 on ts
           from datetime(2024-01-01) to datetime(2024-01-30) step 1d by event_type"""
    ).to_df()
    rows = df.collect()
    assert len(rows) == 5
    for r in rows:
        assert len(r.ts) == 30 and len(r.n) == 30
        assert r.ts[0].isoformat().startswith("2024-01-01")
    # derived bounds (no from/to): same shape
    df2 = eng.kql(
        "events | make-series n = count() default = 0 on ts step 1d by event_type"
    ).to_df()
    assert all(len(r.n) == 30 for r in df2.collect())


def test_kql_evaluate_bag_unpack(spark):
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, SF_ORACLE)
    df = eng.kql(
        "events | where event_id < 20 | project event_id, props | evaluate bag_unpack(props)"
    ).to_df()
    assert set(df.columns) == {"event_id", "k"}
    assert df.filter(F.col("k").isNull()).count() == 0


def test_kql_evaluate_pivot(spark):
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, SF_ORACLE)
    df = eng.kql(
        "events | project user_id, event_type | evaluate pivot(event_type)"
    ).to_df()
    assert "click" in df.columns and "user_id" in df.columns


def test_kql_syntax_error(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    from meerkat_spark.kql import KqlSyntaxError

    with pytest.raises(KqlSyntaxError):
        eng.kql("events | frobnicate x")
    with pytest.raises(KqlSyntaxError):
        eng.kql("events | where (value > ")


def test_kql_bag_unpack_finds_late_keys(spark):
    """Key discovery must cover the FULL column: a key first appearing
    past row 1000 (beyond the old sampling cutoff) still becomes a
    column."""
    from meerkat_spark.engine import MeerkatEngine

    df = spark.range(1500).selectExpr(
        "id",
        "CASE WHEN id < 1200 THEN concat('{\"early\": ', id, '}') "
        "ELSE concat('{\"late_key\": ', id, '}') END AS props",
    )
    eng = MeerkatEngine(spark, SF_ORACLE)
    eng.catalog._cache["bags"] = df
    out = eng.kql("bags | evaluate bag_unpack(props)").to_df()
    assert set(out.columns) == {"id", "early", "late_key"}
    assert out.filter(F.col("late_key").isNotNull()).count() == 300


def test_kql_find_fork_facet_grammar(spark):
    """find/fork/facet accepted by the grammar and shaped correctly."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    f1 = eng.kql("find in (documents, events) 'spark'").to_df()
    assert f1.columns[0] == "source_"
    assert {"doc_id", "event_id"} <= set(f1.columns)  # outer union widens
    f2 = eng.kql(
        "find in (orders, customer) where o_totalprice > 500000 or c_acctbal > 9000"
    ).to_df()
    srcs = {r.source_ for r in f2.select("source_").distinct().collect()}
    assert srcs <= {"orders", "customer"} and "customer" in srcs
    forked = eng.kql(
        """events | where event_id < 100 | fork
           a = ( summarize metric = todouble(count()) by event_type )
           b = ( summarize metric = round(avg(value), 4) by event_type )"""
    ).to_df()
    assert forked.columns == ["fork_leg", "event_type", "metric"]
    assert {r.fork_leg for r in forked.collect()} == {"a", "b"}
    faceted = eng.kql("events | facet by event_type").to_df()
    assert faceted.columns == ["facet_column", "value", "count_"]
    total = sum(r.count_ for r in faceted.collect())
    assert total == eng.table("events").to_df().count()


def test_kql_datatable_top_hitters(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    dt = eng.kql(
        """datatable(name: string, x: long, d: datetime)
           [ 'a', 1, datetime(2024-01-02), 'b', -2, datetime(2024-01-03 12:30:00) ]"""
    ).to_df()
    assert dt.count() == 2
    assert [f.dataType.simpleString() for f in dt.schema.fields] == [
        "string", "bigint", "timestamp",
    ]
    assert {r.x for r in dt.collect()} == {1, -2}
    th = eng.kql("events | top-hitters 2 of event_type").to_df().collect()
    assert len(th) == 2
    assert th[0].approximate_count_event_type >= th[1].approximate_count_event_type


def test_kql_round3_scalar_functions(spark):
    """New scalar surface: literal args must compile as literals (the
    dispatch wraps value positions), arrays/math behave per KQL."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    row = eng.kql(
        """print
           g = strcat_array(pack_array('x','y','z'), '-'),
           h = strrep('ab', 3, ','),
           i = translate('abc', 'xyz', 'cabbage'),
           j = extract_json('$.k', '{"k": 42}'),
           k = round(degrees(pi()), 2),
           m = array_rotate_left(pack_array(1,2,3,4), 1),
           n = array_shift_right(pack_array(1,2,3), 1),
           o = set_has_element(pack_array(1,2), 2),
           p = round(jaccard_index(pack_array(1,2,3), pack_array(2,3,4)), 3),
           q = not(2 > 3),
           r = exp2(10),
           s = isfinite(todouble('Infinity')),
           u = toupper('abc')"""
    ).to_df().collect()[0]
    assert row.g == "x-y-z"
    assert row.h == "ab,ab,ab"
    assert row.i == "zxyyxge"
    assert row.j == "42"
    assert row.k == 180.0
    assert row.m == [2, 3, 4, 1]
    assert row.n == [None, 1, 2]
    assert row.o is True
    assert row.p == 0.5
    assert row.q is True
    assert row.r == 1024.0
    assert row.s is False
    assert row.u == "ABC"


def test_kql_round3_aggregates(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    df = spark.createDataFrame(
        [(1, 2.0, "x"), (1, None, "y"), (1, 4.5, None), (2, 5.0, "z")],
        "g long, v double, s string",
    )
    eng.catalog._cache["t"] = df
    out = eng.kql(
        """t | summarize
           lwn = make_list_with_nulls(v), cd = count_distinct(s),
           cdi = count_distinctif(s, v > 1), sd = sum_distinct(v),
           p50 = percentile(v, 50), ps = percentiles(v, 50, 95),
           cv = round(covariance(v, v), 4)
           by g | sort by g asc"""
    ).to_df().collect()
    r1, r2 = out
    assert r1.lwn == [2.0, 4.5, None]  # null RETAINED (collect_list drops it)
    assert (r1.cd, r1.cdi, r1.sd) == (2, 1, 6.5)
    assert r1.p50 == 3.25  # KQL percentile arg is 0-100
    assert r1.ps == [3.25, 4.375]
    assert r2.cv is None  # single-row sample covariance


def test_kql_dynamic_literal_and_series_functions(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    row = eng.kql(
        """print a = dynamic([1, 2, 3]),
                 s = array_sum(dynamic([1.0, 2.5])),
                 m = mv = array_length(dynamic(['x','y']))"""
        .replace("m = mv =", "m =")
    ).to_df().collect()[0]
    assert row.a == [1, 2, 3]
    assert row.s == 3.5
    assert row.m == 2
    out = eng.kql(
        """events | make-series n = count() default = 0 on ts step 1d by event_type
           | extend ma = series_fir(n, dynamic([1, 1, 1])),
                    ol = series_outliers(n)
           | project event_type, ma, ol"""
    ).to_df().collect()
    assert all(len(r.ma) == len(r.ol) for r in out)
    # a normalized FIR is a smoothing: output stays within the input range
    for r in out[:2]:
        assert min(r.ma) >= 0 and len(r.ma) == 30


def test_kql_mv_expand_typed_and_indexed(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    df = spark.createDataFrame([(1, ["10", "x", "30"])], "id long, arr array<string>")
    eng.catalog._cache["t"] = df
    out = eng.kql("t | mv-expand arr to typeof(long)").to_df().collect()
    assert [r.arr for r in out] == [10, None, 30]  # misfit 'x' → null
    out2 = eng.kql("t | mv-expand with_itemindex=ix arr").to_df().collect()
    assert [(r.ix, r.arr) for r in out2] == [(0, "10"), (1, "x"), (2, "30")]


def test_kql_render_top_nulls_shufflekey(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    # render is a presentation no-op
    r = eng.kql(
        "events | summarize n = count() by event_type | render barchart"
    ).to_df()
    assert set(r.columns) == {"event_type", "n"}
    # top with explicit nulls placement
    df = spark.createDataFrame([(1, 5.0), (2, None), (3, 1.0)], "id long, v double")
    eng.catalog._cache["t"] = df
    top = eng.kql("t | top 2 by v desc nulls first").to_df().collect()
    assert [r2.id for r2 in top] == [2, 1]
    # shufflekey hint keeps results identical and plans a repartition
    out = eng.kql(
        """orders | join kind=inner hint.shufflekey=o_custkey (customer)
           on $left.o_custkey == $right.c_custkey
           | summarize n = count() by c_mktsegment"""
    ).to_df()
    base = eng.kql(
        """orders | join kind=inner (customer)
           on $left.o_custkey == $right.c_custkey
           | summarize n = count() by c_mktsegment"""
    ).to_df()
    assert sorted((r3.c_mktsegment, r3.n) for r3 in out.collect()) == sorted(
        (r3.c_mktsegment, r3.n) for r3 in base.collect()
    )


def test_kql_fork_leg_sort_state_isolated(spark):
    """A sort inside one fork leg must not feed its siblings' window
    functions: a window call in a later unsorted leg raises the same
    serialize error it would outside a fork."""
    from meerkat_spark.kql import KqlSyntaxError

    eng = MeerkatEngine(spark, SF_ORACLE)
    with pytest.raises(KqlSyntaxError, match="serialized"):
        eng.kql(
            """events | where event_id < 50 | fork
               a = ( sort by ts asc | extend rn = row_number() | project rn )
               b = ( extend rn = row_number() | project rn )"""
        ).to_df()


def test_kql_union_as_source(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    out = eng.kql(
        """union (customer | project key = c_custkey),
                 (supplier | project key = s_suppkey)
           | count"""
    ).to_df().collect()[0]
    base = (
        eng.table("customer").to_df().count()
        + eng.table("supplier").to_df().count()
    )
    assert out.Count == base
    # bare-table source union with schema widening
    wide = eng.kql("union customer, supplier | count").to_df().collect()[0]
    assert wide.Count == base


def test_kql_scan_matches_builder(spark):
    """Grammar scan ≡ operators.scan.scan_steps over the same order."""
    from meerkat_spark.operators.scan import scan_steps

    eng = MeerkatEngine(spark, SF_ORACLE)
    kql_out = eng.kql(
        """events
           | where user_id < 20
           | sort by ts asc, event_id asc
           | scan with (step s1: event_type == "view";
                        step s2: event_type == "click";
                        step s3: event_type == "purchase";)
           | project event_id, match_id, step_index"""
    ).to_df()
    ev = MeerkatEngine(spark, SF_ORACLE).table("events").to_df()
    direct = scan_steps(
        ev.filter(F.col("user_id") < 20).select("event_id", "ts", "event_type"),
        steps=[
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        order_by=["ts", "event_id"],
    ).select("event_id", "match_id", "step_index")
    assert sorted(map(tuple, kql_out.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_kql_scan_with_match_id_and_requires_sort(spark):
    from meerkat_spark.kql import KqlSyntaxError

    eng = MeerkatEngine(spark, SF_ORACLE)
    out = eng.kql(
        """events | where user_id == 3 | sort by ts asc
           | scan with_match_id = funnel_id with (step a: event_type == "view";)"""
    ).to_df()
    assert "funnel_id" in out.columns
    with pytest.raises(KqlSyntaxError, match="serialized"):
        eng.kql(
            'events | scan with (step a: event_type == "view";)'
        ).to_df()


def test_kql_materialize_let(spark):
    """materialize(pipeline) binds a cached table usable like any let
    table; result matches the uncached form and the plan reuses the
    persisted result (InMemoryTableScan)."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    out = eng.kql(
        """let big = materialize(lineitem | where l_quantity > 45
                                 | summarize n = count() by l_returnflag);
           big | sort by l_returnflag asc | project l_returnflag, n"""
    ).to_df()
    got = [tuple(r) for r in out.collect()]
    assert "InMemoryTableScan" in out._jdf.queryExecution().executedPlan().toString()
    # the persisted subquery is tracked on the engine...
    assert len(eng._kql_persisted) == 1
    cached = eng._kql_persisted[0]
    assert cached.storageLevel.useMemory
    # ...and released when the next query runs (no session-lifetime leak)
    plain = eng.kql(
        """lineitem | where l_quantity > 45
           | summarize n = count() by l_returnflag
           | sort by l_returnflag asc | project l_returnflag, n"""
    ).to_df()
    assert got == [tuple(r) for r in plain.collect()]
    assert not cached.storageLevel.useMemory
    assert eng._kql_persisted == []


def test_kql_repeat_and_array_split(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    out = eng.kql(
        """print r = repeat(7, 3), rneg = repeat(1, -2),
                 s = array_split(dynamic([1,2,3,4,5]), 2),
                 sneg = array_split(dynamic([1,2,3,4,5]), -2),
                 sbig = array_split(dynamic([1,2]), 9)"""
    ).to_df().collect()[0]
    assert out.r == [7, 7, 7]
    assert out.rneg == []
    assert out.s == [[1, 2], [3, 4, 5]]
    assert out.sneg == [[1, 2, 3], [4, 5]]
    assert out.sbig == [[1, 2], []]


def test_kql_has_any_has_all(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    base = "documents | where doc_id < 100 "
    any_n = eng.kql(base + '| where text has_any ("spark", "window") | count').to_df().collect()[0][0]
    all_n = eng.kql(base + '| where text has_all ("spark", "window") | count').to_df().collect()[0][0]
    spark_n = eng.kql(base + '| where text has "spark" | count').to_df().collect()[0][0]
    window_n = eng.kql(base + '| where text has "window" | count').to_df().collect()[0][0]
    both = eng.kql(base + '| where text has "spark" and text has "window" | count').to_df().collect()[0][0]
    assert all_n == both and all_n <= min(spark_n, window_n)
    assert any_n == spark_n + window_n - both and any_n >= max(spark_n, window_n)
    assert any_n > 0


def test_kql_scan_declare_assign(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    out = eng.kql(
        """events
           | where user_id < 10
           | sort by ts asc, event_id asc
           | scan declare (t0: datetime) with (
               step s1 output=none: event_type == "view" => t0 = ts;
               step s2: event_type == "purchase";)
           | extend latency_s = datetime_diff("second", ts, t0)
           | project user_id, latency_s"""
    ).to_df()
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.latency_s is not None and r.latency_s >= 0 for r in rows)


def test_kql_evaluate_narrow(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    out = eng.kql(
        """nation | project n_nationkey, n_name
           | sort by n_nationkey asc
           | evaluate narrow()"""
    ).to_df()
    rows = out.collect()
    n = eng.table("nation").to_df().count()
    assert len(rows) == 2 * n
    assert {r.Column for r in rows} == {"n_nationkey", "n_name"}
    r0 = {(r.Column, r.Value) for r in rows if r.Row == 0}
    assert ("n_nationkey", "0") in r0
    # r15: Kusto IMPLIES the serialization — a bare narrow() freezes
    # the current order instead of raising (probe-backlog closure)
    bare = eng.kql("nation | evaluate narrow()").to_df()
    assert bare.columns == ["Row", "Column", "Value"]
    n_cols = len(eng.table("nation").to_df().columns)
    assert bare.count() == n_cols * n


def test_kql_autocluster_segments(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    out = eng.kql(
        "documents | project lang, source | evaluate autocluster(5.0)"
    ).to_df().collect()
    assert len(out) > 0
    total_pct_single = [r for r in out if r.source is None and r.lang is not None]
    assert total_pct_single, "expected per-lang wildcard segments"
    # no grand-total row, every segment covers >= 5%
    assert all(not (r.lang is None and r.source is None) for r in out)
    assert all(r.Percent >= 5.0 for r in out)


def test_kql_series_decompose_struct_member(spark):
    """series_decompose returns a struct; member access resolves via
    the schema (not the dynamic-JSON path), and anomalies ride the
    residual."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    out = eng.kql(
        """events
           | make-series n = count() default = 0 on ts step 1d by event_type
           | extend dec = series_decompose(n, 7)
           | extend an = series_decompose_anomalies(n, 7)
           | project event_type, trend = dec.trend, seasonal = dec.seasonal, an"""
    ).to_df()
    rows = out.collect()
    assert len(rows) > 0
    r = rows[0]
    assert isinstance(r.trend, list) and len(r.trend) == len(r.seasonal) == len(r.an)


def test_kql_gettype(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    out = eng.kql(
        "events | extend t1 = gettype(ts), t2 = gettype(value), "
        "t3 = gettype(event_type) | take 1 | project t1, t2, t3"
    ).to_df().collect()[0]
    assert (out.t1, out.t2, out.t3) == ("datetime", "real", "string")


def test_kql_ipv4_functions(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    out = eng.kql(
        """print a = ipv4_is_private("192.168.1.4"), b = ipv4_is_private("8.8.8.8"),
                 c = ipv4_is_in_range("10.1.2.3", "10.0.0.0/8"),
                 d = ipv4_is_in_range("11.0.0.1", "10.0.0.0/8"),
                 e = ipv4_compare("1.2.3.4", "1.2.3.10"),
                 f = format_ipv4(16909060),
                 g = ipv4_to_long("999.1.1.1"),
                 h = ipv4_is_in_range("172.31.255.255", "172.16.0.0/12")"""
    ).to_df().collect()[0]
    assert (out.a, out.b, out.c, out.d) == (True, False, True, False)
    assert out.e == -1 and out.f == "1.2.3.4" and out.g is None and out.h is True


def test_kql_parse_version_and_geo_distance(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    out = eng.kql(
        """print v1 = parse_version("1.2.3.4"), v2 = parse_version("10.0"),
                 bad = parse_version("1.2.x"),
                 cmp = parse_version("2.0") > parse_version("1.99.99"),
                 d_km = round(geo_distance_2points(-122.407, 37.783, -73.985, 40.748) / 1000.0, 0),
                 zero = geo_distance_2points(10.0, 50.0, 10.0, 50.0)"""
    ).to_df().collect()[0]
    assert out.v1 == 1_0002_0003_0004 and out.v2 == 10_0000_0000_0000
    assert out.bad is None and out.cmp is True
    assert out.d_km == 4129.0 and out.zero == 0.0


def test_kql_parse_url_and_path(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    out = eng.kql(
        """print u = parse_url("https://example.com:8443/a/b?q=1#top"),
                 u2 = parse_url("http://plain.org/x"),
                 p = parse_path("/var/log/app/errors.log")
           | project scheme = u.Scheme, host = u.Host, port = u.Port,
                     path = u.Path, q = u.Query, frag = u.Fragment,
                     port2 = u2.Port,
                     d = p.DirectoryPath, f = p.Filename, e = p.Extension"""
    ).to_df().collect()[0]
    assert (out.scheme, out.host, out.port) == ("https", "example.com", 8443)
    assert (out.path, out.q, out.frag) == ("/a/b", "q=1", "top")
    assert out.port2 is None
    assert (out.d, out.f, out.e) == ("/var/log/app", "errors.log", "log")


def test_kql_binary_scalar_functions(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    out = eng.kql(
        """print a = binary_and(12, 10), o = binary_or(12, 10),
                 x = binary_xor(12, 10), n = binary_not(0),
                 sl = binary_shift_left(1, 10), sr = binary_shift_right(1024, 3)"""
    ).to_df().collect()[0]
    assert (out.a, out.o, out.x, out.n, out.sl, out.sr) == (8, 14, 6, -1, 1024, 128)


def test_kql_round4_string_byte_scalars(spark):
    """Known answers for the round-4 scalar additions (tohex,
    string_size, isascii, indexof_regex, unicode codepoints,
    replace_strings, has_any_index, format_bytes, format_timespan,
    new_guid)."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    row = eng.kql(
        'print h = tohex(255), h2 = tohex(10, 4), sz = string_size("héllo"),'
        ' a1 = isascii("plain"), a2 = isascii("héllo"),'
        ' ir = indexof_regex("abc def", "d.f"), ir2 = indexof_regex("abc", "zz"),'
        ' cp = unicode_codepoints_from_string("AbC"),'
        ' cs = unicode_codepoints_to_string(dynamic([72, 105])),'
        ' rs = replace_strings("A BC A", dynamic(["A","BC"]), dynamic(["X","Y"])),'
        ' hi = has_any_index("the quick brown fox", dynamic(["wolf","brown","fox"])),'
        ' hi2 = has_any_index("abc", dynamic(["x"])),'
        ' fb = format_bytes(1024), fb2 = format_bytes(4000000, 2),'
        ' fb3 = format_bytes(100),'
        ' ft = format_timespan(3725, "hh:mm:ss"),'
        ' ft2 = format_timespan(90061.5, "d.hh:mm:ss"),'
        ' g = strlen(tostring(new_guid()))'
    ).to_df().collect()[0]
    assert row.h == "ff" and row.h2 == "000a"
    assert row.sz == 6  # bytes, not chars
    assert row.a1 is True and row.a2 is False
    assert row.ir == 4 and row.ir2 == -1
    assert row.cp == [65, 98, 67] and row.cs == "Hi"
    assert row.rs == "X Y X"  # ordered pair fold
    assert row.hi == 1 and row.hi2 == -1
    assert row.fb == "1 KB" and row.fb2 == "3.81 MB" and row.fb3 == "100 Bytes"
    assert row.ft == "01:02:05" and row.ft2 == "1.01:01:01"
    assert row.g == 36


def test_kql_column_ifexists(spark):
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    eng = MeerkatEngine(spark, SF_ORACLE)
    eng.catalog._cache["t"] = df
    out = eng.kql(
        "t | extend a = column_ifexists(v, 'dflt'), "
        "b = column_ifexists(missing_col, 'dflt')"
    ).to_df().collect()[0]
    assert out.a == "x" and out.b == "dflt"


def test_round4_scalar_edge_cases(spark):
    """Edges the first cut got wrong: tohex min_length never truncates,
    codepoints above Latin-1 survive the round trip, format_bytes emits
    no thousands separators, empty replace_strings is a no-op."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    row = eng.kql(
        'print h = tohex(4096, 2),'
        ' cs = unicode_codepoints_to_string(dynamic([955, 119070, 72])),'
        ' rt = unicode_codepoints_to_string(unicode_codepoints_from_string("λx")),'
        ' fb = format_bytes(4000000, 2, "KB"),'
        ' fb2 = format_bytes(1048575),'
        ' rs = replace_strings("keep", dynamic([]), dynamic([]))'
    ).to_df().collect()[0]
    assert row.h == "1000"  # pad-only, no truncation
    assert row.cs == "λ\U0001d11eH"  # true codepoints, not mod-256
    assert row.rt == "λx"
    assert row.fb == "3906.25 KB"  # no comma
    assert row.fb2 == "1024 KB"
    assert row.rs == "keep"
    import pytest as _pytest
    from meerkat_spark.functions.scalar import format_timespan

    with _pytest.raises(ValueError, match="unsupported pattern"):
        format_timespan(F.lit(10), "HH:MM")


def test_round5_advice_scalar_fixes(spark):
    """Round-5 advice fixes: format_timespan on negative spans renders
    one leading '-' with abs-valued fields; has_any_index falls back to
    phrase containment for terms with non-word chars; replace_strings
    raises on mismatched lookup/rewrite lengths instead of nulling."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    row = eng.kql(
        'print ft = format_timespan(-3661, "hh:mm:ss"),'
        ' ft2 = format_timespan(-90061.5, "d.hh:mm:ss"),'
        ' ft3 = format_timespan(3661, "hh:mm:ss"),'
        ' hi = has_any_index("the quick brown fox", dynamic(["lazy dog","quick brown"])),'
        ' hi2 = has_any_index("a-b c", dynamic(["a-b"])),'
        ' hi3 = has_any_index("xyz", dynamic(["no match"]))'
    ).to_df().collect()[0]
    assert row.ft == "-01:01:01"
    assert row.ft2 == "-1.01:01:01"
    assert row.ft3 == "01:01:01"
    assert row.hi == 1  # phrase 'quick brown' matches by containment
    assert row.hi2 == 0  # punctuation term matches as substring
    assert row.hi3 == -1

    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="length mismatch"):
        eng.kql(
            'print rs = replace_strings("x", dynamic(["a","b"]), dynamic(["y"]))'
        ).to_df().collect()


def test_reduce_by_patterns(spark):
    df = spark.createDataFrame(
        [("err 404 on node7",), ("err 500 on node12",), ("ok",),
         ("deadbeefdeadbeefcafe token",)],
        "msg string",
    )
    eng = MeerkatEngine(spark, SF_ORACLE)
    eng.catalog._cache["t"] = df
    got = {
        r.Pattern: (r.Count, r.Representative)
        for r in eng.kql("t | reduce by msg").to_df().collect()
    }
    assert got["err * on node*"] == (2, "err 404 on node7")
    assert got["ok"] == (1, "ok")
    assert got["* token"] == (1, "deadbeefdeadbeefcafe token")


def test_evaluate_basket_support(spark):
    df = spark.createDataFrame(
        [("a", "x")] * 6 + [("a", "y")] * 3 + [("b", "y")],
        "c1 string, c2 string",
    )
    eng = MeerkatEngine(spark, SF_ORACLE)
    eng.catalog._cache["t"] = df
    rows = eng.kql("t | evaluate basket(0.5)").to_df().collect()
    got = {(r.c1, r.c2): r.Count for r in rows}
    # support >= 5 of 10: {a}=9, {x}=6, {a,x}=6; grand total excluded
    assert got == {("a", None): 9, (None, "x"): 6, ("a", "x"): 6}


def test_evaluate_diffpatterns_cohorts(spark):
    rows = [("A", "p")] * 8 + [("A", "q")] * 2 + [("B", "p")] * 2 + [("B", "q")] * 8
    df = spark.createDataFrame(rows, "grp string, attr string")
    eng = MeerkatEngine(spark, SF_ORACLE)
    eng.catalog._cache["t"] = df
    out = eng.kql(
        "t | evaluate diffpatterns(grp, 'A', 'B', 10.0)"
    ).to_df().collect()
    got = {r.attr: (r.CountA, r.CountB, r.PercentA, r.PercentB, r.PercentDiff)
           for r in out}
    assert got["p"] == (8, 2, 80.0, 20.0, 60.0)
    assert got["q"] == (2, 8, 20.0, 80.0, 60.0)


def test_externaldata_csv(spark):
    """`externaldata (schema) ['path'] with (format='csv',
    ignoreFirstRecord=true)` reads ad-hoc files with the declared
    schema, then behaves like any table source."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    out = eng.kql(
        "externaldata (product: string, qty: long, price: real)"
        " ['/root/repo/tests/data/ext_sales.csv']"
        " with (format='csv', ignoreFirstRecord=true)"
        " | summarize n = sum(qty), revenue = round(sum(qty * price), 2)"
        "   by product"
        " | sort by product asc"
    ).to_df().collect()
    got = [(r.product, r.n, r.revenue) for r in out]
    assert got == [
        ("doohickey", 5, 16.25),
        ("gadget", 5, 122.50),
        ("widget", 6, 59.94),
    ]


def test_round5_scalar_additions(spark):
    """series_dot_product / series_cosine_similarity, array_iff,
    regex_quote, bag_merge (first-bag-wins), bag_remove_keys,
    geo_point_in_circle."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    row = eng.kql(
        'print dp = series_dot_product(dynamic([1, 2, 3]), dynamic([4, 5, 6])),'
        ' cs = round(series_cosine_similarity(dynamic([1, 0]), dynamic([0, 1])), 6),'
        ' cs2 = round(series_cosine_similarity(dynamic([2, 0]), dynamic([4, 0])), 6),'
        ' ai = array_iff(dynamic([true, false, true]), dynamic([1, 2, 3]), dynamic([9, 8, 7])),'
        ' ai2 = array_iff(dynamic([true, false]), 1, 0),'
        ' rq = regex_quote("a.b*c(d)"),'
        ' bm = bag_merge(dynamic({"a": "1", "b": "2"}), dynamic({"b": "9", "c": "3"})),'
        ' br = bag_remove_keys(dynamic({"a": "1", "b": "2"}), dynamic(["b"])),'
        ' pic = geo_point_in_circle(0.01, 0.0, 0.0, 0.0, 2000),'
        ' pic2 = geo_point_in_circle(1.0, 0.0, 0.0, 0.0, 2000)'
    ).to_df().collect()[0]
    assert row.dp == 32.0
    assert row.cs == 0.0 and row.cs2 == 1.0
    assert row.ai == [1, 8, 3]
    assert row.ai2 == [1, 0]
    assert row.rq == "a\\.b\\*c\\(d\\)"
    import json as _json

    assert _json.loads(row.bm) == {"a": "1", "b": "2", "c": "3"}
    assert _json.loads(row.br) == {"a": "1"}
    assert row.pic is True and row.pic2 is False


def test_round5_toscalar_pack_all_parse_csv(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    eng.catalog._cache["t"] = df
    out = eng.kql(
        "t | extend mx = toscalar(t | summarize max(id))"
        " | where id == mx | extend bag = pack_all()"
    ).to_df().collect()
    assert len(out) == 1 and out[0].id == 3 and out[0].mx == 3
    import json as _json

    assert _json.loads(out[0].bag) == {"id": 3, "v": "c", "mx": 3}
    row = eng.kql(
        'print c = parse_csv("a,\\"x,\\"\\"y\\"\\"\\",b"), c2 = parse_csv("1,2,3")'
    ).to_df().collect()[0]
    assert row.c == ["a", 'x,"y"', "b"]
    assert row.c2 == ["1", "2", "3"]


def test_round5_union_withsource(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    a = spark.createDataFrame([(1,)], "x long")
    b = spark.createDataFrame([(2,)], "x long")
    eng.catalog._cache["ta"] = a
    eng.catalog._cache["tb"] = b
    out = eng.kql("union withsource=Src ta, tb | sort by x asc").to_df().collect()
    assert [(r.Src, r.x) for r in out] == [("ta", 1), ("tb", 2)]


def test_graph_match_two_hop(spark):
    """make-graph + graph-match: 2-edge path pattern compiles to joins;
    node attributes come from the `with` table."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4), (5, 2)], "s long, d long"
    )
    people = spark.createDataFrame(
        [(1, "ann"), (2, "bob"), (3, "cat"), (4, "dan"), (5, "eve")],
        "pid long, name string",
    )
    eng.catalog._cache["edges"] = edges
    eng.catalog._cache["people"] = people
    out = eng.kql(
        "edges | make-graph s --> d with people on pid"
        " | graph-match (a)-[e1]->(b)-[e2]->(c)"
        "   where a.name != 'eve'"
        "   project src = a.name, mid = b.name, dst = c.name"
        " | sort by src asc, dst asc"
    ).to_df().collect()
    assert [(r.src, r.mid, r.dst) for r in out] == [
        ("ann", "bob", "cat"), ("ann", "bob", "dan"),
    ]


def test_graph_match_cycle_and_implied_nodes(spark):
    """Repeated node variable = cycle constraint; without a nodes table
    the node set is the implied endpoints (field `id`)."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3)], "s long, d long"
    )
    eng.catalog._cache["edges"] = edges
    out = eng.kql(
        "edges | make-graph s --> d"
        " | graph-match (a)-[e1]->(b)-[e2]->(a)"
        "   project x = a.id, y = b.id"
        " | sort by x asc"
    ).to_df().collect()
    assert [(r.x, r.y) for r in out] == [(1, 2), (2, 1)]


def test_graph_match_variable_length_edge(spark):
    """-[e*1..2]-> expands to the union of fixed-length patterns."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "s long, d long")
    eng.catalog._cache["edges"] = edges
    out = eng.kql(
        "edges | make-graph s --> d"
        " | graph-match (a)-[e*1..2]->(b) project x = a.id, y = b.id"
        " | sort by x asc, y asc"
    ).to_df().collect()
    assert [(r.x, r.y) for r in out] == [
        (1, 2), (1, 3), (2, 3), (2, 4), (3, 4),
    ]
    from meerkat_spark.kql.lexer import KqlSyntaxError

    with pytest.raises(KqlSyntaxError, match="cannot be referenced"):
        eng.kql(
            "edges | make-graph s --> d"
            " | graph-match (a)-[e*1..2]->(b) project x = e.s"
        ).to_df()


def test_parse_kv(spark):
    eng = MeerkatEngine(spark, SF_ORACLE)
    row = eng.kql(
        'print b = parse_kv("k1=v1;k2=v2", ";", "="),'
        ' b2 = parse_kv("x:1,y:2", ",", ":")'
    ).to_df().collect()[0]
    import json as _json

    assert _json.loads(row.b) == {"k1": "v1", "k2": "v2"}
    assert _json.loads(row.b2) == {"x": "1", "y": "2"}


def test_totimespan_string_roundtrip(spark):
    """totimespan parses '[-][d.]hh:mm:ss[.fff]' strings and round-trips
    with format_timespan."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    row = eng.kql(
        'print a = totimespan("01:02:03"),'
        ' b = totimespan("2.01:00:00"),'
        ' c = totimespan("-01:01:01"),'
        ' d = totimespan("00:00:01.5"),'
        ' bad = totimespan("nope"),'
        ' rt = totimespan(format_timespan(-90061, "d.hh:mm:ss"))'
    ).to_df().collect()[0]
    assert row.a == 3723.0
    assert row.b == 2 * 86400 + 3600.0
    assert row.c == -3661.0
    assert row.d == 1.5
    assert row.bad is None
    assert row.rt == -90061.0


def test_render_is_noop(spark):
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    plain = eng.kql("nation | summarize n = count() by n_regionkey").to_df()
    rendered = eng.kql(
        "nation | summarize n = count() by n_regionkey"
        " | render columnchart with (title='x', legend=visible)"
    ).to_df()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, rendered.collect())
    )
    assert plain.columns == rendered.columns


def test_base64_decode_toarray_invalid_null(spark):
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    got = eng.kql(
        "print good = base64_decode_toarray('aGk='),"
        " bad = base64_decode_toarray('!not-b64'),"
        " ones = bitset_count_ones(255), c = strcmp('a', 'b')"
    ).to_df().collect()[0]
    assert list(got.good) == [104, 105]  # 'hi'
    assert got.bad is None
    assert got.ones == 8 and got.c == -1


def test_ipv6_family_known_vectors(spark):
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    got = eng.kql(
        "print c1 = parse_ipv6('2001:db8::1'),"
        " c2 = parse_ipv6('::ffff:192.168.1.1'),"
        " c3 = parse_ipv6('10.0.0.1'),"
        " bad1 = parse_ipv6('1::2::3'), bad2 = parse_ipv6('abcd'),"
        " cmp = ipv6_compare('::1', '0:0:0:0:0:0:0:1'),"
        " m = ipv6_is_match('2001:db8::1', '2001:db8::2', 64),"
        " nm = ipv6_is_match('2001:db8::1', '2001:db9::1', 32)"
    ).to_df().collect()[0]
    assert got.c1 == "2001:0db8:0000:0000:0000:0000:0000:0001"
    assert got.c2 == "0000:0000:0000:0000:0000:ffff:c0a8:0101"
    assert got.c3 == got.c2.replace("c0a8:0101", "0a00:0001")
    assert got.bad1 is None and got.bad2 is None
    assert got.cmp == 0 and got.m is True and got.nm is False


def test_dcount_intersect_tracks_exact(spark):
    """HLL inclusion-exclusion estimates must track the exact
    intersection closely at small cardinalities (lg_k=12 sketches are
    exact-ish below ~thousands) and never exceed min(|A|, |B|) by more
    than the estimator tolerance."""
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    est = {
        r.ts: (r.s1, r.s2)
        for r in eng.kql(
            "events | summarize v = hll(iff(event_type == 'view', user_id,"
            " long(null))), b = hll(iff(event_type == 'purchase', user_id,"
            " long(null))) by bin(ts, 7d)"
            " | evaluate dcount_intersect(v, b) | project ts, s1, s2"
        ).to_df().collect()
    }
    ev = eng.table("events").to_df()
    from pyspark.sql import functions as F

    # exact intersection per 7d bin via two distinct sets
    binned = ev.select(
        F.timestamp_micros(
            (F.floor(F.unix_micros("ts") / (7 * 86400 * 1000000))
             * (7 * 86400 * 1000000)).cast("long")
        ).alias("w"),
        "user_id",
        "event_type",
    )
    v = binned.filter(F.col("event_type") == "view").select("w", "user_id").distinct()
    b = binned.filter(F.col("event_type") == "purchase").select("w", "user_id").distinct()
    inter = v.join(b, ["w", "user_id"]).groupBy("w").agg(F.count("*").alias("i"))
    vc = v.groupBy("w").agg(F.count("*").alias("v"))
    exact = {r.w: (r.v, dict((x.w, x.i) for x in inter.collect()).get(r.w, 0))
             for r in vc.collect()}
    assert est, "no bins"
    for w, (s1, s2) in est.items():
        ev_, iv = exact[w]
        assert abs(s1 - ev_) <= max(2, 0.05 * ev_)
        assert abs(s2 - iv) <= max(3, 0.1 * max(iv, 1))


def test_ip_range_family_known_vectors(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    r = (
        MeerkatEngine(spark, SF_ORACLE)
        .kql(
            "print s24 = ipv4_netmask_suffix('192.168.1.0/24'),"
            " s32 = ipv4_netmask_suffix('10.0.0.1'),"
            " sbad = ipv4_netmask_suffix('999.0.0.1/8'),"
            " m = format_ipv4_mask('192.168.1.77', 24),"
            " mnum = format_ipv4_mask(3232235853, 16),"
            " va = ipv4_is_in_any_range('10.1.2.3', '10.0.0.0/8', '192.168.0.0/16'),"
            " vd = ipv4_is_in_any_range('11.1.2.3', dynamic(['10.0.0.0/8'])),"
            " vb = ipv4_is_in_any_range('bogus', '10.0.0.0/8'),"
            " r6 = ipv6_is_in_range('2001:db8::1', '2001:db8::/64'),"
            " f6 = ipv6_is_in_range('2001:db9::1', '2001:db8::/64'),"
            " a6 = ipv6_is_in_any_range('2001:db8::1', '2001:db7::/64', '2001:db8::/64'),"
            " c1 = ipv4_range_to_cidr_list('192.168.1.0', '192.168.1.255'),"
            " c2 = ipv4_range_to_cidr_list('10.0.0.3', '10.0.0.10'),"
            " cbad = ipv4_range_to_cidr_list('10.0.0.9', '10.0.0.3')"
        )
        .to_df()
        .collect()[0]
    )
    assert r.s24 == 24 and r.s32 == 32 and r.sbad is None
    assert r.m == "192.168.1.0/24"
    assert r.mnum == "192.168.0.0/16"
    assert r.va is True and r.vd is False and r.vb is None
    assert r.r6 is True and r.f6 is False and r.a6 is True
    assert r.c1 == ["192.168.1.0/24"]
    assert r.c2 == ["10.0.0.3/32", "10.0.0.4/30", "10.0.0.8/31", "10.0.0.10/32"]
    assert r.cbad is None


def test_special_math_and_codecs(spark):
    import math

    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    r = (
        MeerkatEngine(spark, SF_ORACLE)
        .kql(
            "print g = gamma(5.0), gh = gamma(0.5), gn = gamma(-1.5),"
            " gp = gamma(-3.0), lg = loggamma(10.5), lgn = loggamma(-0.5),"
            " e1 = erf(1.0), en = erf(-0.5), ec = erfc(2.0),"
            " w = welch_test(10.0, 4.0, 30, 11.0, 5.0, 25),"
            " weq = welch_test(10.0, 4.0, 30, 10.0, 4.0, 30),"
            " z = zlib_decompress_from_base64_string("
            "       zlib_compress_to_base64_string('meerkat spark')),"
            " gz = gzip_decompress_from_base64_string("
            "       gzip_compress_to_base64_string('meerkat spark')),"
            " zbad = zlib_decompress_from_base64_string('!!notb64!!')"
        )
        .to_df()
        .collect()[0]
    )
    assert r.g == pytest.approx(math.gamma(5.0), rel=1e-9)
    assert r.gh == pytest.approx(math.gamma(0.5), rel=1e-9)
    assert r.gn == pytest.approx(math.gamma(-1.5), rel=1e-9)
    assert r.gp is None  # pole
    assert r.lg == pytest.approx(math.lgamma(10.5), rel=1e-9)
    assert r.lgn == pytest.approx(math.lgamma(-0.5), rel=1e-9)
    assert r.e1 == pytest.approx(math.erf(1.0), abs=2e-7)
    assert r.en == pytest.approx(math.erf(-0.5), abs=2e-7)
    assert r.ec == pytest.approx(math.erfc(2.0), abs=2e-7)
    assert 0.08 < r.w < 0.10  # t≈-1.73, df≈50 → p≈0.089
    assert r.weq == pytest.approx(1.0)
    assert r.z == "meerkat spark" and r.gz == "meerkat spark"
    assert r.zbad == ""


def test_geo_polygon_family(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    sq = '{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]]]}'
    r = (
        MeerkatEngine(spark, SF_ORACLE)
        .kql(
            f"print inpoly = geo_point_in_polygon(5.0, 5.0, '{sq}'),"
            f" outpoly = geo_point_in_polygon(15.0, 5.0, '{sq}'),"
            " bad = geo_point_in_polygon(0.0, 0.0, 'junk'),"
            " ln = geo_line_length("
            "   '{\"type\":\"LineString\",\"coordinates\":[[0,0],[1,0],[1,1]]}'),"
            " ln1 = geo_line_length("
            "   '{\"type\":\"LineString\",\"coordinates\":[[3,4]]}')"
        )
        .to_df()
        .collect()[0]
    )
    assert r.inpoly is True and r.outpoly is False and r.bad is None
    # two 1-degree segments, one along the equator, one along a meridian
    assert r.ln == pytest.approx(2 * 111195.08, rel=1e-4)
    assert r.ln1 == 0.0


def test_tz_and_user_agent(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    r = (
        MeerkatEngine(spark, SF_ORACLE)
        .kql(
            "print loc = datetime_utc_to_local(datetime(2024-07-01 12:00:00),"
            " 'America/New_York'),"
            " win = datetime_utc_to_local(datetime(2024-01-15 12:00:00),"
            " 'America/New_York'),"
            " back = datetime_local_to_utc(datetime(2024-07-01 08:00:00),"
            " 'America/New_York'),"
            " ua = parse_user_agent('Mozilla/5.0 (Windows NT 10.0)"
            " Chrome/120.0.0.0 Safari/537.36')"
        )
        .to_df()
        .collect()[0]
    )
    assert str(r.loc) == "2024-07-01 08:00:00"  # EDT, UTC-4
    assert str(r.win) == "2024-01-15 07:00:00"  # EST, UTC-5
    assert str(r.back) == "2024-07-01 12:00:00"
    assert r.ua.browser == "Chrome" and r.ua.os == "Windows"
    assert r.ua.browser_version == "120.0.0.0" and r.ua.os_version == "10.0"


def test_unit_convert_family(spark):
    from meerkat_spark.engine import MeerkatEngine
    from meerkat_spark.functions import scalar as S
    from tests.conftest import SF_ORACLE

    r = (
        MeerkatEngine(spark, SF_ORACLE)
        .kql(
            "print mi = convert_length(1.0, 'Mile', 'Meter'),"
            " kg = convert_mass(16.0, 'Ounce', 'Pound'),"
            " ms = convert_speed(36.0, 'KilometerPerHour', 'MeterPerSecond'),"
            " j = convert_energy(1.0, 'KilowattHour', 'Joule'),"
            " rad = convert_angle(180.0, 'Degree', 'Radian'),"
            " n = convert_force(1.0, 'KilogramForce', 'Newton'),"
            " gal = convert_volume(3.785411784, 'Liter', 'UsGallon'),"
            " k = convert_temperature(32.0, 'DegreeFahrenheit', 'DegreeCelsius')"
        )
        .to_df()
        .collect()[0]
    )
    assert r.mi == pytest.approx(1609.344)
    assert r.kg == pytest.approx(1.0)
    assert r.ms == pytest.approx(10.0)
    assert r.j == pytest.approx(3.6e6)
    assert r.rad == pytest.approx(3.14159265358979)
    assert r.n == pytest.approx(9.80665)
    assert r.gal == pytest.approx(1.0)
    assert r.k == pytest.approx(0.0, abs=1e-12)
    with pytest.raises(ValueError, match="unknown unit"):
        S.convert_length(1, "Parsec", "Meter")


def test_graph_to_table(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)
    nodes = (
        eng.kql(
            """datatable(s:string, d:string) ['a','b', 'b','c', 'c','a', 'x','b']
               | make-graph s --> d
               | graph-to-table nodes with_node_id=nid
               | sort by nid asc"""
        )
        .to_df()
        .collect()
    )
    assert [r.nid for r in nodes] == ["a", "b", "c", "x"]
    edges = (
        eng.kql(
            """datatable(s:string, d:string) ['a','b', 'b','c']
               | make-graph s --> d
               | graph-to-table edges with_source_id=u with_target_id=v
               | sort by u asc"""
        )
        .to_df()
        .collect()
    )
    assert [(r.u, r.v) for r in edges] == [("a", "b"), ("b", "c")]
    # nodes table bound via `with ... on`: properties come through
    nodes2 = (
        eng.kql(
            """let Nodes = nation | project n_nationkey, n_name;
               customer
               | extend u = c_custkey + 1000000
               | project u, c_nationkey
               | make-graph u --> c_nationkey with Nodes on n_nationkey
               | graph-to-table nodes
               | sort by node_id asc
               | take 3"""
        )
        .to_df()
        .collect()
    )
    assert [r.node_id for r in nodes2] == [0, 1, 2]
    assert "n_name" in nodes2[0].asDict()


def test_parse_kv_operator_and_consume(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)
    rows = (
        eng.kql(
            """datatable(s:string) ['k=1;v=a;x=2.5', 'k=7;x=9.25', 'v=b']
               | parse-kv s as (k: long, v: string, x: real)
                 with (pair_delimiter=';', kv_delimiter='=')
               | sort by s asc"""
        )
        .to_df()
        .collect()
    )
    assert [(r.k, r.v, r.x) for r in rows] == [
        (1, "a", 2.5),
        (7, None, 9.25),
        (None, "b", None),
    ]
    # consume: full plan validated, zero rows out
    out = eng.kql("events | where value > 10 | consume").to_df()
    assert out.count() == 0
    assert "value" in out.columns


def test_beta_distribution_family(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    r = (
        MeerkatEngine(spark, SF_ORACLE)
        .kql(
            "print pdf = beta_pdf(0.3, 2.0, 2.0),"
            " cdf = beta_cdf(0.3, 2.0, 2.0),"
            " cdfu = beta_cdf(0.42, 1.0, 1.0),"
            " inv = beta_inv(0.216, 2.0, 2.0),"
            " inv51 = beta_inv(0.5, 5.0, 1.0),"
            " edge = beta_pdf(0.0, 2.0, 2.0),"
            " oob = beta_cdf(1.5, 2.0, 2.0),"
            " badab = beta_cdf(0.5, -1.0, 2.0)"
        )
        .to_df()
        .collect()[0]
    )
    # Beta(2,2): pdf = 6x(1-x); cdf = 3x^2 - 2x^3
    assert r.pdf == pytest.approx(1.26, rel=1e-9)
    assert r.cdf == pytest.approx(0.216, rel=1e-9)
    assert r.cdfu == pytest.approx(0.42, rel=1e-9)  # uniform
    assert r.inv == pytest.approx(0.3, rel=1e-9)  # inverse of cdf above
    assert r.inv51 == pytest.approx(0.5 ** 0.2, rel=1e-9)  # x^5 = 0.5
    assert r.edge == 0.0
    assert r.oob is None and r.badab is None


def test_mv_expand_zip_semantics(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    rows = (
        MeerkatEngine(spark, SF_ORACLE)
        .kql(
            """datatable(k:string) ['a']
               | extend xs = pack_array(1, 2, 3), ys = pack_array('p', 'q')
               | mv-expand with_itemindex=ix xs, ys"""
        )
        .to_df()
        .orderBy("ix")
        .collect()
    )
    assert [(r.xs, r.ys, r.ix) for r in rows] == [
        (1, "p", 0),
        (2, "q", 1),
        (3, None, 2),  # shorter array null-pads (zip, not cross)
    ]


def test_search_qualifier_and_reorder_wildcards(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)
    all_hits = eng.kql("events | search 'click' | count").to_df().collect()[0][0]
    col_hits = (
        eng.kql("events | search event_type:'click' | count").to_df().collect()[0][0]
    )
    wild_hits = (
        eng.kql("events | search event_type:'cli*' | count").to_df().collect()[0][0]
    )
    assert col_hits == wild_hits > 0
    assert all_hits >= col_hits  # unqualified searches every string col
    # wildcard terms are un-anchored: 'lick*' matches inside 'click'
    # (the old fully-anchored LIKE found zero rows here)
    mid_hits = (
        eng.kql("events | search event_type:'lick*' | count").to_df().collect()[0][0]
    )
    assert mid_hits == col_hits
    # case_sensitive: fixture text is lowercase
    cs = (
        eng.kql("events | search kind=case_sensitive 'CLICK' | count")
        .to_df()
        .collect()[0][0]
    )
    assert cs == 0
    cols = eng.kql("customer | project-reorder c_name, c_* | take 1").to_df().columns
    assert cols[0] == "c_name"
    assert set(cols) == {"c_name", "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"}


def test_negated_predicates_and_in_subquery(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)

    def n(q):
        return eng.kql(q).to_df().collect()[0][0]

    total = n("documents | count")
    has = n("documents | where text has 'data' | count")
    nhas = n("documents | where text !has 'data' | count")
    assert has + nhas == total and has > 0 and nhas > 0
    assert (
        n("documents | where text contains 'data' | count")
        + n("documents | where text !contains 'data' | count")
        == total
    )
    # hasprefix: term-boundary start ('dat' prefixes 'data'); its
    # negation partitions the corpus
    pref = n("documents | where text hasprefix 'dat' | count")
    assert pref >= has
    assert pref + n("documents | where text !hasprefix 'dat' | count") == total
    # case-sensitive variant: corpus is lowercase
    assert n("documents | where text hasprefix_cs 'Dat' | count") == 0
    # in ((subquery)): every event user is a customer key
    assert n(
        "events | where user_id in ((customer | project c_custkey)) | count"
    ) == n("events | count")
    assert n(
        "events | where user_id !in ((customer | project c_custkey)) | count"
    ) == 0


def test_argmax_star_serialize_assign_count_as(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)
    rows = (
        eng.kql("events | summarize arg_max(event_id, *) by event_type")
        .to_df()
        .collect()
    )
    # whole-row argmax: every source column present, flattened
    assert {"event_type", "event_id", "user_id", "value", "ts"} <= set(
        rows[0].asDict()
    )
    by_type = {r.event_type: r.event_id for r in rows}
    batch = (
        eng.kql("events | summarize m = max(event_id) by event_type")
        .to_df()
        .collect()
    )
    assert by_type == {r.event_type: r.m for r in batch}

    r = eng.kql(
        """events | take 5 | serialize rn = row_number()
           | summarize lo = min(rn), hi = max(rn)"""
    ).to_df().collect()[0]
    assert (r.lo, r.hi) == (1, 5)

    n = eng.kql("events | count as n").to_df()
    assert n.columns == ["n"]

    hint = eng.kql(
        "events | summarize hint.shufflekey = user_id c = count() by user_id"
    ).to_df()
    assert hint.count() == eng.kql("events | distinct user_id").to_df().count()


def test_parse_kinds(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)

    def one(q):
        return eng.kql(q).to_df().collect()[0]

    # kind=regex: literal segments are regexes
    r = one(
        "datatable(s:string) ['a-12-end']"
        " | parse kind=regex s with '[a-z]+-' x:long '-end' | project x"
    )
    assert r.x == 12
    # simple mode still escapes literals
    r = one(
        "datatable(s:string) ['q=7;'] | parse s with 'q=' x:long ';' | project x"
    )
    assert r.x == 7
    # relaxed: a type-misfit capture nulls that column, row survives
    r = one(
        "datatable(s:string) ['v=abc']"
        " | parse kind=relaxed s with 'v=' x:long | project s, x"
    )
    assert r.x is None and r.s == "v=abc"


def test_split_index_indexof_start_toguid(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    r = (
        MeerkatEngine(spark, SF_ORACLE)
        .kql(
            "print sneg = split('a,b,c', ',', -1),"
            " soob = split('a,b,c', ',', 9),"
            " sok = split('a,b,c', ',', 1),"
            " i2 = indexof('abcabc', 'bc', 2),"
            " imiss = indexof('abcabc', 'bc', 5),"
            " g = toguid('{0E318A8E-B9E9-4F0E-9A1E-1F8EA50E0AA1}'),"
            " gbad = toguid('nope')"
        )
        .to_df()
        .collect()[0]
    )
    assert r.sneg is None and r.soob is None and r.sok == "b"
    assert r.i2 == 4 and r.imiss == -1
    assert r.g == "0e318a8e-b9e9-4f0e-9a1e-1f8ea50e0aa1" and r.gbad is None


def test_datetime_offsets_quarters_boundary_diff(spark):
    import datetime as dt

    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    r = (
        MeerkatEngine(spark, SF_ORACLE)
        .kql(
            "print sow = startofweek(datetime(2024-03-06), 1),"
            " som = startofmonth(datetime(2024-03-06), -1),"
            " soq = startofquarter(datetime(2024-05-15)),"
            " eoq = endofquarter(datetime(2024-05-15)),"
            " eom = endofmonth(datetime(2024-02-10)),"
            " eoy = endofyear(datetime(2024-03-06), -1),"
            " dm = datetime_diff('month', datetime(2024-03-01), datetime(2024-01-15)),"
            " dq = datetime_diff('quarter', datetime(2024-07-01), datetime(2024-01-15)),"
            " dy = datetime_diff('year', datetime(2017-01-01), datetime(2016-12-31)),"
            " dw = datetime_diff('week', datetime(2024-01-08), datetime(2024-01-06)),"
            " dd = datetime_diff('day', datetime(2024-01-02 00:01:00),"
            "                    datetime(2024-01-01 23:59:00)),"
            " dh = datetime_diff('hour', datetime(2024-01-01 02:01:00),"
            "                    datetime(2024-01-01 01:59:00))"
        )
        .to_df()
        .collect()[0]
    )
    assert r.sow == dt.datetime(2024, 3, 10)
    assert r.som == dt.datetime(2024, 2, 1)
    assert r.soq == dt.datetime(2024, 4, 1)
    assert r.eoq == dt.datetime(2024, 6, 30, 23, 59, 59, 999999)
    assert r.eom == dt.datetime(2024, 2, 29, 23, 59, 59, 999999)  # leap
    assert r.eoy == dt.datetime(2023, 12, 31, 23, 59, 59, 999999)
    # Kusto counts BOUNDARIES crossed, not elapsed whole periods
    assert (r.dm, r.dq, r.dy, r.dw, r.dd, r.dh) == (2, 2, 1, 1, 1, 1)


def test_array_index_join_and_slice_edges(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)
    r = (
        eng.kql(
            "print nested = dynamic([[1,2],[3,4]])[1][0],"
            " pk = pack_array(7, 8, 9)[1],"
            " pneg = pack_array(7, 8, 9)[-1],"
            " js = parse_json('[5, 6]')[1],"
            " sneg = array_slice(pack_array(1,2,3,4,5), -2, -1),"
            " sinv = array_slice(pack_array(1,2,3), 2, 1)"
        )
        .to_df()
        .collect()[0]
    )
    assert r.nested == 3 and r.pk == 8 and r.pneg == 9
    assert r.js == "6"  # JSON-string dynamics index via JSON path
    assert r.sneg == [4, 5] and r.sinv == []

    # compound $left/$right equalities joined with `and`
    n = (
        eng.kql(
            """customer
               | join kind=inner (nation)
                 on $left.c_nationkey == $right.n_nationkey
                    and $left.c_custkey == $right.n_nationkey
               | count"""
        )
        .to_df()
        .collect()[0][0]
    )
    direct = (
        eng.kql(
            "customer | where c_custkey == c_nationkey | count"
        )
        .to_df()
        .collect()[0][0]
    )
    assert n == direct


def test_timespan_literal_arithmetic(spark):
    import datetime as dt

    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    r = (
        MeerkatEngine(spark, SF_ORACLE)
        .kql(
            "print b = bin(150m, 1h) / 1h,"
            " a = abs(-5m) / 1m,"
            " s = (2h + 30m) / 30m,"
            " m = (2 * 1h) / 1h,"
            " cmp = 90m > 1h,"
            " dsub = datetime(2024-01-02) - 1d,"
            " dadd = datetime(2024-01-01) + 36h,"
            " f = format_timespan(90m + 30s, 'hh:mm:ss')"
        )
        .to_df()
        .collect()[0]
    )
    assert (r.b, r.a, r.s, r.m) == (2.0, 5.0, 5.0, 2.0)
    assert r.cmp is True
    assert r.dsub == dt.datetime(2024, 1, 1)
    assert r.dadd == dt.datetime(2024, 1, 2, 12)
    assert r.f == "01:30:30"


def test_extract_all_groups_and_strcat_spans(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    r = (
        MeerkatEngine(spark, SF_ORACLE)
        .kql(
            "print whole = extract_all('\\\\d+', 'a1b22'),"
            " one = extract_all('x(\\\\d)', 'x1 x2'),"
            " multi = extract_all('(\\\\d+)-(\\\\d+)', '1-2 3-4'),"
            " s = strcat('a', 1, 2h),"
            " sd = strcat('t=', 26h)"
        )
        .to_df()
        .collect()[0]
    )
    assert r.whole == ["1", "22"]
    assert r.one == ["1", "2"]
    assert r.multi == [["1", "2"], ["3", "4"]]  # multi-group: per-match arrays
    assert r.s == "a102:00:00" and r.sd == "t=1.02:00:00"


def test_literal_bool_preds_and_bin_auto(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)

    def one(q):
        return eng.kql(q).to_df().collect()[0][0]

    assert one("print x = iff(true, 1, 2)") == 1
    assert one("print x = case(false, 1, 99)") == 99
    assert one("print b = bin_auto(7.3)") == 7.0  # default size 1.0
    assert one("let query_bin_auto_size = 5; print b = bin_auto(13)") == 10
    n = one(
        "let query_bin_auto_size = 1h;"
        " events | summarize n = count() by b = bin_auto(ts) | count"
    )
    m = one("events | summarize n = count() by b = bin(ts, 1h) | count")
    assert n == m


def test_union_isfuzzy_range_dt_cumsum_restart(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)

    def one(q):
        return eng.kql(q).to_df().collect()[0][0]

    n_nation = one("nation | count")
    assert one("union isfuzzy=true nation, no_such_table | count") == n_nation
    assert one("nation | union isfuzzy=true no_such_table | count") == n_nation
    with pytest.raises(Exception):
        one("union nation, no_such_table | count")

    # datetime range source with timespan step (inclusive ends)
    assert one(
        "range t from datetime(2024-01-01) to datetime(2024-01-02)"
        " step 6h | count"
    ) == 5

    # row_cumsum with a restart term resets per segment
    rows = [
        tuple(r)
        for r in eng.kql(
            """datatable(g:long, v:long) [1,10, 1,20, 2,5, 2,7]
               | serialize
               | extend cs = row_cumsum(v, g != prev(g, 1, 1))
               | project cs"""
        )
        .to_df()
        .collect()
    ]
    assert rows == [(10,), (30,), (5,), (12,)]

    # prev/next defaults fill the edges
    rows = [
        tuple(r)
        for r in eng.kql(
            """datatable(v:long) [7, 8] | serialize
               | extend p = prev(v, 1, 0), n = next(v, 1, -1)
               | project p, n"""
        )
        .to_df()
        .collect()
    ]
    assert rows == [(0, 8), (7, -1)]


def test_array_index_start_notbetween_takeany_star_tostring(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)
    r = (
        eng.kql(
            "print i2 = array_index_of(pack_array(1,2,3,2), 2, 2),"
            " i0 = array_index_of(pack_array(1,2,3,2), 2),"
            " imiss = array_index_of(pack_array(1,2), 9, 1),"
            " snull = tostring(long(null)),"
            " snum = tostring(42)"
        )
        .to_df()
        .collect()[0]
    )
    assert (r.i2, r.i0, r.imiss) == (3, 1, -1)
    assert r.snull == "" and r.snum == "42"

    inside = eng.kql("events | where value between (10 .. 20) | count").to_df().collect()[0][0]
    outside = eng.kql("events | where value !between (10 .. 20) | count").to_df().collect()[0][0]
    total = eng.kql("events | where isnotempty(value) | count").to_df().collect()[0][0]
    assert inside + outside == total

    row = eng.kql("events | summarize take_any(*)").to_df().collect()
    assert len(row) == 1 and "event_id" in row[0].asDict()


def test_range_scalar_and_around(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    r = (
        MeerkatEngine(spark, SF_ORACLE)
        .kql(
            "print r = range(1, 7, 2),"
            " rd = range(1, 3),"
            " rt = array_length(range(datetime(2024-01-01),"
            "                         datetime(2024-01-03), 1d)),"
            " a1 = around(104, 100, 5),"
            " a2 = around(106, 100, 5),"
            " a3 = around(datetime(2024-01-01 00:00:30), datetime(2024-01-01), 1m)"
        )
        .to_df()
        .collect()[0]
    )
    assert r.r == [1, 3, 5, 7] and r.rd == [1, 2, 3] and r.rt == 3
    assert r.a1 is True and r.a2 is False and r.a3 is True


def test_format_tokens_agg_caps_dynamic_strops(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)
    r = (
        eng.kql(
            "print f3 = format_datetime(datetime(2024-01-02 03:04:05.678),"
            " 'yyyy-MM-dd HH:mm:ss.fff'),"
            " ampm = format_datetime(datetime(2024-01-02 15:04:05), 'hh:mm tt'),"
            " hd = pack_array('abc', 'def') has 'abc',"
            " hm = pack_array('abc', 'def') has 'ab',"
            " cd = pack_array('abc') contains 'ab'"
        )
        .to_df()
        .collect()[0]
    )
    assert r.f3 == "2024-01-02 03:04:05.678"
    assert r.ampm == "03:04 PM"
    assert r.hd is True and r.hm is False  # has stays whole-term
    assert r.cd is True
    caps = eng.kql(
        """events | summarize s = make_set(user_id, 3),
                             l = make_list(event_id, 4) by event_type
           | project ns = array_length(s), nl = array_length(l)
           | summarize ms = max(ns), ml = max(nl)"""
    ).to_df().collect()[0]
    assert (caps.ms, caps.ml) == (3, 4)


def test_zip_variadic_and_column_ifexists_string(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)
    assert (
        eng.kql(
            "print n = array_length(zip(pack_array(1,2), pack_array(3,4),"
            " pack_array(5,6)))"
        )
        .to_df()
        .collect()[0][0]
        == 2
    )
    r = (
        eng.kql(
            """events | take 1
               | project a = column_ifexists('nope', 'fb'),
                         b = column_ifexists('value', 0.0)"""
        )
        .to_df()
        .collect()[0]
    )
    assert r.a == "fb" and isinstance(r.b, float)


def test_typed_extract_and_tostring_span(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    r = (
        MeerkatEngine(spark, SF_ORACLE)
        .kql(
            "print xl = extract('(\\\\d+)', 1, 'a42', typeof(long)),"
            " xr = extract('([0-9.]+)', 1, 'v=2.5', typeof(real)),"
            " xs = extract('(\\\\d+)', 1, 'a42'),"
            " ts = tostring(1h), td = tostring(26h),"
            " sd = strcat_delim('-', 'a', tostring(1h))"
        )
        .to_df()
        .collect()[0]
    )
    assert r.xl == 42 and r.xr == 2.5 and r.xs == "42"
    assert r.ts == "01:00:00" and r.td == "1.02:00:00"
    assert r.sd == "a-01:00:00"


def test_facet_with_subquery_and_fractional_sample(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)

    def one(q):
        return eng.kql(q).to_df().collect()[0][0]

    n_types = one("events | distinct event_type | count")
    assert one(
        "events | facet by event_type with (summarize n = count()) | count"
    ) == n_types
    # per-facet top 2: facet value column retained, 2 rows per value
    top2 = eng.kql(
        "events | facet by event_type with (top 2 by value)"
    ).to_df()
    per = {r.event_type: r.n for r in top2.groupBy("event_type").count()
           .withColumnRenamed("count", "n").collect()}
    assert all(v == 2 for v in per.values()) and len(per) == n_types
    # facet summarize agrees with the direct groupBy
    direct = {
        (r.event_type, r.n)
        for r in eng.kql("events | summarize n = count() by event_type")
        .to_df()
        .collect()
    }
    facet = {
        (r.event_type, r.n)
        for r in eng.kql(
            "events | facet by event_type with (summarize n = count())"
        )
        .to_df()
        .collect()
    }
    assert facet == direct
    # fractional sample is the Bernoulli mode; exact-N unchanged
    assert one("events | sample 10 | count") == 10
    frac = one("events | sample 0.5 | count")
    assert 300 < frac < 700


def test_mv_apply_bare_and_typed_forms(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)

    def one(q):
        return eng.kql(q).to_df().collect()[0][0]

    base = "datatable(a:string) ['x'] | extend v = pack_array(1,2,5) | "
    # bare-column form: element shadows the array column
    assert one(base + "mv-apply v on (top 1 by v) | project v") == 5
    assert one(base + "mv-apply e = v on (top 1 by e) | project e") == 5
    # typed element casts before the sub-ops
    assert (
        one(
            "datatable(a:string) ['x'] | extend v = pack_array('1','2')"
            " | mv-apply e = v to typeof(long) on (summarize s = sum(e))"
            " | project s"
        )
        == 3
    )


def test_string_plus_concatenation(spark):
    from meerkat_spark.engine import MeerkatEngine
    from tests.conftest import SF_ORACLE

    eng = MeerkatEngine(spark, SF_ORACLE)
    r = eng.kql(
        "print s = 'a' + 'b', n = 1 + 2, v = 'v=' + tostring(5)"
    ).to_df().collect()[0]
    assert r.s == "ab" and r.n == 3 and r.v == "v=5"
    col = eng.kql("documents | take 1 | project s = lang + '!'").to_df().collect()[0]
    assert col.s.endswith("!")


def test_verbatim_strings_and_parse_kv_regex(spark):
    """Kusto verbatim strings (@'…' / @"…"): no backslash escapes, a
    doubled quote stands for itself; regex-mode parse-kv first-wins."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    r = eng.kql(r"print s = @'a\n''b'").to_df().collect()[0]
    assert r.s == r"a\n'b"  # backslash literal, doubled quote -> quote
    row = (
        eng.kql(
            r"""print s = 'x: 1 y: hi x: 9'
               | parse-kv s as (x: long, y: string, z: long)
                 with (regex=@'(\w+): (\S+)')"""
        )
        .to_df()
        .collect()[0]
    )
    assert (row.x, row.y, row.z) == (1, "hi", None)


def test_round6_advice_fixes(spark):
    """Round-6 advice: numeric summarize hints parse; isfuzzy only
    forgives unknown tables; string-column + string-column
    concatenates; fractional timespans render Kusto's fixed 7-digit
    field with carry."""
    import pytest as _pt

    from meerkat_spark.kql.lexer import KqlSyntaxError

    eng = MeerkatEngine(spark, SF_ORACLE)
    # hint.num_partitions=64 must parse-and-ignore, not syntax-error
    n = (
        eng.kql(
            "events | summarize hint.num_partitions=64 n=count() by event_type"
        )
        .to_df()
        .count()
    )
    assert n > 0
    # isfuzzy forgives unknown tables but NOT genuine semantic errors
    ok = eng.kql("union isfuzzy=true nation, no_such_table | count")
    assert ok.to_df().collect()[0][0] > 0
    with _pt.raises((KqlSyntaxError, Exception), match="no_such_column|cannot|unsupported"):
        eng.kql(
            "union isfuzzy=true nation, (region | where no_such_column > 1) | count"
        ).to_df().collect()
    # string column + string column concatenates (was numeric-add null)
    r = (
        eng.kql(
            "nation | extend s = n_name + n_name | where isnotempty(s) | count"
        )
        .to_df()
        .collect()[0][0]
    )
    assert r > 0
    # fixed 7-digit fraction, no dangling '.' on carry
    row = eng.kql(
        "print a = strcat('', 1.5s), b = strcat('', 0.99999996s), c = strcat('', 90s)"
    ).to_df().collect()[0]
    assert row.a == "00:00:01.5000000"
    assert row.b == "00:00:01"
    assert row.c == "00:01:30"


def test_round6_operator_extensions(spark):
    """Round-6 KQL surface: multi-assign extend, mv-expand limit,
    view() lets, wildcard union, tabular-lambda invoke, expression
    take."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    r = eng.kql(
        "print s = dynamic([1.0,2.0,3.0])"
        # Kusto positional order: (rsquare, slope, variance,
        # rvariance, interception, line_fit) — r14
        " | extend (rsq, slope, va, rva, interc, lf) = series_fit_line(s), c = 7"
        " | project rsq, slope, interc, c"
    ).to_df().collect()[0]
    assert abs(r.rsq - 1.0) < 1e-6 and abs(r.slope - 1.0) < 1e-6
    assert abs(r.interc - 1.0) < 1e-6 and r.c == 7
    assert eng.kql("print a = dynamic([1,2,3,4]) | mv-expand a limit 2").to_df().count() == 2
    assert (
        eng.kql(
            "print a = dynamic([1,2,3]), b = dynamic(['x','y']) | mv-expand a, b limit 2"
        ).to_df().count() == 2
    )
    assert eng.kql(
        "let v = view () { nation | project n_name }; v | count"
    ).to_df().collect()[0][0] == 25
    assert eng.kql("union nation* | count").to_df().collect()[0][0] == 25
    assert eng.kql(
        "let zoo_a = view () { nation | project n_name };"
        "let zoo_b = view () { region | project n_name = r_name };"
        "union zoo_* | count"
    ).to_df().collect()[0][0] == 30
    rows = eng.kql(
        "let topk = (T:(*), k:long) { T | sort by o_totalprice desc,"
        " o_orderkey asc | take k }; orders | invoke topk(3)"
    ).to_df().collect()
    assert len(rows) == 3
    assert rows == sorted(rows, key=lambda r: (-r.o_totalprice, r.o_orderkey))
    assert eng.kql("let k = 5; orders | take k").to_df().count() == 5


def test_round6_agg_and_time_extensions(spark):
    """Round-6: percentilew/percentilesw as KQL summarize functions
    (equal to the exact keyed-window operator), dcount_hll in KQL,
    time() constructor, and the (start .. duration) between range."""
    from meerkat_spark.operators.sampling import percentilew_exact

    eng = MeerkatEngine(spark, SF_ORACLE)
    got = {
        r.l_returnflag: r.p
        for r in eng.kql(
            "lineitem | summarize p = percentilew(l_extendedprice, l_quantity, 50)"
            " by l_returnflag"
        ).to_df().collect()
    }
    li = eng.table("lineitem").to_df()
    exact = {
        r.l_returnflag: r.p50_weighted
        for r in percentilew_exact(
            li, ["l_returnflag"], "l_extendedprice", "l_quantity", 0.5
        ).collect()
    }
    assert got == exact
    arr = eng.kql(
        "lineitem | summarize p = percentilesw(l_extendedprice, l_quantity, 25, 50, 75)"
    ).to_df().collect()[0].p
    assert len(arr) == 3 and arr[0] <= arr[1] <= arr[2]
    total = eng.kql(
        "events | summarize h = hll(user_id) by event_type"
        " | summarize total = dcount_hll(hll_merge(h))"
    ).to_df().collect()[0].total
    n_users = eng.kql("events | summarize dcount(user_id)").to_df().collect()[0][0]
    assert abs(total - n_users) / n_users < 0.1
    r = eng.kql(
        "print a = datetime(2024-03-15) between (datetime(2024-01-01) .. 90d),"
        " b = datetime(2024-06-15) between (datetime(2024-01-01) .. 90d),"
        " t = strcat('', time('1.5h'))"
    ).to_df().collect()[0]
    assert (r.a, r.b, r.t) == (True, False, "01:30:00")


def test_round6_plugin_extensions(spark):
    """Round-6 evaluate-plugin surface: named step exprs in
    sequence_detect (Kusto's documented form), optional Start/End in
    activity_engagement, and the new_activity_metrics cohort plugin."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    named = eng.kql(
        "events | evaluate sequence_detect(ts, 1d, 1d,"
        " saw = (event_type == 'view'), bought = (event_type == 'purchase'),"
        " user_id)"
    ).to_df()
    assert {"saw_ts", "bought_ts"} <= set(named.columns) or {
        "saw", "bought"
    } <= set(named.columns)
    short = eng.kql(
        "events | evaluate activity_engagement(user_id, ts, 1d, 7d)"
    ).to_df()
    full = eng.kql(
        "events | evaluate activity_engagement(user_id, ts,"
        " datetime(2024-01-01), datetime(2024-01-30), 1d, 7d)"
    ).to_df()
    assert short.count() > 0 and full.count() > 0
    nam = eng.kql(
        "events | evaluate new_activity_metrics(user_id, ts,"
        " datetime(2024-01-01), datetime(2024-01-29), 7d)"
    ).to_df().collect()
    # from==to rows are full retention by construction
    diag = [r for r in nam if r.from_ts == r.to_ts]
    assert diag and all(r.retention_rate == 1.0 and r.churn_rate == 0.0 for r in diag)
    assert all(
        r.dcount_retained_values + r.dcount_churn_values == r.dcount_new_values
        for r in nam
    )


def test_make_graph_inline_nodes_and_partition_hints(spark):
    """Round-6: make-graph accepts an inline nodes SUBQUERY (with
    (T | ...) on id), and partition parses hint.* (ignored — the Spark
    realization is already the shuffle strategy)."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    n = eng.kql(
        "customer | take 50 | extend a = c_custkey % 20, b = c_custkey % 20"
        " | make-graph a --> b with (customer"
        "     | project nid = c_custkey % 20, seg = c_mktsegment"
        "     | summarize take_any(seg) by nid) on nid"
        " | graph-to-table nodes | count"
    ).to_df().collect()[0][0]
    assert n == 20
    a = eng.kql(
        "events | partition hint.strategy=shuffle by event_type"
        " ( top 2 by value desc ) | count"
    ).to_df().collect()[0][0]
    b = eng.kql(
        "events | partition by event_type ( top 2 by value desc ) | count"
    ).to_df().collect()[0][0]
    assert a == b > 0


def test_round6_url_punycode_json(spark):
    """Round-6 string additions: parse_urlquery (Kusto's nested
    'Query Parameters' bag, URL-decoded values), punycode raw + domain
    codecs (label-wise xn-- handling), and typed extractjson."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    r = eng.kql(
        "print q = parse_urlquery('https://h/p?a=1&b=hello%20world'),"
        " d = punycode_domain_from_string('xn--bcher-kva.com'),"
        " e = punycode_domain_to_string('bücher.com'),"
        " rt = punycode_to_string(punycode_from_string('münchen')),"
        " j = extractjson('$.a', '{\"a\": 5}', typeof(long)),"
        " js = extractjson('$.a.b', '{\"a\": {\"b\": \"z\"}}')"
    ).to_df().collect()[0]
    assert '"a":"1"' in r.q and "hello world" in r.q and "Query Parameters" in r.q
    assert r.d == "bücher.com" and r.e == "xn--bcher-kva.com"
    assert r.rt == "münchen"
    assert r.j == 5 and r.js == "z"


def test_geo_s2cell(spark):
    """S2 cell tokens: the Kusto-docs vector (Miami @ level 8 ->
    '88d9b'), default level 12, token->center->token roundtrip
    stability, and null on out-of-range input."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    r = eng.kql(
        "print a = geo_point_to_s2cell(-80.195829, 25.802215, 8),"
        " b = geo_point_to_s2cell(2.294481, 48.858370),"
        " bad = geo_point_to_s2cell(200.0, 95.0, 8),"
        " c = geo_s2cell_to_central_point('88d9b')"
    ).to_df().collect()[0]
    assert r.a == "88d9b"
    assert r.b == "47e66ff" and r.bad is None
    import json

    pt = json.loads(r.c)
    assert pt["type"] == "Point"
    lng, lat = pt["coordinates"]
    r2 = eng.kql(
        f"print t = geo_point_to_s2cell({lng}, {lat}, 8)"
    ).to_df().collect()[0]
    assert r2.t == "88d9b"


def test_mv_expand_dynamics_and_numeric_make_series(spark):
    """Round-6: mv-expand over JSON-string dynamics — arrays explode
    per element (get_json_object-style rendering), property BAGS
    explode per entry (bagexpansion=bag default; =array gives [k,v]
    pairs) — and make-series over a NUMERIC axis."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    bag = eng.kql("print d = dynamic({'a':1,'b':2}) | mv-expand d").to_df().collect()
    assert sorted(x.d for x in bag) in (
        [' {"a":1}', '{"b":2}'],
        ['{"a":1}', '{"b":2}'],
        ['{"a":1.0}', '{"b":2.0}'],
    )
    pair = eng.kql(
        "print d = dynamic({'a':1}) | mv-expand bagexpansion=array d"
    ).to_df().collect()[0]
    assert pair.d in ('["a",1]', '["a",1.0]')
    s = eng.kql(
        "print a = todynamic('[1,2]') | mv-expand a to typeof(long)"
        " | summarize s = sum(a)"
    ).to_df().collect()[0]
    assert s.s == 3
    nested = eng.kql(
        "print a = todynamic('[{\"x\":1},\"s\"]') | mv-expand a"
    ).to_df().collect()
    assert [x.a for x in nested] == ['{"x":1}', "s"]
    ms = eng.kql(
        "events | make-series n = count() on value from 0 to 100 step 10"
    ).to_df().collect()[0]
    assert len(ms.n) == 11 and ms.value == [float(10 * i) for i in range(11)]


def test_pack_array_heterogeneous_literals(spark):
    """Kusto dynamic arrays are untyped: an all-literal mixed
    pack_array compiles to a JSON-string dynamic (indexable via the
    JSON path); homogeneous args keep the native typed array."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    r = eng.kql(
        "print x = pack_array(1, 'a', true), i = pack_array(1, 'a', true)[1],"
        " n = array_length(pack_array(1, 2, 3))"
    ).to_df().collect()[0]
    assert r.x == '[1,"a",true]' and r.i == "a" and r.n == 3


def test_in_dynamic_lists_and_has_any_subquery(spark, duck):
    """Round-6: in() splices dynamic-list values (literal or
    let-bound); has_any/has_all accept a table subquery (bounded
    collect, Kusto's 256-value limit)."""
    register_views(duck, SF_ORACLE)
    eng = MeerkatEngine(spark, SF_ORACLE)
    df = eng.kql(
        "let allowed = dynamic(['click','view']);"
        " events | where event_type in (allowed)"
        " | summarize n = count() by event_type | sort by event_type asc"
    ).to_df()
    assert not compare(
        df,
        duck,
        "SELECT event_type, COUNT(*) AS n FROM events"
        " WHERE event_type IN ('click','view') GROUP BY 1 ORDER BY 1",
        "in_dynamic",
    )
    n_sub = eng.kql(
        "documents | where text has_any ((print s = 'the')) | count"
    ).to_df().collect()[0][0]
    n_lit = eng.kql(
        "documents | where text has_any ('the') | count"
    ).to_df().collect()[0][0]
    assert n_sub == n_lit > 0


def test_row_number_restart_and_row_window_session(spark, duck):
    """Round-6 window forms: row_number(start, restart) re-numbers per
    segment; row_window_session returns the session's first timestamp
    (idle-gap breaks + optional restart; max-duration restarts greedily
    at the breaching row — Kusto-exact since round 7)."""
    register_views(duck, SF_ORACLE)
    eng = MeerkatEngine(spark, SF_ORACLE)
    df = eng.kql(
        "events | sort by event_type asc, event_id asc"
        " | extend rn = row_number(1, event_type != prev(event_type))"
        " | summarize starts = countif(rn == 1), mx = max(rn) by event_type"
        " | sort by event_type asc"
    ).to_df()
    assert not compare(
        df,
        duck,
        "SELECT event_type, CAST(1 AS BIGINT) AS starts,"
        " COUNT(*) AS mx FROM events GROUP BY 1 ORDER BY 1",
        "rn_restart",
    )
    r = eng.kql(
        "events | sort by ts asc"
        " | extend sid = row_window_session(ts, 365d, 1h)"
        " | summarize n = dcount(sid), rows = count()"
    ).to_df().collect()[0]
    # sessions partition the stream: first-ts ids are <= row count and >= 1
    assert 1 <= r.n <= r.rows


def test_ipv4_parse_and_term_functions(spark):
    """Round-6 IP additions: parse_ipv4 (netmask applied), 
    parse_ipv4_mask, has_ipv4 / has_ipv4_prefix (delimited-term
    semantics, malformed search IPs are false), and the has_any_*
    variadic/dynamic forms."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    r = eng.kql(
        "print a = parse_ipv4('192.168.1.1'),"
        " b = parse_ipv4('192.168.1.1/24'),"
        " c = parse_ipv4_mask('192.168.1.1', 24),"
        " bad = parse_ipv4('300.1.1.1'),"
        " t1 = has_ipv4('src 10.1.2.3 dst', '10.1.2.3'),"
        " t2 = has_ipv4('src 110.1.2.33', '10.1.2.3'),"
        " t3 = has_ipv4_prefix('src 10.1.2.3', '10.1.'),"
        " t4 = has_any_ipv4('src 10.1.2.3', dynamic(['10.9.9.9','10.1.2.3']))"
    ).to_df().collect()[0]
    assert (r.a, r.b, r.c, r.bad) == (3232235777, 3232235776, 3232235776, None)
    assert (r.t1, r.t2, r.t3, r.t4) == (True, False, True, True)


def test_round7_advice_fixes(spark):
    """Round-7 ADVICE fixes: (1) bare trailing '@' is a KqlSyntaxError,
    not IndexError; (2) mv-expand over a non-JSON string scalar passes
    the value through as one row (Kusto scalar pass-through), not zero
    rows; (3) percentilew ignores null values/weights (Kusto aggregates
    skip nulls); (4) has_ipv4 requires non-alphanumeric term delimiters
    and has_ipv4_prefix validates the complete dotted quad."""
    from meerkat_spark.kql import KqlSyntaxError

    eng = MeerkatEngine(spark, SF_ORACLE)
    with pytest.raises(KqlSyntaxError):
        eng.kql("print x = @")

    rows = eng.kql("print s = 'hello' | mv-expand s").to_df().collect()
    assert [r.s for r in rows] == ["hello"]

    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, None), (None, 5.0), (3.0, 1.0), (100.0, 0.0)],
        "v double, w double",
    )
    from meerkat_spark.functions.agg import percentilew

    got = df.agg(percentilew(F.col("v"), F.col("w"), 0.5).alias("p")).collect()[0].p
    # surviving pairs: (1,1),(3,1),(100,0) → total w=2, p50 crossing at v=1
    assert got == 1.0

    r = eng.kql(
        "print t1 = has_ipv4('a10.1.2.3', '10.1.2.3'),"
        " t2 = has_ipv4('x 10.1.2.3;y', '10.1.2.3'),"
        " t3 = has_ipv4_prefix('src 10.1.999.3', '10.1.'),"
        " t4 = has_ipv4_prefix('a10.1.2.3', '10.1.'),"
        " t5 = has_ipv4_prefix('src 10.1.2.3,', '10.1.')"
    ).to_df().collect()[0]
    assert (r.t1, r.t2, r.t3, r.t4, r.t5) == (False, True, False, False, True)


def test_serialized_window_guard_warns_and_bounds(spark, monkeypatch):
    """Round-7 mirror of tests/test_scan.py's guard: serialize-context
    window functions compile a partition-less global Window.orderBy
    (faithful KQL, single sort task at scale) — that must be loud
    (compile-time warning pointing at `partition by`) and bounded
    (rows beyond MAX_SERIALIZED_WINDOW_ROWS raise at runtime)."""
    import warnings

    from meerkat_spark.kql import translator as TR

    eng = MeerkatEngine(spark, SF_ORACLE)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = eng.kql(
            "events | sort by ts asc | extend rn = row_number(),"
            " p = prev(value), cs = row_cumsum(value)"
        ).to_df()
        assert any("GLOBAL Window.orderBy" in str(x.message) for x in w)
    assert out.count() > 0  # under the threshold: runs fine

    monkeypatch.setattr(TR, "MAX_SERIALIZED_WINDOW_ROWS", 10)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        bounded = eng.kql(
            "events | take 100 | sort by ts asc | extend rn = row_number()"
        ).to_df()
    with pytest.raises(Exception, match="partition by"):
        bounded.collect()
    # the restart/session forms carry the same guard
    monkeypatch.setattr(TR, "MAX_SERIALIZED_WINDOW_ROWS", 5_000_000)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        eng.kql(
            "events | sort by ts asc"
            " | extend s = row_window_session(ts, 1h, 5m)"
        ).to_df().count()
        assert any("row_window_session" in str(x.message) for x in w)


def test_row_window_session_greedy_max_duration(spark):
    """Round-7: Kusto-exact greedy MaxDuration — the session restarts
    at the FIRST row breaching session_start + MaxDuration (duration
    == MaxDuration inclusive stays), NOT at aligned sub-buckets of the
    idle-segment start. Boundary-straddling fixture + randomized
    differential against a literal python reference."""
    import datetime as dt
    import random

    base = dt.datetime(2024, 1, 1)
    mins = [0, 10, 30, 35, 50]
    df = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=m)) for i, m in enumerate(mins)],
        "i long, ts timestamp",
    )
    df.createOrReplaceTempView("sess_fixture")
    eng = MeerkatEngine(spark, SF_ORACLE)
    eng.register_table("sess_fixture", df)
    out = (
        eng.kql(
            "sess_fixture | sort by ts asc"
            " | extend sid = row_window_session(ts, 30m, 1h)"
        )
        .to_df()
        .collect()
    )
    got = {r.i: (r.sid - base).total_seconds() / 60 for r in out}
    # t=30 is exactly start+30m → stays; t=35 breaches → restarts there
    assert got == {0: 0.0, 1: 0.0, 2: 0.0, 3: 35.0, 4: 35.0}

    # randomized differential vs the literal greedy recurrence
    rng = random.Random(11)
    t, times = 0, []
    for _ in range(300):
        t += rng.choice([1, 3, 7, 20, 90, 200])  # seconds; idle=120s
        times.append(t)
    fx = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=s)) for i, s in enumerate(times)],
        "i long, ts timestamp",
    )
    eng.register_table("sess_rand", fx)
    out = (
        eng.kql(
            "sess_rand | sort by ts asc"
            " | extend sid = row_window_session(ts, 5m, 2m)"
        )
        .to_df()
        .collect()
    )
    got = {r.i: (r.sid - base).total_seconds() for r in out}

    def ref(times, max_s, idle_s):
        sids, start, prev = {}, None, None
        for i, s in enumerate(times):
            if prev is None or s - prev > idle_s or s - start > max_s:
                start = s
            sids[i] = float(start)
            prev = s
        return sids

    assert got == ref(times, 300, 120)


def test_s2_vectorized_matches_scalar_reference():
    """Round-7: the whole-batch numpy S2 kernel must produce
    bit-identical cell ids to the per-point scalar reference — a
    lat/lng grid (face interiors, edges, poles, date line) at several
    levels, plus invalid coordinates mapping to None."""
    import numpy as np

    from meerkat_spark.functions.geo_s2 import (
        _MAX_LEVEL,
        _point_to_cellid,
        _points_to_cellids,
    )

    lngs, lats = [], []
    for lng in [-180.0, -179.99, -90.0, -45.5, 0.0, 0.01, 44.9, 90.0, 135.0, 180.0]:
        for lat in [-90.0, -89.9, -45.1, -0.01, 0.0, 35.69, 45.0, 89.9, 90.0]:
            lngs.append(lng)
            lats.append(lat)
    rng = np.random.default_rng(5)
    lngs += list(rng.uniform(-180, 180, 300))
    lats += list(rng.uniform(-90, 90, 300))
    for level in [0, 1, 8, 12, 30]:
        ids, valid = _points_to_cellids(lngs, lats, level)
        assert valid.all()
        for k, (lg, la) in enumerate(zip(lngs, lats)):
            ref = _point_to_cellid(lg, la, level)
            assert int(ids[k]) == ref, (lg, la, level, int(ids[k]), ref)
    ids, valid = _points_to_cellids(
        [200.0, float("nan"), 10.0], [95.0, 10.0, float("nan")], 8
    )
    assert list(valid) == [False, False, False]


def test_row_window_session_null_timestamps(spark):
    """Null Expr rows break into their own single-row sessions (the
    idle gap against a null is indeterminate → Kusto starts fresh);
    the greedy kernel must not crash on the null microsecond value."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base),
        (1, base + dt.timedelta(minutes=1)),
        (2, None),
        (3, base + dt.timedelta(minutes=2)),
    ]
    df = spark.createDataFrame(rows, "i long, ts timestamp")
    eng = MeerkatEngine(spark, SF_ORACLE)
    eng.register_table("sess_nulls", df)
    out = (
        eng.kql(
            "sess_nulls | sort by i asc"
            " | extend sid = row_window_session(ts, 1h, 30m)"
        )
        .to_df()
        .collect()
    )
    got = {r.i: r.sid for r in out}
    assert got[0] == base and got[1] == base
    assert got[2] is None  # its own session; first Expr value is null
    assert got[3] == base + dt.timedelta(minutes=2)  # fresh after null


def test_round7_scalar_gap_closure(spark):
    """Round-7 Kusto scalar additions: make_timespan (literal → true
    timespan, column → seconds), unixtime milli/micro/nano variants,
    bag_has_key/bag_set_key, pack_dictionary + weekofyear aliases,
    hash_sha1/hash_combine, ipv4_is_match effective-prefix rules,
    base64_encode_fromarray (roundtrip with decode_toarray), isutf8."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    r = eng.kql(
        "print mts = format_timespan(make_timespan(1, 2, 30, 45), 'd.hh:mm:ss'),"
        " u1 = unixtime_milliseconds_todatetime(1546300800123),"
        " u2 = unixtime_microseconds_todatetime(1546300800123456),"
        " u3 = unixtime_nanoseconds_todatetime(1546300800123456700),"
        " u4 = unixtime_nanoseconds_todatetime(1546300800999999001),"
        " big = 9007199254740993,"
        " w = weekofyear(datetime(2020-12-31)),"
        " bk = bag_has_key(dynamic({'a': 1, 'b': null}), 'b'),"
        " bk2 = bag_has_key(dynamic({'a': 1}), 'z'),"
        " bs = bag_set_key(dynamic({'a': 1, 'b': 2}), 'a', 9),"
        " pd = pack_dictionary('x', 1),"
        " s1 = hash_sha1('abc'),"
        " hc = hash_combine(hash('a'), hash('b')),"
        " m1 = ipv4_is_match('192.168.1.5', '192.168.1.9', 24),"
        " m2 = ipv4_is_match('192.168.1.5', '192.168.2.5', 24),"
        " m3 = ipv4_is_match('192.168.1.5/16', '192.168.99.1'),"
        " b64 = base64_encode_fromarray(dynamic([72, 105, 33])),"
        " ut = isutf8('héllo')"
    ).to_df().collect()[0]
    import datetime as dt

    assert r.mts == "1.02:30:45"
    assert r.u1 == dt.datetime(2019, 1, 1, 0, 0, 0, 123000)
    assert r.u2 == dt.datetime(2019, 1, 1, 0, 0, 0, 123456)
    assert r.u3 == dt.datetime(2019, 1, 1, 0, 0, 0, 123456)
    # 2^53+1-class literals and epoch-nanos boundaries survive exactly
    # (the round-7 integral-literal + decimal-arithmetic fixes)
    assert r.u4 == dt.datetime(2019, 1, 1, 0, 0, 0, 999999)
    assert r.big == 9007199254740993
    assert r.w == 53
    assert r.bk is True and r.bk2 is False
    import json

    # r16: bags preserve JSON value types through set/merge/remove
    # (Kusto-exact; was the map<string,string> stringifying round-trip)
    assert json.loads(r.bs) == {"a": 9, "b": 2}
    assert json.loads(r.pd) == {"x": 1}
    assert r.s1 == "a9993e364706816aba3e25717850c26c9cd0d89d"
    assert isinstance(r.hc, int)
    assert (r.m1, r.m2, r.m3) == (True, False, True)
    assert r.b64 == "SGkh"
    assert r.ut is True
    # hash_combine is order-sensitive and deterministic
    r2 = eng.kql(
        "print a = hash_combine(hash('a'), hash('b')),"
        " b = hash_combine(hash('b'), hash('a'))"
    ).to_df().collect()[0]
    assert r2.a == r.hc and r2.a != r2.b


def test_partition_by_window_functions_keyed(spark, duck):
    """Round-7: window functions inside `partition by col (sort by … |
    extend …)` compile KEYED on the partition column — row_number
    restarts per key (Kusto runs the subquery per partition), no
    global-window warning fires, and the plan contains no
    partition-less Window."""
    import warnings

    register_views(duck, SF_ORACLE)
    eng = MeerkatEngine(spark, SF_ORACLE)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        df = eng.kql(
            "events | partition by user_id ("
            " sort by ts asc, event_id asc"
            " | extend rn = row_number(), pv = prev(value),"
            "   cs = row_cumsum(value))"
            " | project event_id, user_id, rn, pv, cs"
        ).to_df()
        assert not any("GLOBAL Window" in str(x.message) for x in w)
    assert not compare(
        df,
        duck,
        """
        SELECT event_id, user_id,
               CAST(row_number() OVER w AS INT) AS rn,
               lag(value) OVER w AS pv,
               sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "partition_windows",
    )
    # greedy sessionizer keyed per partition: per-user results equal
    # the single-user global query
    whole = eng.kql(
        "events | where user_id < 3 | partition by user_id ("
        " sort by ts asc, event_id asc"
        " | extend sid = row_window_session(ts, 12h, 8h))"
        " | summarize n = dcount(sid) by user_id | sort by user_id asc"
    ).to_df().collect()
    for r in whole:
        solo = eng.kql(
            f"events | where user_id == {r.user_id}"
            " | sort by ts asc, event_id asc"
            " | extend sid = row_window_session(ts, 12h, 8h)"
            " | summarize n = dcount(sid)"
        ).to_df().collect()[0]
        assert solo.n == r.n, r.user_id


def test_round7_agg_gap_closure(spark, duck):
    """Round-7 aggregate additions: stdevif/varianceif (oracle
    differential), hll_if (estimate equals dcountif on the fixture
    cardinalities), buildschema (known-answer merged schema)."""
    register_views(duck, SF_ORACLE)
    eng = MeerkatEngine(spark, SF_ORACLE)
    df = eng.kql(
        "events | summarize sd = round(stdevif(value, event_type == 'click'), 6),"
        " va = round(varianceif(value, event_type == 'click'), 6)"
        " by user_id | sort by user_id asc"
    ).to_df()
    assert not compare(
        df,
        duck,
        "SELECT user_id, round(stddev_samp(CASE WHEN event_type='click'"
        " THEN value END), 6) AS sd, round(var_samp(CASE WHEN"
        " event_type='click' THEN value END), 6) AS va"
        " FROM events GROUP BY user_id ORDER BY user_id",
        "stdevif",
    )
    r = eng.kql(
        "events | summarize e = dcount_hll(hll_if(user_id,"
        " event_type == 'view')), x = dcountif(user_id,"
        " event_type == 'view')"
    ).to_df().collect()[0]
    assert r.e == r.x  # sparse-mode HLL is exact at fixture cardinality

    import json

    # parse_json of raw strings keeps integer-ness (the dynamic()
    # literal path renders numbers as real — engine convention)
    r = eng.kql(
        'datatable (j: string) ['
        ' \'{"x": 1, "y": "a"}\','
        ' \'{"x": 2.5, "z": [1, "b"]}\','
        ' \'{"y": true}\''
        '] | extend d = parse_json(j) | summarize s = buildschema(d)'
    ).to_df().collect()[0]
    got = json.loads(r.s)
    assert got == {
        "x": ["long", "real"],
        "y": ["bool", "string"],
        "z": {"indexer": ["long", "string"]},
    }


def test_cluster_database_qualifiers(spark, duck):
    """Kusto cross-cluster source qualifiers resolve to the local
    catalog: cluster('x').database('y').T ≡ T (the migration shim —
    qualified production queries run unmodified)."""
    register_views(duck, SF_ORACLE)
    eng = MeerkatEngine(spark, SF_ORACLE)
    df = eng.kql(
        "cluster('help').database('Samples').events"
        " | where user_id < 3 | summarize n = count() by user_id"
        " | sort by user_id asc"
    ).to_df()
    assert not compare(
        df,
        duck,
        "SELECT user_id, count(*) AS n FROM events WHERE user_id < 3"
        " GROUP BY user_id ORDER BY user_id",
        "qualified_source",
    )
    df2 = eng.kql(
        "database('Samples').events | count"
    ).to_df().collect()[0]
    assert df2[0] > 0


def test_kusto_division_and_substring_semantics(spark):
    """Round-7: Kusto `/` is ALWAYS real division with IEEE zero
    semantics (7/2 = 3.5; x/0 = ±inf; 0/0 = NaN — Spark ANSI would
    raise), % with a zero divisor yields null, and substring clamps a
    negative requested index to 0 rather than indexing from the end."""
    import math

    eng = MeerkatEngine(spark, SF_ORACLE)
    r = eng.kql(
        "print dv = 7 / 2, pinf = 1.0 / 0.0, ninf = -1.0 / 0.0,"
        " nn = 0.0 / 0.0, dnull = 5 / int(null), md = 5 % 0,"
        " s1 = substring('hello', -2, 3), s2 = substring('hello', 0, -1)"
    ).to_df().collect()[0]
    assert r.dv == 3.5
    assert r.pinf == float("inf") and r.ninf == float("-inf")
    assert math.isnan(r.nn)
    assert r.dnull is None and r.md is None
    assert r.s1 == "hel" and r.s2 == ""


def test_round7_cast_and_strcat_fidelity(spark):
    """Round-7 fidelity batch: strcat ignores null args (Kusto: null
    contributes nothing, the result is never nulled), todatetime also
    accepts Kusto's US-style M/d/yyyy layouts and returns null (not an
    error) on misparse, toint/tolong accept 0x-prefixed hex strings,
    and string()/bool() act as type casts."""
    import datetime as dt

    eng = MeerkatEngine(spark, SF_ORACLE)
    r = eng.kql(
        "print sc = strcat('a', int(null), 'b'),"
        " scn = strcat('x', tostring(int(null)), 'y'),"
        " d1 = todatetime('8/14/2026 10:30:00'),"
        " d2 = todatetime('8/14/2026'),"
        " d3 = todatetime('2026-08-14T10:30:00'),"
        " dbad = todatetime('not a date'),"
        " h1 = toint('0x1A'), h2 = tolong('0xff'),"
        " hbad = toint('0xZZ'),"
        " st = string(42), bl = bool(1)"
    ).to_df().collect()[0]
    assert r.sc == "ab" and r.scn == "xy"
    assert r.d1 == dt.datetime(2026, 8, 14, 10, 30)
    assert r.d2 == dt.datetime(2026, 8, 14)
    assert r.d3 == dt.datetime(2026, 8, 14, 10, 30)
    assert r.dbad is None
    assert r.h1 == 26 and r.h2 == 255 and r.hbad is None
    assert r.st == "42" and r.bl is True


def test_self_join_and_materialize(spark):
    """r8: self-joins of the same let table (with and without
    materialize()) must resolve — Spark raises AMBIGUOUS_SELF_JOIN for
    dataset-col references on identical attribute ids; the translator
    now builds every join through subquery aliases. The raw-table form
    and the key-shorthand form (merged key + collision rename) are both
    covered; n1 is the Kusto-renamed right-side n."""
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    r = eng.kql(
        "let hot = materialize(events | summarize n = count() by user_id"
        " | where n > 2); hot | join kind=inner (hot) on user_id | count"
    ).to_df().collect()[0][0]
    r2 = eng.kql(
        "let t = events | summarize n = count() by user_id;"
        " t | join kind=inner (t) on $left.user_id == $right.user_id"
        " | project user_id, n, n1 | count"
    ).to_df().collect()[0][0]
    assert r == r2 > 0
    r3 = eng.kql(
        "events | join kind=inner (events) on $left.event_id =="
        " $right.event_id | count"
    ).to_df().collect()[0][0]
    assert r3 == 1000
    # renamed right column carries the same values on the diagonal
    rows = eng.kql(
        "let t = events | summarize n = count() by user_id;"
        " t | join kind=inner (t) on $left.user_id == $right.user_id"
        " | project user_id, n, n1"
    ).to_df().collect()
    assert rows and all(x.n == x.n1 for x in rows)


def test_fork_unnamed_find_project_tdigest_typed(spark):
    """r8 gap closures from the surface probe: (1) unnamed fork legs
    get Kusto's auto names (Result, Result_1); (2) `find … project
    c1, c2` restricts output to the declared columns, null-padding
    tables that lack one; (3) percentile_tdigest accepts the typed
    third argument typeof(T) as a result cast."""
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    forked = eng.kql(
        "events | fork (where value > 50 | count) (where value <= 50 | count)"
    ).to_df().collect()
    legs = {r.fork_leg for r in forked}
    assert legs == {"Result", "Result_1"}

    found = eng.kql(
        "find in (events, documents) where doc_id > 498 or value > 99.9"
        " project event_id, doc_id"
    ).to_df()
    assert set(found.columns) == {"source_", "event_id", "doc_id"}
    rows = found.collect()
    assert any(r.source_ == "documents" and r.event_id is None for r in rows)

    p = eng.kql(
        "events | summarize t = tdigest(user_id)"
        " | project p = percentile_tdigest(t, 50, typeof(long))"
    ).to_df()
    assert dict(p.dtypes)["p"] == "bigint"
    assert p.collect()[0].p is not None


def test_make_bag_kusto_form_and_summarize_multi_assign(spark):
    """r8: (1) KQL make_bag(bag [, maxSize]) merges EXISTING property
    bags (Kusto signature — the (k,v) form is API-only), first bag
    wins on key conflict, null bags are no-ops (make_bag_if); (2)
    summarize multi-assign `(m, t) = arg_min(e, e1)` maps output names
    positionally via one min_by struct."""
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    import json

    b = eng.kql(
        "print d = dynamic({'a': 1}) | union (print d = dynamic({'a': 2, 'b': 3}))"
        " | summarize m = make_bag(d)"
    ).to_df().collect()[0].m
    bag = json.loads(b)
    assert set(bag) == {"a", "b"}  # both keys; winner of 'a' is first-seen
    bif = eng.kql(
        "range x from 1 to 4 step 1 | extend d = pack('k', x)"
        " | summarize m = make_bag_if(d, x == 3)"
    ).to_df().collect()[0].m
    assert json.loads(bif) == {"k": "3"}
    capped = eng.kql(
        "range x from 1 to 5 step 1 | extend d = pack(strcat('k', x), x)"
        " | summarize m = make_bag(d, 2)"
    ).to_df().collect()[0].m
    assert len(json.loads(capped)) == 2

    row = eng.kql(
        "events | summarize (m, t) = arg_min(value, ts)"
    ).to_df().collect()[0]
    assert row.m is not None and row.t is not None
    base = eng.kql("events | summarize m2 = min(value)").to_df().collect()[0]
    assert row.m == base.m2
    per_type = eng.kql(
        "events | summarize (mx, id) = arg_max(value, event_id) by event_type"
    ).to_df()
    assert set(per_type.columns) == {"event_type", "mx", "id"}


def test_bag_zip_dynamic_to_json_format_number(spark):
    """r8 probe-sweep scalar closures: bag_zip (keys drive length,
    missing values -> null, surplus ignored), dynamic_to_json (sorted
    top-level keys), format_number (grouped + fixed decimals)."""
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    r = eng.kql(
        "print b = bag_zip(dynamic(['a','b','c']), dynamic([1,2])),"
        " j = dynamic_to_json(dynamic({'b':1,'a':2})),"
        " f = format_number(1234.5678, 2),"
        " f0 = format_number(1234567.0, 0)"
    ).to_df().collect()[0]
    import json

    assert json.loads(r.b) == {"a": "1", "b": "2", "c": None}
    assert r.j == '{"a":"2","b":"1"}'  # keys sorted
    assert r.f == "1,234.57"
    assert r.f0 == "1,234,567"


def test_r8_literal_and_index_closures(spark):
    """r8 probe-sweep closures #2: h'...' obfuscated literals lex as
    plain strings; d['key with space'] bracket member access; computed
    array index a[i]; datetime(null)/date() literal forms;
    percentrank_tdigest/rank_tdigest read CDF/rank out of a digest."""
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    r = eng.kql(
        "print s = h'secret', b = parse_json('{\"k y\":1}')['k y'],"
        " n = datetime(null), d = date(2024-01-15)"
    ).to_df().collect()[0]
    assert r.s == "secret" and r.b == "1" and r.n is None
    assert str(r.d).startswith("2024-01-15")

    idx = eng.kql(
        "range i from 0 to 2 step 1 | extend a = dynamic([10, 20, 30])"
        " | project v = a[i] | sort by v asc"
    ).to_df().collect()
    assert [x.v for x in idx] == [10, 20, 30]

    td = eng.kql(
        "events | summarize t = tdigest(value)"
        " | project p = percentrank_tdigest(t, 50.0), r = rank_tdigest(t, 50.0)"
    ).to_df().collect()[0]
    # value ~ Uniform(0, 100): CDF(50) within a loose band, rank ~ p% of n
    assert 40.0 <= td.p <= 75.0
    assert abs(td.r - td.p * 10) <= 30  # n=1000 rows at sf0.001


def test_r9_negative_computed_index(spark):
    """ADVICE r8: computed array index a[i] must mirror the literal
    path's Kusto from-end semantics for negative i (per-row branch),
    in both the native-array and JSON-dynamic branches."""
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    r = eng.kql(
        "range i from -2 to 1 step 1"
        " | extend a = dynamic([10, 20, 30])"
        " | project i, v = a[i] | sort by i asc"
    ).to_df().collect()
    # i=-2 -> second-from-end (20); i=-1 -> last (30); i=0 -> 10; i=1 -> 20
    assert [(x.i, x.v) for x in r] == [(-2, 20), (-1, 30), (0, 10), (1, 20)]

    j = eng.kql(
        "range i from -1 to 0 step 1"
        " | extend a = parse_json('[\"x\",\"y\",\"z\"]')"
        " | extend a = tostring(a)"
        " | project i, v = a[i] | sort by i asc"
    ).to_df().collect()
    assert [x.v.strip('"') for x in j] == ["z", "x"]


def test_r9_pack_bagzip_key_edge_cases(spark):
    """ADVICE r8: computed-key pack() must tolerate duplicate keys
    (first wins, bag_merge convention) and skip null keys instead of
    raising DUPLICATE_MAP_KEY / NULL_MAP_KEY; bag_zip likewise."""
    from meerkat_spark.engine import MeerkatEngine
    import json

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    r = eng.kql(
        "print p = pack(strcat('k', '1'), 10, strcat('k', '1'), 20,"
        " datetime(null), 99),"
        " z = bag_zip(dynamic(['a', 'a', 'b']), dynamic([1, 2, 3]))"
    ).to_df().collect()[0]
    assert json.loads(r.p) == {"k1": "10"}
    assert json.loads(r.z) == {"a": "1", "b": "3"}


def test_r9_multiassign_column_order(spark):
    """ADVICE r8: multi-assign output columns splice at the declared
    position, not appended after the other aggregates."""
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    df = eng.kql(
        "events | summarize c = count(), (m, t) = arg_min(value, ts),"
        " mx = max(value) by event_type"
    ).to_df()
    assert df.columns == ["event_type", "c", "m", "t", "mx"]


def test_in_subquery_expression_large_uses_join_not_collect(spark, monkeypatch):
    """VERDICT r9 'what's missing' #2: in() with a LARGE subquery in an
    EXPRESSION context (extend/project/nested where) must route through
    the same <=10k-literal / broadcast-join fallback the top-level
    filter path has — never a 1M-value driver collect + literal isin.
    The subquery below produces 15,000 distinct values (every orderkey
    x 10 fanned over +0..9); spy every DataFrame.collect and assert no
    single collect exceeds the 10k probe bound (+1 sentinel)."""
    # Spark 4: pyspark.sql.DataFrame is a facade; the concrete class
    # whose .collect the translator's probes hit is the classic one
    from pyspark.sql.classic.dataframe import DataFrame

    SUB = (
        "orders | mv-expand r = range(0, 9, 1) "
        "| project x = o_orderkey * 10 + toint(r)"
    )
    eng = MeerkatEngine(spark, SF_ORACLE)
    keys = [
        r.o_orderkey
        for r in spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
        .select("o_orderkey")
        .collect()
    ]
    vals = {k * 10 + d for k in keys for d in range(10)}
    n_in = sum(1 for k in keys if k in vals)
    assert len(vals) > 10_000  # the premise: too large for a literal

    sizes: list[int] = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)

    # extend context: marker column semantics incl. negation
    rows = (
        eng.kql(
            f"""orders | project o_orderkey
           | extend hit = o_orderkey in (({SUB}))
           | summarize n_in = countif(hit), n_out = countif(not(hit))"""
        )
        .to_df()
        .collect()
    )
    assert rows[0].n_in == n_in and rows[0].n_out == len(keys) - n_in
    assert max(sizes) <= 10_001, f"driver collect of {max(sizes)} rows"

    # nested-where context (in() under a disjunction -> expression path)
    sizes.clear()
    got = (
        eng.kql(
            f"""orders
           | where o_orderkey in (({SUB})) or o_totalprice < 0
           | count"""
        )
        .to_df()
        .collect()
    )
    assert got[0][0] == n_in
    assert max(sizes) <= 10_001, f"driver collect of {max(sizes)} rows"

    # project context, !in negation
    sizes.clear()
    got = (
        eng.kql(
            f"""orders
           | project flag = o_orderkey !in (({SUB}))
           | where flag | count"""
        )
        .to_df()
        .collect()
    )
    assert got[0][0] == len(keys) - n_in
    assert max(sizes) <= 10_001, f"driver collect of {max(sizes)} rows"


def test_in_expression_join_path_equals_literal_path(spark, monkeypatch):
    """Null-semantics equivalence: forcing the expression-context in()
    membership JOIN on a small subquery (threshold monkeypatched to 3)
    must produce byte-identical results to the literal isin path —
    including null LHS rows (null stays null: countif drops them,
    extend stores null) and negation."""
    from meerkat_spark.kql.translator import Translator

    kql = """events
       | extend uid = iff(event_id % 13 == 0, int(null), user_id)
       | extend hit = uid in ((events | where value > 30 and user_id % 7 == 0 | project user_id)),
                miss = uid !in ((events | where value > 30 and user_id % 7 == 0 | project user_id))
       | summarize n_hit = countif(hit), n_miss = countif(miss),
                   n_null_hit = countif(isnull(hit)),
                   n_null_miss = countif(isnull(miss))"""

    eng = MeerkatEngine(spark, SF_ORACLE)
    literal = eng.kql(kql).to_df().collect()

    monkeypatch.setattr(Translator, "_IN_LITERAL_MAX", 3)
    eng2 = MeerkatEngine(spark, SF_ORACLE)
    joined = eng2.kql(kql).to_df().collect()

    assert literal == joined, (literal, joined)
    r = literal[0]
    assert r.n_null_hit > 0 and r.n_null_hit == r.n_null_miss  # nulls stayed null
    assert r.n_hit > 0 and r.n_miss > 0


def test_evaluate_llm_pipeline_plugins(spark):
    """r12: the LLM-pipeline ops reached through `evaluate` plugins —
    thin shims over the same engine code the DataFrame API uses, so
    semantics are pinned by equivalence to the direct calls."""
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")

    # knn plugin == direct brute_force_topk_vectorized
    from meerkat_spark.similarity import knn

    out = eng.kql(
        "embeddings | evaluate knn(vec_id, embedding, 3, vec_id < 4)"
    ).to_df()
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    direct = knn.brute_force_topk_vectorized(
        emb, knn.queries_to_pdf(emb.filter("vec_id < 4")), k=3
    )
    assert {tuple(r) for r in out.collect()} == {
        tuple(r) for r in direct.collect()
    }

    # select_token_budget plugin == direct call with the same budgets
    from pyspark.sql import functions as F

    from meerkat_spark.operators.sampling import select_token_budget

    out2 = eng.kql(
        "documents | extend n_tok = array_length(split(text, ' ')) "
        "| evaluate select_token_budget(lang, n_tok, doc_id, 'en', 500) "
        "| project doc_id"
    ).to_df()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    direct2 = select_token_budget(
        docs.withColumn(
            "n_tok", F.array_size(F.split("text", " ", -1)).cast("long")
        ),
        {"en": 500},
    ).select("doc_id")
    assert {r.doc_id for r in out2.collect()} == {
        r.doc_id for r in direct2.collect()
    }

    # fuzzy_dedup plugin: exact planted copy dropped, originals kept
    out3 = eng.kql(
        "let b = documents | where doc_id < 30 | project doc_id, text; "
        "b | union kind=outer (b | where doc_id == 0 "
        "| project doc_id = tolong(doc_id + 900000), text) "
        "| evaluate fuzzy_dedup(doc_id, text, 0.99) | project doc_id"
    ).to_df()
    kept = {r.doc_id for r in out3.collect()}
    assert 900000 not in kept and 0 in kept


def test_evaluate_llm_plugin_arg_errors(spark):
    import pytest as _pytest

    from meerkat_spark.engine import MeerkatEngine
    from meerkat_spark.kql import KqlSyntaxError

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    bad = [
        "documents | evaluate fuzzy_dedup(doc_id)",
        "documents | evaluate select_token_budget(lang, n_tok, doc_id)",
        "documents | evaluate select_token_budget(lang, n_tok, doc_id, 'en')",
        "embeddings | evaluate knn(vec_id, embedding, 3)",
    ]
    for q in bad:
        with _pytest.raises(KqlSyntaxError):
            eng.kql(q)


def test_evaluate_semdedup_and_decontaminate_plugins(spark):
    """r12: semdedup / decontaminate through the KQL front-end equal
    the direct engine calls (same code path, arg-mapping shim only).
    decontaminate's benchmark side is a let-bound table argument."""
    from meerkat_spark.engine import MeerkatEngine
    from meerkat_spark.similarity.semdedup import semdedup
    from meerkat_spark.text.decontaminate import decontaminate

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    out = eng.kql(
        "let e = embeddings | project vec_id, embedding; "
        "e | union kind=outer (e | where vec_id < 10 "
        "| project vec_id = tolong(vec_id + 900000), embedding) "
        "| evaluate semdedup(vec_id, embedding, 0.99) | project vec_id"
    ).to_df()
    copies = emb.filter("vec_id < 10").selectExpr(
        "CAST(vec_id + 900000 AS LONG) vec_id", "embedding"
    )
    direct = semdedup(
        emb.selectExpr("CAST(vec_id AS LONG) vec_id", "embedding")
        .unionByName(copies),
        threshold=0.99,
    ).select("vec_id")
    assert {r.vec_id for r in out.collect()} == {
        r.vec_id for r in direct.collect()
    }
    assert not {v for v in {r.vec_id for r in out.collect()} if v >= 900000}

    out2 = eng.kql(
        "let bench = documents | where doc_id % 50 == 0 "
        "| project doc_id, text; "
        "documents | project doc_id, text "
        "| evaluate decontaminate(doc_id, text, bench, 13, 1) "
        "| project doc_id"
    ).to_df()
    bench = docs.filter("doc_id % 50 = 0").select("doc_id", "text")
    direct2 = decontaminate(
        docs.select("doc_id", "text"), bench, k=13, min_shared=1
    ).select("doc_id")
    got, want = (
        {r.doc_id for r in out2.collect()},
        {r.doc_id for r in direct2.collect()},
    )
    assert got == want
    # the planted contamination is real: benchmark members self-overlap
    assert not ({r.doc_id for r in bench.select("doc_id").collect()} & got)


def test_real_special_literals_and_unary_plus(spark):
    """r14 probe-sweep closures: Kusto's special real literals —
    real(nan), real(inf), real(+inf), real(-inf) — translate to IEEE
    values instead of resolving `inf`/`nan` as column names, and unary
    plus is a parsed no-op."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    row = eng.kql(
        "print a = isnan(real(nan)), b = isinf(real(+inf)),"
        " c = isinf(real(-inf)), d = real(inf) > 0,"
        " e = real(-inf) < 0, p = +5, q = 3 * +2"
    ).to_df().collect()[0]
    assert (row.a, row.b, row.c, row.d, row.e, row.p, row.q) == (
        True, True, True, True, True, 5, 6,
    )


def test_top_nested_with_others_before_by(spark):
    """r14: Kusto places `with others = 'label'` BEFORE `by`
    (top-nested N of Expr with others = X by Agg); both positions
    parse and produce identical results."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    pre = eng.kql(
        "events | top-nested 2 of event_type with others='rest'"
        " by count()"
    ).to_df().collect()
    post = eng.kql(
        "events | top-nested 2 of event_type by count()"
        " with others='rest'"
    ).to_df().collect()
    assert sorted(map(tuple, pre)) == sorted(map(tuple, post))
    assert any(r[0] == "rest" for r in pre)


def test_datatable_dynamic_cells(spark):
    """r14 probe-sweep closure: dynamic([...]) / dynamic({...}) cells
    in a dynamic-typed datatable column serialize to the engine's
    canonical JSON text and stay mv-expandable."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    rows = eng.kql(
        "datatable(a:long, d:dynamic)"
        " [1, dynamic([1,2]), 2, dynamic({'k':1})]"
        " | order by a asc"
    ).to_df().collect()
    assert [(r.a, r.d) for r in rows] == [(1, "[1,2]"), (2, '{"k":1}')]
    exploded = eng.kql(
        "datatable(a:long, d:dynamic) [1, dynamic([10,20])]"
        " | mv-expand d | project d"
    ).to_df().collect()
    assert sorted(r.d for r in exploded) == ["10", "20"]


def test_partition_subquery_take(spark):
    """r14 probe-sweep closure: `take` inside a partition subquery
    keeps N rows PER PARTITION through a keyed window (no global
    sort); after a per-partition sort it keeps that order's prefix."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    n_users = eng.kql(
        "events | summarize dcount(user_id)"
    ).to_df().collect()[0][0]
    got = eng.kql(
        "events | partition by user_id (sort by ts asc | take 2) | count"
    ).to_df().collect()[0][0]
    assert got == 2 * n_users  # every fixture user has >= 2 events
    # sorted prefix: each kept pair is the user's 2 EARLIEST events
    pairs = eng.kql(
        "events | partition by user_id (sort by ts asc | take 1)"
        " | project user_id, ts"
    ).to_df().collect()
    firsts = eng.kql(
        "events | summarize ts = min(ts) by user_id"
    ).to_df().collect()
    assert sorted(map(tuple, pairs)) == sorted(map(tuple, firsts))


def test_cot_function(spark):
    import math

    eng = MeerkatEngine(spark, SF_ORACLE)
    c = eng.kql("print c = cot(1.0)").to_df().collect()[0][0]
    assert abs(c - 1.0 / math.tan(1.0)) < 1e-12


def test_narrow_implicit_serialize_and_dayofweek_timespan(spark):
    """r15 (probe-backlog closures): `evaluate narrow()` implies the
    serialization like Kusto (no explicit serialize/sort required), and
    dayofweek() comparisons against timespan literals (`== 0d`, Kusto's
    documented form) coerce so the Kusto-exact spelling works."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    # 3 rows x 2 columns -> 6 (Row, Column, Value) triples
    n = eng.kql(
        "events | take 3 | project event_id, event_type"
        " | evaluate narrow() | count"
    ).to_df().collect()[0][0]
    assert n == 6
    cols = eng.kql(
        "events | take 2 | project event_id | evaluate narrow()"
    ).to_df().columns
    assert cols == ["Row", "Column", "Value"]
    # dayofweek vs timespan literals
    row = eng.kql(
        "print a = dayofweek(startofweek(datetime(2024-02-07))) == 0d,"
        " b = dayofweek(datetime(2024-02-07)) == 3d,"
        " c = dayofweek(datetime(2024-02-07)) < 4d,"
        " d = 2d > dayofweek(datetime(2024-02-05))"  # Monday = 1
    ).to_df().collect()[0]
    assert (row.a, row.b, row.c, row.d) == (True, True, True, True)
    # int comparisons keep working (the documented delta's other form)
    assert eng.kql(
        "print b = dayofweek(datetime(2024-02-07)) == 3"
    ).to_df().collect()[0][0] is True


def test_top_nested_others_expression_and_format_datetime_brackets(spark):
    """r15 probe batch 7 closures: `with others = <expr>` accepts any
    constant expression (not just a string literal), and
    format_datetime keeps Kusto's [ ] separators literal (the JVM
    formatter would read them as optional-section markers)."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    rows = eng.kql(
        "events | top-nested 2 of event_type"
        " with others=strcat('other', '-types') by n = count()"
    ).to_df().collect()
    types = {r.event_type for r in rows}
    assert "other-types" in types and len(rows) == 3
    got = eng.kql(
        "print s = format_datetime(datetime(2017-01-29 09:10:00.5),"
        " 'yy-MM-dd [HH:mm:ss.ff tt]')"
    ).to_df().collect()[0][0]
    assert got == "17-01-29 [09:10:00.50 AM]"


def test_semantic_batch_closures(spark):
    """r15 semantic batch closures: tostring of a REAL array column
    renders Kusto's canonical JSON (Spark's cast says "[a, , b]"), and
    datatable cells accept typed nulls (long(null), datetime(null))."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    s = eng.kql(
        "print s = tostring(split('a,,b', ','))"
    ).to_df().collect()[0][0]
    assert s == '["a","","b"]'
    s2 = eng.kql(
        "print s = tostring(array_slice(dynamic([1,2,3]), 1, 99))"
    ).to_df().collect()[0][0]
    assert s2 == "[2,3]"
    r = eng.kql(
        "datatable(x:long, d:datetime)"
        " [1, datetime(2024-01-01), long(null), datetime(null)]"
        " | summarize n = count(), k = countif(isnull(x)),"
        " m = countif(isnull(d))"
    ).to_df().collect()[0]
    assert (r.n, r.k, r.m) == (2, 1, 1)


def test_batch13_closures(spark):
    """r15 probe batch 13 closures: quoted datetime('...') literals;
    ['bracket quoted'] names as extend/project-rename targets; gettype
    on arbitrary expressions (literal + analyzed-type fallback); and
    chained top-nested levels with EXPRESSION keys (parent keys are
    materialized onto the base frame, so deeper levels resolve them)."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    n1 = eng.kql(
        "events | where ts > datetime('2024-01-05') | count"
    ).to_df().collect()[0][0]
    n2 = eng.kql(
        "events | where ts > datetime(2024-01-05) | count"
    ).to_df().collect()[0][0]
    assert n1 == n2 > 0
    r = eng.kql(
        "events | extend ['my col'] = value"
        " | project-rename renamed = ['my col']"
        " | summarize m = max(renamed) | project ok = isnotnull(m)"
    ).to_df().collect()[0][0]
    assert r is True
    g = eng.kql(
        "print a = gettype(1h), b = gettype(dynamic([1])),"
        " c = gettype('s'), d = gettype(true), e = gettype(1.5),"
        " f = gettype(datetime(2024-01-01))"
    ).to_df().collect()[0]
    assert (g.a, g.b, g.c, g.d, g.e, g.f) == (
        "timespan", "array", "string", "bool", "real", "datetime"
    )
    rows = eng.kql(
        "events | top-nested 2 of event_type by count(),"
        " top-nested 1 of user_id % 2 by count() | count"
    ).to_df().collect()[0][0]
    assert rows == 2


def test_project_away_leading_wildcard(spark):
    """r15 probe batch 12: column patterns accept `*` ANYWHERE —
    leading (*_id), middle (e*e), trailing (event*) — assembled from
    character-adjacent tokens so a space still separates list items."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    cols = eng.kql(
        "events | project-away *_id | take 1"
    ).to_df().columns
    assert "event_id" not in cols and "user_id" not in cols
    assert "event_type" in cols
    kept = eng.kql(
        "events | project-keep e*e, value | take 1"
    ).to_df().columns
    assert "event_type" in kept and "value" in kept
    # two separate items still parse (space-separated, not adjacent)
    two = eng.kql(
        "events | project-keep event_id, ts | take 1"
    ).to_df().columns
    assert two == ["event_id", "ts"]


def test_format_ipv4_string_and_bag_keys_index(spark):
    """r15 probe batch 11 closures: format_ipv4 accepts dotted-quad
    strings and an optional prefix (the bare long cast raised
    CAST_INVALID_INPUT under ANSI), and bag_keys() results index
    natively as arrays (bag_keys(d)[0])."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    r = eng.kql(
        "print a = format_ipv4('192.168.1.255', 24),"
        " b = format_ipv4(3232236031),"
        " c = format_ipv4('10.1.2.3'),"
        " d = isnull(format_ipv4('not-an-ip'))"
    ).to_df().collect()[0]
    assert (r.a, r.b, r.c, r.d) == (
        "192.168.1.0", "192.168.1.255", "10.1.2.3", True
    )
    k = eng.kql(
        "datatable(d:dynamic) [dynamic({'a':1,'b':2})]"
        " | extend k = tostring(bag_keys(d)[0]) | project k"
    ).to_df().collect()[0][0]
    assert k == "a"


def test_datetime_part_kusto_units(spark):
    """r15 probe batch 10: datetime_part accepts Kusto's part names —
    dayofyear/week_of_year map to Spark's DOY/WEEK extract fields, and
    the sub-second parts return Kusto COMPONENTS at the engine's µs
    resolution (millisecond 0-999, microsecond 0-999999, nanosecond in
    1000ns multiples — the documented 100ns->µs delta)."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    r = eng.kql(
        "print q = datetime_part('quarter', datetime(2024-08-16)),"
        " dy = datetime_part('dayofyear', datetime(2024-02-07)),"
        " wy = datetime_part('week_of_year', datetime(2024-02-07)),"
        " s = datetime_part('second', datetime(2024-01-01 00:00:07.9)),"
        " ms = datetime_part('millisecond', datetime(2024-01-01 00:00:00.123456)),"
        " us = datetime_part('microsecond', datetime(2024-01-01 00:00:00.123456)),"
        " ns = datetime_part('nanosecond', datetime(2024-01-01 00:00:00.123456))"
    ).to_df().collect()[0]
    assert (r.q, r.dy, r.wy, r.s, r.ms, r.us, r.ns) == (
        3, 38, 6, 7, 123, 123456, 123456000
    )


def test_in_subquery_single_paren(spark):
    """r15 probe batch 9: Kusto's documented single-paren subquery form
    `x in (T | op | ...)` parses (the doubled-paren form already did) —
    a bare ident followed by '|' can only be a pipeline; a lone ident
    stays a scalar reference. Semantics match the explicit-list twin."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    n_in = eng.kql(
        "events | where event_type in (events | distinct event_type"
        " | sort by event_type asc | take 2) | count"
    ).to_df().collect()[0][0]
    twos = [
        r[0]
        for r in eng.kql(
            "events | distinct event_type | sort by event_type asc | take 2"
        ).to_df().collect()
    ]
    lit = ", ".join(f"'{v}'" for v in twos)
    n_lit = eng.kql(
        f"events | where event_type in ({lit}) | count"
    ).to_df().collect()[0][0]
    assert n_in == n_lit > 0
    n_out = eng.kql(
        "events | where event_type !in (events | distinct event_type"
        " | sort by event_type asc | take 2) | count"
    ).to_df().collect()[0][0]
    n = eng.kql("events | count").to_df().collect()[0][0]
    assert n_in + n_out == n
    # a lone ident in parens still resolves as a scalar (let binding)
    assert eng.kql(
        "let k = 'click'; events | where event_type in (k) | count"
    ).to_df().collect()[0][0] > 0


def test_wildcard_predicate_family_and_set_values(spark):
    """r15 (ADVICE r14): `* <op>` wildcard predicates cover the FULL
    string-operator family (negated and _cs forms included), unsupported
    `*` predicates raise a clear KqlSyntaxError, and `set` statement
    values may be multi-token expressions (Kusto's documented
    `set query_timeout = time(5m);` form)."""
    from meerkat_spark.kql.parser import KqlSyntaxError

    eng = MeerkatEngine(spark, SF_ORACLE)
    n = eng.kql("events | count").to_df().collect()[0][0]
    # negated case-sensitive forms complement their positive twins
    for op in ("has_cs", "contains_cs", "startswith", "endswith_cs"):
        pos = eng.kql(
            f"events | where * {op} 'click' | count"
        ).to_df().collect()[0][0]
        neg = eng.kql(
            f"events | where * !{op} 'click' | count"
        ).to_df().collect()[0][0]
        assert pos + neg == n, op
    # hasprefix: term-boundary prefix over every string column
    hp = eng.kql(
        "events | where * hasprefix 'cli' | count"
    ).to_df().collect()[0][0]
    has = eng.kql(
        "events | where * has 'click' | count"
    ).to_df().collect()[0][0]
    assert hp >= has > 0
    with pytest.raises(KqlSyntaxError, match="wildcard"):
        eng.kql("events | where * == 5 | count")
    # multi-token set values parse-and-ignore
    assert eng.kql(
        "set query_timeout = time(5m); set truncationmaxsize = 64 * 1024;"
        " events | count"
    ).to_df().collect()[0][0] == n


def test_timespan_literal_mixed_rendering(spark):
    """r15 (ADVICE r14): timespan LITERALS classify as timespan nodes,
    so mixed expressions — datetime-diff plus a literal span, an
    interval column plus a literal — reach the Kusto [d.]hh:mm:ss
    renderer instead of Spark's INTERVAL ... DAY TO SECOND text."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    got = eng.kql(
        "print s = tostring(datetime(2024-01-02) - datetime(2024-01-01)"
        " + 90m)"
    ).to_df().collect()[0][0]
    assert got == "1.01:30:00"
    got = eng.kql(
        "events | extend d = ts - bin(ts, 1d)"
        " | extend s = tostring(d + 1h) | where isnotempty(s)"
        " | count"
    ).to_df().collect()[0][0]
    assert got > 0
    got = eng.kql(
        "print s = strcat('x=', datetime(2024-01-01 03:00:00)"
        " - datetime(2024-01-01) + 1h)"
    ).to_df().collect()[0][0]
    assert got == "x=04:00:00"


def test_join_kind_aliases(spark):
    """r14: Kusto's documented join-kind aliases — anti/semi default
    to the left forms, leftantisemi/rightantisemi are the long
    spellings (rightantisemi swaps sides like rightanti)."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    n = eng.kql("events | count").to_df().collect()[0][0]
    got = eng.kql(
        "events | join kind=anti (events | where value > 1e9)"
        " on user_id | count"
    ).to_df().collect()[0][0]
    assert got == n  # nothing matches -> everything survives the anti
    # kind=semi is NOT documented Kusto (only the anti family has
    # aliases) — r15: rejected with a clear error, not silently mapped.
    import pytest as _pytest

    with _pytest.raises(ValueError, match="join kind"):
        eng.kql("events | join kind=semi (events) on user_id | count")
    la = eng.kql(
        "events | join kind=leftantisemi (events) on user_id | count"
    ).to_df().collect()[0][0]
    assert la == 0
    ra = eng.kql(
        "events | join kind=rightantisemi (events | where value > 1e9)"
        " on user_id | count"
    ).to_df().collect()[0][0]
    assert ra == 0  # right side empty -> nothing survives


def test_lambda_default_params(spark):
    """r14: scalar and tabular lambdas accept Kusto default values —
    omitted trailing args fall back to the declared defaults."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    assert eng.kql(
        "let f = (x:long, y:long = 10) { x + y }; print v = f(5)"
    ).to_df().collect()[0][0] == 15
    assert eng.kql(
        "let f = (x:long, y:long = 10) { x + y }; print v = f(5, 1)"
    ).to_df().collect()[0][0] == 6
    full = eng.kql(
        "let flt = (T:(*), lo:real = 1e9) { T | where value >= lo };"
        "events | invoke flt() | count"
    ).to_df().collect()[0][0]
    assert full == 0  # default kicked in
    from meerkat_spark.kql import KqlSyntaxError

    with pytest.raises(KqlSyntaxError):
        eng.kql("let f = (x:long, y:long) { x + y }; print v = f(5)").to_df()


def test_union_isfuzzy_forgives_unknown_first_leg(spark):
    """r14: `union isfuzzy=true` forgives an unresolvable FIRST leg
    (only tail legs were forgiven before); all-unresolvable still
    raises, and isfuzzy=false raises on the first leg."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    got = eng.kql(
        "union isfuzzy=true no_such, also_missing, (events | take 4)"
        " | count"
    ).to_df().collect()[0][0]
    assert got == 4
    with pytest.raises(Exception):
        eng.kql("union isfuzzy=true no_such, also_missing | count").to_df()
    with pytest.raises(Exception):
        eng.kql("union no_such, (events | take 1) | count").to_df()


def test_unnamed_arg_min_outputs_each_column(spark):
    """r14 probe-sweep closure: UNNAMED `summarize arg_min(ord, c1, …)`
    outputs each expression as its own column like Kusto (the old
    behavior collapsed to one `arg_min_value` column); the named form
    keeps its single output."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    df = eng.kql("events | summarize arg_min(value, event_id)").to_df()
    assert set(df.columns) == {"value", "event_id"}
    r = df.collect()[0]
    lo = eng.kql(
        "events | top 1 by value asc | project value, event_id"
    ).to_df().collect()[0]
    assert r.value == lo.value
    by = eng.kql(
        "events | summarize arg_max(value, event_id, ts) by event_type"
    ).to_df()
    assert set(by.columns) == {"event_type", "value", "event_id", "ts"}
    named = eng.kql(
        "events | summarize m = arg_max(value, event_id)"
    ).to_df()
    assert named.columns == ["m"]


def test_timespan_renders_kusto_format(spark):
    """r14 probe-sweep closure: timespan-typed values (datetime
    subtraction, interval-typed columns, timespan sums) render as
    Kusto [d.]hh:mm:ss[.fffffff] in tostring/strcat instead of
    Spark's INTERVAL literal text."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    row = eng.kql(
        "print a = tostring(datetime(2024-01-02) - datetime(2024-01-01)),"
        " b = tostring(datetime(2024-01-02 03:04:05.5)"
        " - datetime(2024-01-01)),"
        " c = strcat('', datetime(2024-01-01) - datetime(2024-01-02)),"
        " d = tostring((datetime(2024-01-02) - datetime(2024-01-01))"
        " + (datetime(2024-01-02) - datetime(2024-01-01)))"
    ).to_df().collect()[0]
    assert row.a == "1.00:00:00"
    assert row.b == "1.03:04:05.5000000"
    assert row.c == "-1.00:00:00"
    assert row.d == "2.00:00:00"
    # interval-typed COLUMN through the schema-aware path
    s = eng.kql(
        "events | extend gap = ts - startofday(ts)"
        " | extend s = tostring(gap) | where s startswith '00:'"
        " | count"
    ).to_df().collect()[0][0]
    assert s > 0


def test_set_statement_table_fn_hex_star_has(spark):
    """r14 probe-sweep closures, batch 6: `set option[=value];`
    query-option statements parse-and-ignore; table('name') resolves
    like a bare table reference; 0xFF hex literals lex as longs; and
    `* has 'term'` predicates over every string column — equal to the
    search operator's row set, with the negated form its complement."""
    eng = MeerkatEngine(spark, SF_ORACLE)
    n = eng.kql("events | count").to_df().collect()[0][0]
    assert eng.kql(
        "set notruncation; set query_timeout = 60; let k = 2;"
        " print v = k"
    ).to_df().collect()[0][0] == 2
    assert eng.kql("table('events') | count").to_df().collect()[0][0] == n
    row = eng.kql("print v = 0xFF, w = 0x10 + 1").to_df().collect()[0]
    assert (row.v, row.w) == (255, 17)
    star = eng.kql("events | where * has 'click' | count").to_df().collect()[0][0]
    search = eng.kql("events | search 'click' | count").to_df().collect()[0][0]
    neg = eng.kql("events | where * !has 'click' | count").to_df().collect()[0][0]
    assert star == search
    assert star + neg == n
