"""T1 tabular operators (SURVEY.md §2.2.1) as registered oracle-checked
queries. Each exercises the MeerkatTable builder, which folds onto plain
DataFrame transformations — one Catalyst plan per query."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.engine import MeerkatEngine
from meerkat_spark.functions import scalar as S
from meerkat_spark.suite import register


def _eng(spark, sf_dir) -> MeerkatEngine:
    return MeerkatEngine(spark, sf_dir)


# ---------------------------------------------------------------- where / project
@register(
    "where_project",
    oracle="""
    SELECT event_id, user_id, value, value * 1.21 AS vat
    FROM events WHERE event_type = 'click' AND value > 10
    """,
)
def where_project(spark, sf_dir):
    """KQL: events | where event_type == 'click' and value > 10
    | project event_id, user_id, value, vat = value * 1.21"""
    t = _eng(spark, sf_dir).table("events")
    return (
        t.where((F.col("event_type") == "click") & (F.col("value") > 10))
        .project("event_id", "user_id", "value", vat=F.col("value") * 1.21)
        .to_df()
    )


@register(
    "extend_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS band
    FROM lineitem
    """,
)
def extend_compute(spark, sf_dir):
    """KQL extend: computed columns + case()."""
    t = _eng(spark, sf_dir).table("lineitem")
    return (
        t.extend(
            disc_price=F.col("l_extendedprice") * (1 - F.col("l_discount")),
            charge=F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax")),
            band=S.case(
                F.col("l_quantity") < 10,
                "low",
                F.col("l_quantity") < 30,
                "mid",
                "high",
            ),
        )
        .project("l_orderkey", "l_linenumber", "disc_price", "charge", "band")
        .to_df()
    )


@register(
    "project_away_rename",
    oracle="""
    SELECT event_id, ts, user_id AS uid, event_type
    FROM events
    """,
)
def project_away_rename(spark, sf_dir):
    """KQL: events | project-away props, value | project-rename uid = user_id"""
    t = _eng(spark, sf_dir).table("events")
    return t.project_away("props", "value").project_rename(uid="user_id").to_df()


@register(
    "project_keep_wildcard",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber FROM lineitem
    """,
)
def project_keep_wildcard(spark, sf_dir):
    """KQL: lineitem | project-keep l_orderkey, l_partkey, l_suppkey, l_line*"""
    t = _eng(spark, sf_dir).table("lineitem")
    return t.project_keep("l_orderkey", "l_partkey", "l_suppkey", "l_line*").project_away(
        "l_linestatus"
    ).to_df()


# ---------------------------------------------------------------- summarize / count / distinct
@register(
    "summarize_bin_1h",
    oracle="""
    SELECT user_id,
           time_bucket(INTERVAL '1 hour', ts) AS h,
           COUNT(*) AS n,
           ROUND(AVG(value), 4) AS v
    FROM events
    WHERE event_type = 'click'
    GROUP BY user_id, h
    """,
)
def summarize_bin_1h(spark, sf_dir):
    """Flagship: events | where event_type=='click'
    | summarize n=count(), v=avg(value) by user_id, bin(ts, 1h)."""
    t = _eng(spark, sf_dir).table("events")
    return (
        t.where(F.col("event_type") == "click")
        .extend(h=S.bin_datetime("ts", 3600))
        .summarize(
            {"n": F.count(F.lit(1)), "v": F.round(F.avg("value"), 4)},
            by=["user_id", "h"],
        )
        .to_df()
    )


@register("count_op", oracle="SELECT COUNT(*) AS Count FROM events")
def count_op(spark, sf_dir):
    """KQL: events | count"""
    return _eng(spark, sf_dir).table("events").count().to_df()


@register("distinct_op", oracle="SELECT DISTINCT event_type, user_id FROM events")
def distinct_op(spark, sf_dir):
    """KQL: events | distinct event_type, user_id"""
    return _eng(spark, sf_dir).table("events").distinct("event_type", "user_id").to_df()


# ---------------------------------------------------------------- sort / top
@register(
    "top_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def top_orders(spark, sf_dir):
    """KQL: orders | top 10 by o_totalprice (tiebreak o_orderkey for
    determinism). Catalyst plans TakeOrderedAndProject — per-partition
    top-k + merge, no global sort at any scale."""
    t = _eng(spark, sf_dir).table("orders")
    return (
        t.project("o_orderkey", "o_totalprice")
        .sort(F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc())
        .take(10)
        .to_df()
    )


@register(
    "sort_take_asc",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders ORDER BY o_totalprice ASC, o_orderkey ASC LIMIT 25
    """,
)
def sort_take_asc(spark, sf_dir):
    """KQL: orders | sort by o_totalprice asc, o_orderkey asc | take 25"""
    t = _eng(spark, sf_dir).table("orders")
    return (
        t.project("o_orderkey", "o_orderdate", "o_totalprice")
        .sort(F.col("o_totalprice").asc_nulls_first(), F.col("o_orderkey").asc())
        .take(25)
        .to_df()
    )


# ---------------------------------------------------------------- joins (all kinds)
@register(
    "join_inner_agg",
    oracle="""
    SELECT c_mktsegment, ROUND(SUM(o_totalprice), 2) AS revenue,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner_agg(spark, sf_dir):
    """KQL: orders | join kind=inner customer on $left.o_custkey == $right.c_custkey
    | summarize revenue=sum(o_totalprice), n_orders=count() by c_mktsegment.
    customer is dimension-sized → broadcast (shuffle-free at 100TB facts)."""
    e = _eng(spark, sf_dir)
    return (
        e.table("orders")
        .join(
            e.table("customer"),
            on=F.col("o_custkey") == F.col("c_custkey"),
            kind="inner",
            broadcast_right=True,
        )
        .summarize(
            {
                "revenue": F.round(F.sum("o_totalprice"), 2),
                "n_orders": F.count(F.lit(1)),
            },
            by=["c_mktsegment"],
        )
        .to_df()
    )


@register(
    "join_leftouter",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def join_leftouter(spark, sf_dir):
    e = _eng(spark, sf_dir)
    return (
        e.table("customer")
        .join(e.table("orders"), on=F.col("c_custkey") == F.col("o_custkey"), kind="leftouter")
        .summarize({"n_orders": F.count("o_orderkey")}, by=["c_custkey"])
        .to_df()
    )


@register(
    "join_rightouter",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def join_rightouter(spark, sf_dir):
    e = _eng(spark, sf_dir)
    return (
        e.table("orders")
        .join(e.table("customer"), on=F.col("o_custkey") == F.col("c_custkey"), kind="rightouter")
        .summarize({"n_orders": F.count("o_orderkey")}, by=["c_custkey"])
        .to_df()
    )


@register(
    "join_fullouter",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
               FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nk, s.nk) AS nk,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_fullouter(spark, sf_dir):
    e = _eng(spark, sf_dir)
    c = (
        e.table("customer")
        .summarize({"n_cust": F.count(F.lit(1))}, by=[F.col("c_nationkey").alias("nk")])
        .to_df()
    )
    s = (
        e.table("supplier")
        .summarize({"n_supp": F.count(F.lit(1))}, by=[F.col("s_nationkey").alias("nk")])
        .to_df()
        .withColumnRenamed("nk", "snk")
    )
    joined = e.from_df(c).join(
        e.from_df(s), on=F.col("nk") == F.col("snk"), kind="fullouter"
    )
    return joined.project(
        nk=F.coalesce(F.col("nk"), F.col("snk")),
        n_cust=F.coalesce(F.col("n_cust"), F.lit(0)),
        n_supp=F.coalesce(F.col("n_supp"), F.lit(0)),
    ).to_df()


@register(
    "join_leftsemi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def join_leftsemi(spark, sf_dir):
    e = _eng(spark, sf_dir)
    f_orders = e.table("orders").where(F.col("o_orderstatus") == "F")
    return (
        e.table("customer")
        .join(f_orders, on=F.col("c_custkey") == F.col("o_custkey"), kind="leftsemi")
        .project("c_custkey", "c_name")
        .to_df()
    )


@register(
    "join_leftanti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_leftanti(spark, sf_dir):
    e = _eng(spark, sf_dir)
    return (
        e.table("customer")
        .join(e.table("orders"), on=F.col("c_custkey") == F.col("o_custkey"), kind="leftanti")
        .project("c_custkey", "c_name")
        .to_df()
    )


@register(
    "join_rightsemi",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def join_rightsemi(spark, sf_dir):
    """KQL: orders | join kind=rightsemi customer on … — keeps RIGHT rows
    with a match (realized by swapping onto left_semi)."""
    e = _eng(spark, sf_dir)
    return (
        e.table("orders")
        .join(
            e.table("customer").project("c_custkey", "c_acctbal"),
            on=F.col("o_custkey") == F.col("c_custkey"),
            kind="rightsemi",
        )
        .to_df()
    )


@register(
    "join_rightanti",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_rightanti(spark, sf_dir):
    e = _eng(spark, sf_dir)
    return (
        e.table("orders")
        .join(
            e.table("customer").project("c_custkey", "c_acctbal"),
            on=F.col("o_custkey") == F.col("c_custkey"),
            kind="rightanti",
        )
        .to_df()
    )


@register(
    "join_innerunique",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice
    FROM (SELECT DISTINCT l_orderkey FROM lineitem) l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def join_innerunique(spark, sf_dir):
    """KQL default join kind: left side deduped on the join key. Output
    projects only right-side columns (which left duplicate survives is
    arbitrary) so the comparison is deterministic."""
    e = _eng(spark, sf_dir)
    return (
        e.table("lineitem")
        .project("l_orderkey")
        .join(
            e.table("orders").project("o_orderkey", "o_totalprice"),
            on=F.col("l_orderkey") == F.col("o_orderkey"),
            kind="innerunique",
            left_keys=["l_orderkey"],
        )
        .project("o_orderkey", "o_totalprice")
        .to_df()
    )


@register(
    "lookup_dim_chain",
    oracle="""
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    LEFT JOIN nation ON c_nationkey = n_nationkey
    LEFT JOIN region ON n_regionkey = r_regionkey
    """,
)
def lookup_dim_chain(spark, sf_dir):
    """KQL `lookup`: dimension chain customer→nation→region, both dims
    broadcast — zero shuffles regardless of fact-table size."""
    e = _eng(spark, sf_dir)
    return (
        e.table("customer")
        .lookup(e.table("nation"), on=F.col("c_nationkey") == F.col("n_nationkey"))
        .lookup(e.table("region"), on=F.col("n_regionkey") == F.col("r_regionkey"))
        .project("c_custkey", "c_name", "n_name", "r_name")
        .to_df()
    )


# ---------------------------------------------------------------- union
@register(
    "union_outer",
    oracle="""
    SELECT event_id AS id, 'event' AS src, value AS amount FROM events
    UNION ALL BY NAME
    SELECT o_orderkey AS id, 'order' AS src, o_totalprice AS amount FROM orders
    """,
)
def union_outer(spark, sf_dir):
    """KQL: union kind=outer — schema union by name."""
    e = _eng(spark, sf_dir)
    ev = e.table("events").project(
        id=F.col("event_id"), src=F.lit("event"), amount=F.col("value")
    )
    od = e.table("orders").project(
        id=F.col("o_orderkey"), src=F.lit("order"), amount=F.col("o_totalprice")
    )
    return ev.union(od, kind="outer").to_df()


@register(
    "union_inner_mismatched",
    oracle="""
    SELECT c_custkey AS key, c_acctbal AS bal FROM customer
    UNION ALL
    SELECT s_suppkey AS key, s_acctbal AS bal FROM supplier
    """,
)
def union_inner_mismatched(spark, sf_dir):
    """KQL union kind=inner: only common columns survive."""
    e = _eng(spark, sf_dir)
    c = e.table("customer").project(
        key=F.col("c_custkey"), bal=F.col("c_acctbal"), extra_c=F.lit(1)
    )
    s = e.table("supplier").project(
        key=F.col("s_suppkey"), bal=F.col("s_acctbal")
    )
    return c.union(s, kind="inner").to_df()


# ---------------------------------------------------------------- mv-expand / range / print
@register(
    "mv_expand_words",
    oracle="""
    SELECT word, COUNT(*) AS wc
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY wc DESC, word ASC LIMIT 20
    """,
)
def mv_expand_words(spark, sf_dir):
    """KQL: documents | mv-expand word = split(text, ' ')
    | summarize wc=count() by word | top 20 by wc (word tiebreak)."""
    e = _eng(spark, sf_dir)
    return (
        e.table("documents")
        .project(word=S.split("text", " "))
        .mv_expand("word")
        .where(F.col("word") != "")
        .summarize({"wc": F.count(F.lit(1))}, by=["word"])
        .sort(F.col("wc").desc(), F.col("word").asc())
        .take(20)
        .to_df()
    )


@register(
    "mv_expand_indexed",
    oracle="""
    SELECT doc_id, CAST(idx AS BIGINT) AS idx, word
    FROM (SELECT doc_id,
                 unnest(string_split(text, ' ')) AS word,
                 unnest(range(len(string_split(text, ' ')))) AS idx
          FROM documents WHERE doc_id < 5)
    """,
)
def mv_expand_indexed(spark, sf_dir):
    """KQL mv-expand with_itemindex — posexplode keeps the element index."""
    e = _eng(spark, sf_dir)
    return (
        e.table("documents")
        .where(F.col("doc_id") < 5)
        .project("doc_id", word=S.split("text", " "))
        .mv_expand("word", index_col="idx")
        .project("doc_id", idx=F.col("idx").cast("long"), word=F.col("word"))
        .to_df()
    )


@register(
    "range_table",
    oracle="""
    SELECT x, x * x AS x2 FROM generate_series(1, 100, 3) AS t(x)
    """,
)
def range_table(spark, sf_dir):
    """KQL: range x from 1 to 100 step 3 | extend x2 = x*x."""
    e = _eng(spark, sf_dir)
    df = spark.range(1, 101, 3).select(F.col("id").alias("x"))
    return e.from_df(df).extend(x2=F.col("x") * F.col("x")).to_df()


@register(
    "print_scalars",
    oracle="""
    SELECT CAST(3 AS BIGINT) AS a, 'ab' || '-' || 'cd' AS s,
           CAST(2.5 AS DOUBLE) AS d
    """,
)
def print_scalars(spark, sf_dir):
    """KQL: print a=1+2, s=strcat('ab','-','cd'), d=2.5"""
    df = spark.range(1).select(
        (F.lit(1) + F.lit(2)).cast("long").alias("a"),
        S.strcat("ab", "-", "cd").alias("s"),
        F.lit(2.5).alias("d"),
    )
    return df


# ---------------------------------------------------------------- search / getschema / parse
@register(
    "search_term",
    oracle="""
    SELECT doc_id, source FROM documents
    WHERE lower(text) LIKE '%vector%' OR lower(lang) LIKE '%vector%'
       OR lower(source) LIKE '%vector%'
    """,
)
def search_term(spark, sf_dir):
    """KQL: documents | search 'vector' — match across all string cols."""
    e = _eng(spark, sf_dir)
    return e.table("documents").search("vector").project("doc_id", "source").to_df()


@register(
    "parse_pattern",
    oracle="""
    SELECT doc_id, CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) AS src_num
    FROM documents
    WHERE regexp_matches(source, 'src\\d+')
    """,
)
def parse_pattern(spark, sf_dir):
    """KQL: documents | parse source with 'src' src_num:int."""
    e = _eng(spark, sf_dir)
    return (
        e.table("documents")
        .where(F.col("source").rlike("src\\d+"))
        .project(
            "doc_id",
            src_num=F.regexp_extract(F.col("source"), "src(\\d+)", 1).cast("int"),
        )
        .to_df()
    )


@register(
    "find_in_tables",
    oracle="""
    SELECT 'documents' AS source_table, CAST(doc_id AS BIGINT) AS id
    FROM documents WHERE lower(text) LIKE '%shuffle%'
       OR lower(lang) LIKE '%shuffle%' OR lower(source) LIKE '%shuffle%'
    UNION ALL
    SELECT 'events' AS source_table, event_id AS id
    FROM events WHERE lower(event_type) LIKE '%shuffle%'
       OR lower(props) LIKE '%shuffle%'
    """,
)
def find_in_tables(spark, sf_dir):
    """KQL `find in (documents, events) 'shuffle'` — per-table search
    legs unioned with a source column (SURVEY.md §2.2.1)."""
    e = _eng(spark, sf_dir)
    docs = (
        e.table("documents")
        .search("shuffle")
        .project(source_table=F.lit("documents"), id=F.col("doc_id"))
    )
    # events leg: search over its string columns only (event_type, props)
    ev_leg = (
        e.table("events")
        .project("event_id", "event_type", "props")
        .search("shuffle")
        .project(source_table=F.lit("events"), id=F.col("event_id"))
    )
    return docs.union(ev_leg).to_df()


@register(
    "getschema_op",
    oracle="""
    SELECT * FROM (VALUES
      ('event_id',   CAST(0 AS INT), 'bigint',        'long'),
      ('ts',         CAST(1 AS INT), 'timestamp',     'datetime'),
      ('user_id',    CAST(2 AS INT), 'bigint',        'long'),
      ('event_type', CAST(3 AS INT), 'string',        'string'),
      ('value',      CAST(4 AS INT), 'double',        'real'),
      ('props',      CAST(5 AS INT), 'string',        'string')
    ) AS t(ColumnName, ColumnOrdinal, DataType, ColumnType)
    ORDER BY ColumnOrdinal
    """,
)
def getschema_op(spark, sf_dir):
    """KQL getschema over events. Oracle is the VALUES twin of the
    events table's fixed parquet schema (driver-generated; identical at
    every SF): DataType = Spark simpleString, ColumnType = the KQL
    type mapping (types.py spark_to_kql)."""
    return _eng(spark, sf_dir).table("events").getschema().to_df()


@register("sample_op", oracle=None)
def sample_op(spark, sf_dir):
    """KQL sample N — exact-N random rows (values nondeterministic
    across engines → rows-only; the row COUNT itself is exact)."""
    return _eng(spark, sf_dir).table("events").sample(500, seed=42).to_df()


@register(
    "sample_envelope",
    oracle="""
    SELECT CAST(least(500, count(*)) AS BIGINT) AS n_sampled,
           TRUE AS subset_ok
    FROM events
    """,
)
def sample_envelope(spark, sf_dir):
    """KQL `sample N` as a graded contract (r16 — the envelope
    pattern over the seed-dependent op): the sampled row COUNT must be
    exactly min(N, |T|) — Kusto's sample never under-fills — and
    every sampled row must exist in the source (left join against the
    deduplicated source; a fabricated or mutated row leaves its
    marker null). Which rows were drawn stays OUT of the value hash
    (engine-seed-dependent, sample_op above stays rows-only for
    that)."""
    eng = _eng(spark, sf_dir)
    samp = eng.table("events").sample(500, seed=42).to_df()
    src = (
        eng.table("events")
        .to_df()
        .select(samp.columns)
        .dropDuplicates()
        .withColumn("__member", F.lit(1))
    )
    joined = samp.join(src, on=samp.columns, how="left")
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.bool_and(F.col("__member").isNotNull()).alias("subset_ok"),
    )
