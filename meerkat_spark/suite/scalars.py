"""Scalar-function queries (SURVEY.md §2.2.3): KQL string / datetime /
math / conditional / dynamic functions with DuckDB oracle twins. All
row-level (no aggregation) → values are bit-identical across engines;
only derived aggregates get rounded."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.engine import MeerkatEngine
from meerkat_spark.functions import scalar as S
from meerkat_spark.suite import register


def _eng(spark, sf_dir) -> MeerkatEngine:
    return MeerkatEngine(spark, sf_dir)


@register(
    "scalar_strings",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INT) AS len,
           upper(substring(text, 1, 3)) AS head3,
           string_split(text, ' ')[1] AS first_word,
           CAST(strpos(text, 'spark') - 1 AS BIGINT) AS spark_idx,
           replace(text[1:20], ' ', '_') AS squished,
           lower(source) AS src_lc,
           reverse(lang) AS gnal,
           CASE WHEN text LIKE 'the%' THEN 1 ELSE 0 END AS starts_the
    FROM documents
    """,
)
def scalar_strings(spark, sf_dir):
    """KQL strlen/substring(0-based)/split/indexof/replace_string/
    tolower/reverse/startswith."""
    t = _eng(spark, sf_dir).table("documents")
    return t.project(
        "doc_id",
        len=S.strlen("text"),
        head3=S.toupper(S.substring("text", 0, 3)),
        first_word=S.split("text", " ", index=0),
        spark_idx=S.indexof("text", "spark"),
        squished=S.replace_string(S.substring("text", 0, 20), " ", "_"),
        src_lc=S.tolower("source"),
        gnal=S.reverse("lang"),
        starts_the=F.when(F.col("text").startswith("the"), 1).otherwise(0),
    ).to_df()


@register(
    "scalar_string_funcs2",
    oracle="""
    SELECT doc_id,
           concat(lang, ':', source) AS tag,
           concat_ws('|', lang, source, 'x') AS tag2,
           md5(text) AS h,
           CAST(len(string_split(text, 'a')) - 1 AS BIGINT) AS n_a,
           trim(text, ' ') AS trimmed,
           left(text, 5) AS l5,
           right(source, 1) AS r1
    FROM documents WHERE doc_id < 50
    """,
)
def scalar_string_funcs2(spark, sf_dir):
    """KQL strcat/strcat_delim/hash_md5/countof/trim."""
    t = _eng(spark, sf_dir).table("documents")
    return (
        t.where(F.col("doc_id") < 50)
        .project(
            "doc_id",
            tag=S.strcat(F.col("lang"), ":", F.col("source")),
            tag2=S.strcat_delim("|", F.col("lang"), F.col("source"), "x"),
            h=F.md5("text"),
            n_a=S.countof("text", "a").cast("long"),
            trimmed=F.trim(F.col("text")),
            l5=F.substring(F.col("text"), 1, 5),
            r1=F.substring(F.col("source"), -1, 1),
        )
        .to_df()
    )


@register(
    "scalar_datetime",
    oracle="""
    SELECT event_id,
           date_trunc('day', ts) AS d,
           date_trunc('month', ts) AS mo,
           CAST(hour(ts) AS INT) AS hh,
           CAST(EXTRACT(dow FROM ts) AS INT) AS dow,
           CAST(EXTRACT(week FROM ts) AS INT) AS wk,
           time_bucket(INTERVAL '15 minutes', ts) AS q,
           datediff('day', date_trunc('day', TIMESTAMP '2024-01-01'),
                    date_trunc('day', ts)) AS days_since
    FROM events WHERE event_id < 100
    """,
)
def scalar_datetime(spark, sf_dir):
    """KQL startofday/startofmonth/hourofday/dayofweek/week_of_year/
    bin(ts, 15m)/datetime_diff."""
    t = _eng(spark, sf_dir).table("events")
    return (
        t.where(F.col("event_id") < 100)
        .project(
            "event_id",
            d=S.startofday("ts"),
            mo=S.startofmonth("ts"),
            hh=S.hourofday("ts"),
            dow=S.dayofweek_timespan("ts").cast("int"),
            wk=S.week_of_year("ts").cast("int"),
            q=S.bin_datetime("ts", 900),
            days_since=F.expr(
                "timestampdiff(DAY, date_trunc('day', TIMESTAMP '2024-01-01'),"
                " date_trunc('day', ts))"
            ).cast("long"),
        )
        .to_df()
    )


@register(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS adisc,
           l_extendedprice / 100.0 AS price_h,
           CAST(floor(l_quantity / 7) AS BIGINT) AS q7,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS q7c,
           round(sqrt(l_extendedprice), 6) AS sq,
           round(ln(l_extendedprice), 6) AS lg,
           round(log10(l_extendedprice), 6) AS lg10,
           round(pow(l_discount, 2), 10) AS d2,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def scalar_math(spark, sf_dir):
    """KQL abs/round/floor/ceiling/sqrt/log/log10/pow/sign. Transcendental
    outputs rounded (libm differences across engines)."""
    t = _eng(spark, sf_dir).table("lineitem")
    return (
        t.where(F.col("l_orderkey") < 200)
        .project(
            "l_orderkey",
            "l_linenumber",
            adisc=F.abs(F.col("l_discount") - 0.05),
            # no round: raw division is bit-identical across engines,
            # while round() at decimal-aligned .5 boundaries is not
            price_h=F.col("l_extendedprice") / 100.0,
            q7=F.floor(F.col("l_quantity") / 7).cast("long"),
            q7c=S.ceiling(F.col("l_quantity") / 7).cast("long"),
            sq=F.round(F.sqrt("l_extendedprice"), 6),
            lg=F.round(F.log(F.col("l_extendedprice")), 6),
            lg10=F.round(F.log10("l_extendedprice"), 6),
            d2=F.round(F.pow(F.col("l_discount"), 2), 10),
            sg=F.signum(F.col("l_discount") - F.lit(0.05)),
        )
        .to_df()
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT event_id,
           CASE WHEN value > 50 THEN 'hot' ELSE 'cold' END AS heat,
           CASE WHEN event_type = 'click' THEN 1
                WHEN event_type = 'view' THEN 2
                ELSE 0 END AS type_code,
           COALESCE(NULLIF(event_type, 'error'), 'n/a') AS safe_type,
           LEAST(value, 50.0) AS capped,
           GREATEST(value, 10.0) AS floored,
           CASE WHEN value IS NULL THEN 1 ELSE 0 END AS is_null
    FROM events WHERE event_id < 200
    """,
)
def scalar_conditional(spark, sf_dir):
    """KQL iff/case/coalesce/min_of/max_of/isnull."""
    t = _eng(spark, sf_dir).table("events")
    return (
        t.where(F.col("event_id") < 200)
        .project(
            "event_id",
            heat=S.iff(F.col("value") > 50, "hot", "cold"),
            type_code=S.case(
                F.col("event_type") == "click", 1, F.col("event_type") == "view", 2, 0
            ),
            safe_type=F.coalesce(
                F.nullif(F.col("event_type"), F.lit("error")), F.lit("n/a")
            ),
            capped=S.min_of(F.col("value"), F.lit(50.0)),
            floored=S.max_of(F.col("value"), F.lit(10.0)),
            is_null=F.when(F.col("value").isNull(), 1).otherwise(0),
        )
        .to_df()
    )


@register(
    "scalar_casts",
    oracle="""
    SELECT doc_id,
           TRY_CAST(substring(source, 4, 10) AS INT) AS src_int,
           TRY_CAST(lang AS DOUBLE) AS lang_num,
           CAST(n_chars AS VARCHAR) AS chars_str,
           TRY_CAST(NULL AS BIGINT) AS always_null
    FROM documents WHERE doc_id < 100
    """,
)
def scalar_casts(spark, sf_dir):
    """KQL toint/todouble/tostring — failed casts yield null (KQL
    semantics = Spark try_cast = DuckDB TRY_CAST)."""
    t = _eng(spark, sf_dir).table("documents")
    return (
        t.where(F.col("doc_id") < 100)
        .project(
            "doc_id",
            src_int=S.toint(F.col("source").substr(4, 10)),
            lang_num=S.todouble("lang"),
            chars_str=S.tostring("n_chars"),
            always_null=F.lit(None).cast("long"),
        )
        .to_df()
    )


@register(
    "scalar_dynamic_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing
    FROM events WHERE event_id < 300
    """,
)
def scalar_dynamic_json(spark, sf_dir):
    """KQL dynamic member access: props.k → get_json_object (dynamic is
    a JSON string column, types.py)."""
    t = _eng(spark, sf_dir).table("events")
    return (
        t.where(F.col("event_id") < 300)
        .project(
            "event_id",
            k=S.toint(S.parse_json_get("props", "k")),
            missing=S.parse_json_get("props", "missing"),
        )
        .to_df()
    )


@register(
    "scalar_arrays",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           ROUND(list_sum(CAST(embedding AS DOUBLE[])), 6) AS vsum,
           ROUND(list_max(CAST(embedding AS DOUBLE[])), 6) AS vmax,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           CAST(COALESCE(list_position([1], 2), 0) AS BIGINT) - 1 AS no_pos
    FROM embeddings WHERE vec_id < 100
    """,
)
def scalar_arrays(spark, sf_dir):
    """KQL array_length/array_sum/element access over a real array column."""
    t = _eng(spark, sf_dir).table("embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (
        t.where(F.col("vec_id") < 100)
        .project(
            "vec_id",
            dim=S.array_length("embedding"),
            vsum=F.round(S.array_sum("embedding"), 6),
            vmax=F.round(F.array_max(emb_d), 6),
            first_val=F.round(F.element_at(emb_d, 1), 6),
            no_pos=S.array_index_of(F.array(F.lit(1)), 2),
        )
        .to_df()
    )


@register(
    "scalar_array_ops",
    oracle="""
    SELECT x,
           array_to_string(list_sort([x, x*2, x%5]), ',') AS sorted_arr,
           array_to_string(list_reverse_sort([x, x*2, x%5]), ',') AS rsorted_arr,
           CAST(len(list_distinct([x%3, x%5, x%3])) AS BIGINT) AS n_uniq,
           array_to_string(list_intersect([x, x+1, x+2], [x+2, x+3]), ',') AS inter
    FROM generate_series(0, 19) AS t(x)
    """,
)
def scalar_array_ops(spark, sf_dir):
    """KQL pack_array/array_sort_asc/array_sort_desc/set_intersect —
    over a generated range table."""
    df = spark.range(0, 20).select(F.col("id").alias("x"))
    x = F.col("x")
    arr = F.array(x, x * 2, x % 5)
    return df.select(
        "x",
        F.array_join(S.array_sort_asc(arr), ",").alias("sorted_arr"),
        F.array_join(S.array_sort_desc(arr), ",").alias("rsorted_arr"),
        F.size(F.array_distinct(F.array(x % 3, x % 5, x % 3))).cast("long").alias("n_uniq"),
        F.array_join(
            S.set_intersect(F.array(x, x + 1, x + 2), F.array(x + 2, x + 3)), ","
        ).alias("inter"),
    )


@register(
    "scalar_predicates",
    oracle="""
    SELECT doc_id,
           CASE WHEN regexp_matches(text, '(?i)\\bspark\\b') THEN 1 ELSE 0 END AS has_spark,
           CASE WHEN text LIKE '%data%' THEN 1 ELSE 0 END AS contains_data,
           CASE WHEN lang IN ('en','fr','de') THEN 1 ELSE 0 END AS known_lang,
           CASE WHEN n_chars BETWEEN 100 AND 300 THEN 1 ELSE 0 END AS mid_size
    FROM documents
    """,
)
def scalar_predicates(spark, sf_dir):
    """KQL has/contains/in/between predicates."""
    t = _eng(spark, sf_dir).table("documents")
    return t.project(
        "doc_id",
        has_spark=F.when(S.has_term("text", "spark"), 1).otherwise(0),
        contains_data=F.when(F.col("text").contains("data"), 1).otherwise(0),
        known_lang=F.when(S.in_list("lang", ["en", "fr", "de"]), 1).otherwise(0),
        mid_size=F.when(S.between("n_chars", 100, 300), 1).otherwise(0),
    ).to_df()


@register(
    "scalar_misc",
    oracle="""
    SELECT doc_id,
           CASE WHEN lang < source THEN -1 WHEN lang = source THEN 0 ELSE 1 END AS cmp,
           array_to_string(json_keys(json('{"a":1,"b":2}')), ',') AS bkeys,
           CAST(CAST(n_chars AS DECIMAL(38,6)) * 1.25 AS DOUBLE) AS dec_mul,
           to_base64(encode('x' || lang)) AS b64,
           CASE WHEN n_chars % 2 = 0 THEN NULL ELSE n_chars END AS odd_or_null
    FROM documents WHERE doc_id < 60
    """,
)
def scalar_misc(spark, sf_dir):
    """Leftover scalars: strcmp, bag_keys, decimal arithmetic,
    base64_encode, nullif-style conditionals."""
    t = _eng(spark, sf_dir).table("documents")
    cmp = (
        F.when(F.col("lang") < F.col("source"), -1)
        .when(F.col("lang") == F.col("source"), 0)
        .otherwise(1)
    )
    return (
        t.where(F.col("doc_id") < 60)
        .project(
            "doc_id",
            cmp=cmp,
            bkeys=F.array_join(S.bag_keys(F.lit('{"a":1,"b":2}')), ","),
            # decimal DIVISION result scale differs across engines; exact
            # multiplication does not
            dec_mul=(F.col("n_chars").cast("decimal(38,6)") * 1.25).cast("double"),
            b64=S.base64_encode_tostring(S.strcat("x", F.col("lang"))),
            odd_or_null=F.when(F.col("n_chars") % 2 == 0, F.lit(None)).otherwise(
                F.col("n_chars")
            ),
        )
        .to_df()
    )


@register(
    "scalar_extract_regex",
    oracle="""
    SELECT doc_id,
           COALESCE(NULLIF(regexp_extract(source, 'src(\\d+)', 1), ''), NULL) AS src_num,
           CAST(len(regexp_extract_all(text, '\\bthe\\b')) AS INT) AS n_the
    FROM documents WHERE doc_id < 200
    """,
)
def scalar_extract_regex(spark, sf_dir):
    """KQL extract/extract_all (null on no-match)."""
    t = _eng(spark, sf_dir).table("documents")
    return (
        t.where(F.col("doc_id") < 200)
        .project(
            "doc_id",
            src_num=S.extract("src(\\d+)", 1, "source"),
            n_the=F.size(
                F.regexp_extract_all(F.col("text"), F.lit("\\bthe\\b"), 0)
            ),
        )
        .to_df()
    )


@register(
    "scalar_datetime_extended",
    oracle="""
    SELECT event_id,
           ts + INTERVAL 2 DAY AS da,
           CAST(epoch(date_trunc('day', ts) - TIMESTAMP '2024-01-01') AS BIGINT) AS dd,
           CAST(date_part('hour', ts) AS BIGINT) AS dp,
           date_trunc('day', ts) + INTERVAL 1 DAY - INTERVAL 1 MICROSECOND AS eod,
           CAST(date_part('doy', ts) AS BIGINT) AS doy,
           TIMESTAMP '2024-01-01 06:00:00'
             + INTERVAL 1 DAY * CAST(floor(epoch(ts - TIMESTAMP '2024-01-01 06:00:00') / 86400) AS BIGINT) AS ba
    FROM events WHERE event_id < 100
    """,
)
def scalar_datetime_extended(spark, sf_dir):
    """Round-3 datetime surface: datetime_add/diff/part, endofday,
    dayofyear, bin_at — all through the KQL front-end."""
    from meerkat_spark.engine import MeerkatEngine

    return MeerkatEngine(spark, sf_dir).kql(
        """events | where event_id < 100
           | project event_id,
             da = datetime_add('day', 2, ts),
             dd = datetime_diff('second', startofday(ts), datetime(2024-01-01)),
             dp = tolong(datetime_part('hour', ts)),
             eod = endofday(ts),
             doy = tolong(dayofyear(ts)),
             ba = bin_at(ts, 1d, datetime(2024-01-01 06:00:00))"""
    ).to_df()


@register(
    "scalar_strings_extended",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS ej,
           concat(event_type, '|', event_type) AS sr,
           replace(replace(event_type, 'c', 'C'), 'v', 'V') AS tr
    FROM events WHERE event_id < 100
    """,
)
def scalar_strings_extended(spark, sf_dir):
    """Round-3 string surface: extract_json, strrep, translate."""
    from meerkat_spark.engine import MeerkatEngine

    return MeerkatEngine(spark, sf_dir).kql(
        """events | where event_id < 100
           | project event_id,
             ej = extract_json('$.k', props),
             sr = strrep(event_type, 2, '|'),
             tr = translate('cv', 'CV', event_type)"""
    ).to_df()


@register(
    "scalar_string_bytes",
    oracle="""
    SELECT doc_id,
           lower(to_hex(doc_id)) AS hx,
           lpad(lower(to_hex(doc_id)), 8, '0') AS hx8,
           CAST(strlen(text) AS BIGINT) AS bytes,
           (strlen(text) = length(text)) AS ascii_only,
           CASE WHEN regexp_matches(text, 'the\\s+\\w+')
                THEN CAST(length(list_extract(regexp_split_to_array(text, 'the\\s+\\w+'), 1)) AS BIGINT)
                ELSE -1 END AS ir,
           replace(replace(text, 'the', 'THE'), 'and', 'AND') AS rs
    FROM documents WHERE doc_id < 200
    """,
)
def scalar_string_bytes(spark, sf_dir):
    """Round-4 string/byte surface through the KQL front-end: tohex
    (with zero-pad), string_size (UTF-8 bytes), isascii, indexof_regex
    (0-based, -1 absent), replace_strings (ordered pair fold) — each
    reproduced exactly by the DuckDB oracle."""
    from meerkat_spark.engine import MeerkatEngine

    return MeerkatEngine(spark, sf_dir).kql(
        """documents | where doc_id < 200
           | project doc_id,
             hx = tohex(doc_id),
             hx8 = tohex(doc_id, 8),
             bytes = string_size(text),
             ascii_only = isascii(text),
             ir = indexof_regex(text, "the\\\\s+\\\\w+"),
             rs = replace_strings(text, dynamic(["the","and"]), dynamic(["THE","AND"]))"""
    ).to_df()


@register(
    "scalar_format_fns",
    oracle="""
    WITH m AS (
      SELECT doc_id, text,
             CAST(n_chars - 300 AS DOUBLE) AS s1,
             CAST((n_chars - 300) * 500 AS DOUBLE) AS s2
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           CASE WHEN s1 < 0 THEN '-' ELSE '' END
             || lpad(CAST(floor((abs(s1) % 86400) / 3600) AS BIGINT)::VARCHAR, 2, '0')
             || ':' || lpad(CAST(floor((abs(s1) % 3600) / 60) AS BIGINT)::VARCHAR, 2, '0')
             || ':' || lpad(CAST(floor(abs(s1) % 60) AS BIGINT)::VARCHAR, 2, '0')
             AS ft,
           CASE WHEN s2 < 0 THEN '-' ELSE '' END
             || CAST(floor(abs(s2) / 86400) AS BIGINT)::VARCHAR || '.'
             || lpad(CAST(floor((abs(s2) % 86400) / 3600) AS BIGINT)::VARCHAR, 2, '0')
             || ':' || lpad(CAST(floor((abs(s2) % 3600) / 60) AS BIGINT)::VARCHAR, 2, '0')
             || ':' || lpad(CAST(floor(abs(s2) % 60) AS BIGINT)::VARCHAR, 2, '0')
             AS ftd,
           CASE WHEN contains(lower(text), 'the quick') THEN 0
                WHEN list_contains(regexp_split_to_array(lower(text), '\\W+'), 'and')
                  THEN 1
                ELSE -1 END AS hai,
           CASE WHEN contains(lower(text), 'zz plural zz') THEN 0
                ELSE -1 END AS hai2
    FROM m
    """,
)
def scalar_format_fns(spark, sf_dir):
    """Round-5 fix pins, driver-graded: format_timespan renders
    negative spans with one leading '-' over abs-valued fields (both
    hh:mm:ss and d.hh:mm:ss shapes), and has_any_index falls back to
    phrase containment for terms with non-word characters while plain
    terms keep whole-token matching."""
    from meerkat_spark.engine import MeerkatEngine

    return MeerkatEngine(spark, sf_dir).kql(
        """documents | where doc_id < 300
           | project doc_id,
             ft = format_timespan(n_chars - 300, 'hh:mm:ss'),
             ftd = format_timespan((n_chars - 300) * 500, 'd.hh:mm:ss'),
             hai = has_any_index(text, dynamic(['the quick', 'and'])),
             hai2 = has_any_index(text, dynamic(['zz plural zz']))"""
    ).to_df()


@register(
    "scalar_series_similarity",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             list_append(embedding[2:]::DOUBLE[], embedding[1]::DOUBLE) AS rot
      FROM embeddings WHERE vec_id < 200
    )
    SELECT vec_id,
           round(list_inner_product(e, e), 4) AS dp,
           round(list_inner_product(e, rot)
                 / (sqrt(list_inner_product(e, e))
                    * sqrt(list_inner_product(rot, rot))), 4) AS cs
    FROM v
    """,
)
def scalar_series_similarity(spark, sf_dir):
    """Round-5 series_dot_product / series_cosine_similarity through
    the KQL front-end (JVM zip_with+aggregate fold, double
    accumulation) against DuckDB's list_inner_product twin — the
    second vector is the first rotated by one (array_rotate_left)."""
    from meerkat_spark.engine import MeerkatEngine

    return MeerkatEngine(spark, sf_dir).kql(
        """embeddings | where vec_id < 200
           | project vec_id,
             dp = round(series_dot_product(embedding, embedding), 4),
             cs = round(series_cosine_similarity(
                    embedding, array_rotate_left(embedding, 1)), 4)"""
    ).to_df()


@register(
    "scalar_round5_extras",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_name IS NULL OR c_mktsegment IS NULL THEN NULL
                WHEN c_name < c_mktsegment THEN -1
                WHEN c_name > c_mktsegment THEN 1 ELSE 0 END AS cmp_nm,
           0 AS cmp_self,
           CAST(bit_count((c_custkey * 2654435761) % 9007199254740993)
                AS BIGINT) AS ones,
           array_to_string(
             list_transform(range(1, strlen(c_mktsegment) + 1),
                            i -> ord(substr(c_mktsegment, CAST(i AS INT), 1))),
             ',') AS seg_bytes
    FROM customer
    """,
)
def scalar_round5_extras(spark, sf_dir):
    """Round-5 scalar stragglers through the KQL front-end: strcmp
    (ordinal -1/0/1), bitset_count_ones (64-bit popcount),
    base64_decode_toarray (base-64 → byte array, exercised as an
    encode→decode round trip whose oracle is just the source string's
    code points) — functions/scalar.py, all JVM expressions."""
    from meerkat_spark.engine import MeerkatEngine

    return MeerkatEngine(spark, sf_dir).kql(
        """customer
           | project c_custkey, c_name, c_mktsegment
           | extend cmp_nm = strcmp(c_name, c_mktsegment),
                    cmp_self = strcmp(c_name, c_name),
                    ones = bitset_count_ones(
                        (c_custkey * 2654435761) % 9007199254740993),
                    seg_bytes = strcat_array(
                        base64_decode_toarray(
                            base64_encode_tostring(c_mktsegment)), ',')
           | project c_custkey, cmp_nm, cmp_self, ones, seg_bytes"""
    ).to_df()


@register(
    "scalar_ipv6_family",
    oracle="""
    -- inputs constructed so the canonical form is known analytically:
    -- the oracle derives ground truth by construction, it does not
    -- reimplement the parser.
    WITH f AS (
      SELECT c_custkey,
             c_custkey % 65536 AS k,
             (c_custkey * 31) % 65536 AS k2
      FROM customer
    ), g AS (
      SELECT c_custkey,
             lpad(lower(hex(k)), 4, '0') AS hk,
             lpad(lower(hex(k2)), 4, '0') AS hk2
      FROM f
    )
    SELECT c_custkey,
           '2001:0db8:0000:0000:0000:0000:0000:' || hk AS canon_compressed,
           '0000:0000:0000:0000:0000:ffff:c0a8:' || hk2[1:2] || ':'
             AS bad_join_probe,
           CASE WHEN hk < hk2 THEN -1 WHEN hk > hk2 THEN 1 ELSE 0 END
             AS cmp_tail,
           TRUE AS match64,
           (hk = hk2) AS match128
    FROM g
    """,
)
def scalar_ipv6_family(spark, sf_dir):
    """IPv6 family (functions/scalar.py): parse_ipv6 canonicalization
    of '::'-compressed input, ipv6_compare sign, and ipv6_is_match at
    /64 and /128 — over constructed addresses whose canonical forms
    the oracle knows analytically (construction-based ground truth,
    not a parallel parser). bad_join_probe pins the hex zero-padding
    independently."""
    from meerkat_spark.engine import MeerkatEngine

    return MeerkatEngine(spark, sf_dir).kql(
        """customer
           | extend k = c_custkey % 65536, k2 = (c_custkey * 31) % 65536
           | extend hk = tolower(tohex(k, 4)), hk2 = tolower(tohex(k2, 4))
           | extend ip1 = strcat('2001:db8::', hk),
                    ip2 = strcat('2001:db8::', hk2)
           | project c_custkey,
                     canon_compressed = parse_ipv6(ip1),
                     bad_join_probe = strcat('0000:0000:0000:0000:0000:ffff:c0a8:',
                                             substring(hk2, 0, 2), ':'),
                     cmp_tail = ipv6_compare(ip1, ip2),
                     match64 = ipv6_is_match(ip1, ip2, 64),
                     match128 = ipv6_is_match(ip1, ip2, 128)"""
    ).to_df()


@register(
    "scalar_series_elementwise",
    oracle="""
    WITH base AS (
      SELECT CAST(x AS DOUBLE) AS e1,
             CAST(x*2 + 1 AS DOUBLE) AS e2,
             CAST(x % 7 AS DOUBLE) AS e3,
             x
      FROM generate_series(0, 199) AS t(x)
    )
    SELECT x,
           -- series_sum(series_add(s, series_multiply(s, 2.0))),
           -- left-to-right fold starting at 0.0
           ((0.0 + (e1 + e1*2)) + (e2 + e2*2)) + (e3 + e3*2) AS add_sum,
           -- series_product(series_add(s, 1.0)), fold from 1.0
           ((1.0 * (e1+1)) * (e2+1)) * (e3+1) AS prod1,
           ROUND(sqrt(((0.0 + e1*e1) + e2*e2) + e3*e3), 6) AS mag,
           -- pearson r of s against t2 = s*2 + x%3 (perfectly linear
           -- per-row => r = 1 everywhere; formula kept term-for-term)
           ROUND(
             (3.0*(((0.0 + e1*(e1*2 + x%3)) + e2*(e2*2 + x%3)) + e3*(e3*2 + x%3))
              - (((0.0+e1)+e2)+e3) * (((0.0+(e1*2 + x%3))+(e2*2 + x%3))+(e3*2 + x%3)))
             / (sqrt(3.0*(((0.0 + e1*e1)+e2*e2)+e3*e3)
                     - (((0.0+e1)+e2)+e3)*(((0.0+e1)+e2)+e3))
                * sqrt(3.0*(((0.0 + (e1*2+x%3)*(e1*2+x%3))
                             + (e2*2+x%3)*(e2*2+x%3)) + (e3*2+x%3)*(e3*2+x%3))
                       - (((0.0+(e1*2+x%3))+(e2*2+x%3))+(e3*2+x%3))
                         * (((0.0+(e1*2+x%3))+(e2*2+x%3))+(e3*2+x%3)))), 6)
             AS r,
           CAST((CASE WHEN e1 > 3 THEN 1 ELSE 0 END)
              + (CASE WHEN e2 > 3 THEN 1 ELSE 0 END)
              + (CASE WHEN e3 > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_gt3,
           ((0.0 + floor(e1/2.0)) + floor(e2/2.0)) + floor(e3/2.0) AS half_floor_sum,
           (e1 + e3) / 2.0 AS seas0,
           e2 AS seas1,
           ROUND((e1 + e2) + e3, 6) AS cum_last,
           ((0.0 + e1*e1) + e2*e2) + e3*e3 AS pow2_sum
    FROM base
    """,
)
def scalar_series_elementwise(spark, sf_dir):
    """Elementwise series family (functions/series.py): add / multiply /
    divide / pow / greater / floor as JVM higher-order functions,
    series_sum/product/magnitude folds, series_pearson_correlation,
    plus the Arrow kernels series_iir (cumulative-sum coefficients) and
    series_seasonal (per-phase median). Series are built per-row from
    integer-valued doubles, so every fold is exact and the oracle can
    restate the same association order term-for-term."""
    from meerkat_spark.functions import series as SER

    df = spark.range(0, 200).select(F.col("id").alias("x"))
    x = F.col("x")
    s = F.array(
        x.cast("double"),
        (x * 2 + 1).cast("double"),
        (x % 7).cast("double"),
    )
    xm3 = (x % 3).cast("double")
    t2 = SER.series_add(SER.series_multiply(s, 2.0), F.array(xm3, xm3, xm3))
    seas = SER.series_seasonal(s, 2)
    cum = SER.series_iir(s, [1.0], [1.0, -1.0])
    return df.select(
        "x",
        SER.series_sum(SER.series_add(s, SER.series_multiply(s, 2.0))).alias(
            "add_sum"
        ),
        SER.series_product(SER.series_add(s, 1.0)).alias("prod1"),
        F.round(SER.series_magnitude(s), 6).alias("mag"),
        F.round(SER.series_pearson_correlation(s, t2), 6).alias("r"),
        F.size(F.filter(SER.series_greater(s, 3.0), lambda v: v))
        .cast("long")
        .alias("n_gt3"),
        SER.series_sum(SER.series_floor(SER.series_divide(s, 2.0))).alias(
            "half_floor_sum"
        ),
        F.element_at(seas, 1).alias("seas0"),
        F.element_at(seas, 2).alias("seas1"),
        F.element_at(cum, 3).alias("cum_last"),
        SER.series_sum(SER.series_pow(s, 2.0)).alias("pow2_sum"),
    )


@register(
    "scalar_ip_ranges",
    oracle="""
    WITH f AS (
      SELECT c_custkey,
             c_custkey % 200 AS k1,
             (c_custkey * 7) % 256 AS k2,
             c_custkey % 33 AS p,
             (c_custkey * 31) % 65536 AS h
      FROM customer WHERE c_custkey <= 400
    )
    SELECT c_custkey,
           CAST(p AS INT) AS suffix,
           CAST(NULL AS INT) AS bad_suffix,
           '10.' || k1 || '.' || k2 || '.0/24' AS mask24,
           '10.' || k1 || '.0.0/16' AS mask16,
           (k1 < 128) AS in_any,
           FALSE AS in_none,
           (h < 4096) AS v6_in_116,
           TRUE AS v6_any,
           '10.' || k1 || '.0.0/24' AS cover_first,
           CAST(4 AS INT) AS cover_n
    FROM f
    """,
)
def scalar_ip_ranges(spark, sf_dir):
    """IP range family (functions/scalar.py): ipv4_netmask_suffix,
    format_ipv4_mask, ipv4_is_in_any_range, ipv6_is_in_range/any_range,
    ipv4_range_to_cidr_list — over constructed addresses whose network
    membership the oracle knows analytically (construction-based
    ground truth, like the ipv6 family query). The CIDR cover of
    [10.k.0.3, 10.k.0.10] is always 4 blocks; of [10.k.0.0,
    10.k.0.255] always the single /24."""
    t = _eng(spark, sf_dir).table("customer")
    c = F.col("c_custkey")
    k1 = (c % 200).cast("string")
    k2 = ((c * 7) % 256).cast("string")
    p = (c % 33).cast("int")
    h = (c * 31) % 65536
    ip = F.concat(F.lit("10."), k1, F.lit("."), k2, F.lit(".7"))
    ip6 = F.concat(
        F.lit("2001:db8::"),
        F.lpad(F.lower(F.conv(h.cast("string"), 10, 16)), 4, "0"),
    )
    cover1 = S.ipv4_range_to_cidr_list(
        F.concat(F.lit("10."), k1, F.lit(".0.0")),
        F.concat(F.lit("10."), k1, F.lit(".0.255")),
    )
    cover4 = S.ipv4_range_to_cidr_list(
        F.concat(F.lit("10."), k1, F.lit(".0.3")),
        F.concat(F.lit("10."), k1, F.lit(".0.10")),
    )
    return (
        t.where(c <= 400)
        .project(
            "c_custkey",
            suffix=S.ipv4_netmask_suffix(
                F.concat(ip, F.lit("/"), p.cast("string"))
            ),
            bad_suffix=S.ipv4_netmask_suffix(F.lit("300.1.2.3/8")),
            mask24=S.format_ipv4_mask(ip, F.lit(24)),
            mask16=S.format_ipv4_mask(ip, F.lit(16)),
            in_any=S.ipv4_is_in_any_range(ip, ["10.0.0.0/9", "172.16.0.0/12"]),
            in_none=S.ipv4_is_in_any_range(ip, ["192.168.0.0/16"]),
            v6_in_116=S.ipv6_is_in_range(ip6, F.lit("2001:db8::/116")),
            v6_any=S.ipv6_is_in_any_range(
                ip6, ["2001:db7::/64", "2001:db8::/32"]
            ),
            cover_first=F.element_at(cover1, 1),
            cover_n=F.size(cover4),
        )
        .to_df()
    )


@register(
    "scalar_special_math",
    oracle="""
    SELECT x,
           ROUND(gamma(v), 6) AS g,
           ROUND(lgamma(v), 6) AS lg,
           ROUND(lgamma(v + 20.0), 6) AS lg_big,
           ROUND(gamma(v - 5.0), 6) AS g_neg
    FROM (SELECT x, x % 90 / 10.0 + 0.15 AS v
          FROM generate_series(0, 179) AS t(x))
    """,
)
def scalar_special_math(spark, sf_dir):
    """gamma/loggamma (Lanczos g=7 codegen approximation, ~1e-13
    relative) against DuckDB's libm gamma/lgamma, rounded to 6dp —
    inputs span the positive range, the reflection branch (v−5 < 0,
    non-integer), and large arguments via loggamma. erf/erfc/welch_test
    have no DuckDB twin and are pytest-verified instead."""
    df = spark.range(0, 180).select(F.col("id").alias("x"))
    v = ((F.col("x") % 90) / 10.0 + 0.15).cast("double")
    return df.select(
        "x",
        F.round(S.gamma(v), 6).alias("g"),
        F.round(S.loggamma(v), 6).alias("lg"),
        F.round(S.loggamma(v + 20.0), 6).alias("lg_big"),
        F.round(S.gamma(v - 5.0), 6).alias("g_neg"),
    )


@register(
    "scalar_tz_useragent",
    oracle="""
    WITH f AS (
      SELECT event_id, ts,
             CASE event_id % 3 WHEN 0 THEN 'America/New_York'
                               WHEN 1 THEN 'Europe/Paris'
                               ELSE 'Asia/Tokyo' END AS tz,
             CASE event_id % 4
               WHEN 0 THEN 'Mozilla/5.0 (Windows NT 10.0) Chrome/120.0.0.0 Safari/537.36'
               WHEN 1 THEN 'Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Version/17.1 Safari/605.1.15'
               WHEN 2 THEN 'Mozilla/5.0 (X11; Linux x86_64) Firefox/121.0'
               ELSE 'curl/8.4.0' END AS ua
      FROM events WHERE event_id < 2000
    )
    SELECT event_id,
           timezone(tz, ts AT TIME ZONE 'UTC') AS local_ts,
           timezone('UTC', timezone(tz, timezone(tz, ts AT TIME ZONE 'UTC')))
             AS roundtrip,
           CASE event_id % 4 WHEN 0 THEN 'Chrome' WHEN 1 THEN 'Safari'
                             WHEN 2 THEN 'Firefox' ELSE 'Other' END AS browser,
           CASE event_id % 4 WHEN 0 THEN 'Windows' WHEN 1 THEN 'macOS'
                             WHEN 2 THEN 'Linux' ELSE 'Other' END AS os,
           CASE event_id % 4 WHEN 0 THEN '120.0.0.0' WHEN 1 THEN '17.1'
                             WHEN 2 THEN '121.0' ELSE NULL END AS bver
    FROM f
    """,
)
def scalar_tz_useragent(spark, sf_dir):
    """datetime_utc_to_local / datetime_local_to_utc (JVM tzdb,
    DST-aware — oracle is DuckDB's ICU timezone(), both reading IANA
    rules) and parse_user_agent lite (codegen regexp chains; oracle is
    the analytic family mapping of the synthesized UA strings).
    roundtrip re-converts the local wall clock back to UTC — equal to
    ts away from DST folds; the fixture's hourly grid stays clear of
    the ambiguous hour."""
    t = _eng(spark, sf_dir).table("events")
    e = F.col("event_id")
    tz = (
        F.when(e % 3 == 0, "America/New_York")
        .when(e % 3 == 1, "Europe/Paris")
        .otherwise("Asia/Tokyo")
    )
    ua = (
        F.when(e % 4 == 0, "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0.0.0 Safari/537.36")
        .when(e % 4 == 1, "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Version/17.1 Safari/605.1.15")
        .when(e % 4 == 2, "Mozilla/5.0 (X11; Linux x86_64) Firefox/121.0")
        .otherwise("curl/8.4.0")
    )
    parsed = S.parse_user_agent(ua)
    local = S.datetime_utc_to_local(F.col("ts"), tz)
    return (
        t.where(e < 2000)
        .project(
            "event_id",
            local_ts=local,
            roundtrip=S.datetime_local_to_utc(local, tz),
            browser=parsed["browser"],
            os=parsed["os"],
            bver=parsed["browser_version"],
        )
        .to_df()
    )


def _conv_factor(kind, a, b):
    from meerkat_spark.functions.scalar import _convert_factor

    return _convert_factor(kind, a, b)


@register(
    "scalar_unit_convert",
    oracle=f"""
    SELECT x,
           -- CAST to DOUBLE: a bare numeric literal is DECIMAL in
           -- DuckDB, and BIGINT*DECIMAL is exact decimal arithmetic —
           -- a different number than the engine's IEEE multiply
           CAST(x AS DOUBLE) * CAST({_conv_factor('length', 'Kilometer', 'Mile')!r} AS DOUBLE) AS km_mi,
           CAST(x AS DOUBLE) * CAST({_conv_factor('mass', 'Pound', 'Kilogram')!r} AS DOUBLE) AS lb_kg,
           CAST(x AS DOUBLE) * CAST({_conv_factor('speed', 'KilometerPerHour', 'MeterPerSecond')!r} AS DOUBLE) AS kmh_ms,
           CAST(x AS DOUBLE) * CAST({_conv_factor('energy', 'KilowattHour', 'Joule')!r} AS DOUBLE) AS kwh_j,
           CAST(x AS DOUBLE) * CAST({_conv_factor('angle', 'Degree', 'Radian')!r} AS DOUBLE) AS deg_rad,
           CAST(x AS DOUBLE) * CAST({_conv_factor('volume', 'Liter', 'UsGallon')!r} AS DOUBLE) AS l_gal,
           (CAST(x AS DOUBLE) - 32.0) * CAST({5.0 / 9.0!r} AS DOUBLE) + 273.15 AS f_k,
           ((CAST(x AS DOUBLE) + 273.15) - 273.15) * 1.8 + 32.0 AS c_f
    FROM generate_series(1, 100) AS t(x)
    """,
)
def scalar_unit_convert(spark, sf_dir):
    """convert_* unit family: each conversion is one JVM multiply by a
    plan-time factor, so the oracle embeds the SAME Python-computed
    double literal (repr round-trips exactly) — bit-exact by
    construction. Temperature is affine; c_f mirrors the through-
    Kelvin chain term-for-term (the +273.15/−273.15 round trip is
    deliberately NOT simplified away)."""
    from meerkat_spark.functions import scalar as S

    df = spark.range(1, 101).select(F.col("id").alias("x"))
    x = F.col("x")
    return df.select(
        "x",
        S.convert_length(x, "Kilometer", "Mile").alias("km_mi"),
        S.convert_mass(x, "Pound", "Kilogram").alias("lb_kg"),
        S.convert_speed(x, "KilometerPerHour", "MeterPerSecond").alias("kmh_ms"),
        S.convert_energy(x, "KilowattHour", "Joule").alias("kwh_j"),
        S.convert_angle(x, "Degree", "Radian").alias("deg_rad"),
        S.convert_volume(x, "Liter", "UsGallon").alias("l_gal"),
        S.convert_temperature(x, "DegreeFahrenheit", "Kelvin").alias("f_k"),
        S.convert_temperature(x, "DegreeCelsius", "DegreeFahrenheit").alias("c_f"),
    )


@register(
    "scalar_datetime_r5",
    oracle="""
    SELECT event_id,
           date_trunc('quarter', ts) AS soq,
           date_trunc('quarter', ts) + INTERVAL 3 MONTH
             - INTERVAL 1 MICROSECOND AS eoq,
           date_trunc('month', ts) + INTERVAL 1 MONTH AS som_next,
           date_trunc('year', ts) + INTERVAL 24 MONTH
             - INTERVAL 1 MICROSECOND AS eoy_next,
           CAST((year(ts) * 12 + month(ts))
                - (2024 * 12 + 1) AS BIGINT) AS months_since,
           CAST((year(ts) * 4 + quarter(ts)) - (2024 * 4 + 1) AS BIGINT)
             AS quarters_since,
           CAST(year(ts) - 2023 AS BIGINT) AS years_since,
           CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                AS BIGINT) AS days_since
    FROM events WHERE event_id < 1500
    """,
)
def scalar_datetime_r5(spark, sf_dir):
    """r5 datetime semantics: startofquarter/endofquarter, period
    offsets on startofmonth/endofyear, and datetime_diff's calendrical
    boundary-crossing counts (months/quarters/years/days since fixed
    anchors — the oracle differences truncated period indexes the same
    way)."""
    return (
        MeerkatEngine(spark, sf_dir)
        .kql(
            """events | where event_id < 1500
               | project event_id,
                         soq = startofquarter(ts),
                         eoq = endofquarter(ts),
                         som_next = startofmonth(ts, 1),
                         eoy_next = endofyear(ts, 1),
                         months_since = datetime_diff('month', ts,
                                                      datetime(2024-01-15)),
                         quarters_since = datetime_diff('quarter', ts,
                                                        datetime(2024-01-15)),
                         years_since = datetime_diff('year', ts,
                                                     datetime(2023-06-01)),
                         days_since = datetime_diff('day', ts,
                                                    datetime(2024-01-01))"""
        )
        .to_df()
    )


@register(
    "scalar_bag_stats_r6",
    oracle="""
    WITH base AS (
      SELECT event_type, value,
             chr(72 + CAST(event_id % 26 AS INT)) || chr(105) AS s2
      FROM events WHERE event_id < 2000
    )
    SELECT event_type,
           min(s2) AS first_str,
           CAST(2 AS BIGINT) AS nk,
           ROUND(quantile_cont(value, 0.25), 4) AS p25,
           ROUND(quantile_cont(value, 0.75), 4) AS p75,
           MIN(value) AS mn,
           MAX(value) AS mx,
           ROUND(AVG(value), 4) AS av,
           ROUND(STDDEV_SAMP(value), 4) AS sd
    FROM base GROUP BY event_type
    """,
)
def scalar_bag_stats_r6(spark, sf_dir):
    """Round-6 function additions in one oracle-backed query:
    make_string (codepoints → string), bag_keys/bag_pack (key count is
    analytic), percentiles_array (exact interpolated, array form), and
    series_stats_dynamic over a per-group sorted series (sequential
    fold over a SORTED array → deterministic; outputs rounded 4dp per
    the registry determinism rules)."""
    eng = MeerkatEngine(spark, sf_dir)
    return (
        eng.kql(
            """events | where event_id < 2000
               | extend s2 = make_string(pack_array(72 + event_id % 26, 105)),
                        nk = array_length(bag_keys(bag_pack('k', event_id, 'j', value)))
               | summarize first_str = min(s2),
                           nk = take_any(nk),
                           pa = percentiles_array(value, 25, 75),
                           arr = array_sort_asc(make_list(value))
                 by event_type
               | extend st = series_stats_dynamic(arr)
               | project event_type, first_str, nk,
                         p25 = round(todouble(pa[0]), 4),
                         p75 = round(todouble(pa[1]), 4),
                         mn = st.min, mx = st.max,
                         av = round(st.avg, 4),
                         sd = round(st.stdev, 4)"""
        )
        .to_df()
    )


@register(
    "scalar_r7_gap",
    oracle=r"""
    SELECT event_id,
           (event_id % 24) * 3600.0 + (event_id % 60) * 60.0
             + (event_id % 7) AS mts_sec,
           make_timestamp((1546300800000 + event_id) * 1000) AS dt_ms,
           make_timestamp(1546300800123456 + event_id) AS dt_us,
           (event_id % 256 = 0) AS m24,
           TRUE AS m16,
           base64(from_hex(lpad(lower(hex(event_id % 256)), 2, '0')
                           || '4142')) AS b64,
           TRUE AS ut
    FROM events
    """,
)
def scalar_r7_gap(spark, sf_dir):
    """Round-7 scalar gap closure, oracle-backed on the analytically
    reproducible members: make_timespan over columns (seconds-double
    form), unixtime milli/micro todatetime, ipv4_is_match under
    prefixes 16/24 with a constructed ip, base64_encode_fromarray
    (from_hex twin), isutf8. The engine-specific ones (hash_combine
    xxhash64 mix) and bag mutators stay pytest-pinned
    (test_round7_scalar_gap_closure)."""
    eng = MeerkatEngine(spark, sf_dir)
    return eng.kql(
        """events
           | extend oct = toint(event_id % 256)
           | extend ip = strcat('192.168.', tostring(oct), '.7')
           | project event_id,
               mts_sec = make_timespan(event_id % 24, event_id % 60,
                                       event_id % 7),
               dt_ms = unixtime_milliseconds_todatetime(1546300800000
                                                        + event_id),
               dt_us = unixtime_microseconds_todatetime(1546300800123456
                                                        + event_id),
               m24 = ipv4_is_match(ip, '192.168.0.0', 24),
               m16 = ipv4_is_match(ip, '192.168.0.0', 16),
               b64 = base64_encode_fromarray(pack_array(oct, 65, 66)),
               ut = isutf8(ip)"""
    ).to_df()
