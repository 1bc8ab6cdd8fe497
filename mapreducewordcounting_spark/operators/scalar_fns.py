"""Scalar function suite (SURVEY.md §2.2 — M2).

The reference's entire scalar surface is three string ops — tokenize
(sendFileByFile.cpp:82-88), char-class truncation (:89-91), lowercase
(:93) — and integer add (:179). This module exposes the full scalar
surface the north star needs: string, date/time, math, array, map,
JSON, and conditional expressions, all built-in ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen'd — no Python in the hot path at any
scale).

Oracle parity notes:
- regex restricted to simple char classes (Spark/DuckDB dialects agree);
- ``sqrt`` is IEEE-correctly-rounded (bit-identical across engines);
  ``ln`` is not guaranteed, so it is rounded to 6 digits on both sides;
- timestamps come from µs/ns parquet: only second-or-coarser
  derivations are oracle-checked (SURVEY.md §7.3 item 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.registry import register


@register(
    "fn_string",
    oracle="""
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               length(p_name) AS name_len,
               substring(p_name, 1, 5) AS name_prefix,
               concat(p_brand, ':', p_type) AS brand_type,
               trim(p_type) AS type_trim,
               replace(p_name, ' ', '_') AS name_snake,
               regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
               CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS has_red,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
        FROM part
    """,
    tags=("scalar", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String expression surface — all codegen'd, no UDF."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.trim("p_type").alias("type_trim"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.when(F.col("p_name").like("%red%"), 1).otherwise(0).alias("has_red"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@register(
    "fn_date",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate) AS order_year,
               month(o_orderdate) AS order_month,
               day(o_orderdate) AS order_day,
               quarter(o_orderdate) AS order_quarter,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
                   AS days_to_2002,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_ts
        FROM orders
        WHERE year(o_orderdate) >= 1998
    """,
    tags=("scalar", "date"),
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time derivations over orders (the temporal type the
    reference lacks entirely, SURVEY.md §1.2)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.year("o_orderdate") >= 1998)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.quarter("o_orderdate").alias("order_quarter"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
            F.datediff(F.lit("2002-01-01").cast("date"),
                       F.col("o_orderdate").cast("date")).alias("days_to_2002"),
            (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 30 DAY"))
            .alias("due_ts"),
        )
    )


@register(
    "fn_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_quantity - 25) AS qty_dev,
               sqrt(l_quantity) AS qty_sqrt,
               round(ln(l_extendedprice), 6) AS price_ln,
               CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
               CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
               CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
               CASE WHEN l_discount > 0 THEN 1 WHEN l_discount = 0 THEN 0
                    ELSE -1 END AS disc_sign,
               greatest(l_discount, l_tax) AS max_rate,
               least(l_discount, l_tax) AS min_rate
        FROM lineitem
        WHERE l_linenumber <= 2
    """,
    tags=("scalar", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface. sqrt is IEEE-exact everywhere; ln is rounded to 6
    digits because libm implementations may differ in the last ulp."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_linenumber") <= 2)
        .select(
            "l_orderkey", "l_linenumber",
            F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
            F.sqrt("l_quantity").alias("qty_sqrt"),
            F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
            F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
            F.floor(F.col("l_tax") * 100).alias("tax_pct_floor"),
            (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
            F.when(F.col("l_discount") > 0, 1)
            .when(F.col("l_discount") == 0, 0)
            .otherwise(-1).alias("disc_sign"),
            F.greatest("l_discount", "l_tax").alias("max_rate"),
            F.least("l_discount", "l_tax").alias("min_rate"),
        )
    )


@register(
    "fn_conditional",
    oracle="""
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                    WHEN c_acctbal < 1000 THEN 'low'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    ELSE 'high' END AS bal_band,
               coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS segment_renamed,
               (c_nationkey IN (1, 3, 5)) AS in_odd_nation
        FROM customer
    """,
    tags=("scalar", "conditional"),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/coalesce/nullif/IN — the boolean & branching surface."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high").alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")),
                   F.lit("CAR")).alias("segment_renamed"),
        F.col("c_nationkey").isin(1, 3, 5).alias("in_odd_nation"),
    )


@register(
    "fn_array",
    oracle="""
        SELECT vec_id,
               len(embedding) AS n_dims,
               embedding[1] AS first_val,
               list_max(embedding) AS max_val,
               list_min(embedding) AS min_val,
               len(list_filter(embedding, x -> x > 0)) AS n_positive,
               len(embedding[1:3]) AS head3_len,
               embedding[1:3][1] AS head3_1,
               embedding[1:3][2] AS head3_2,
               embedding[1:3][3] AS head3_3
        FROM embeddings
    """,
    tags=("scalar", "array"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array (higher-order) functions over the embedding column — the
    basis of the similarity operators (SURVEY.md §2.3). float32 values
    widen exactly to double in both engines, so no rounding is needed
    for element access / min / max. The slice is pinned by LENGTH plus
    every element as scalar double columns (not as an array column —
    the driver's canonicalizer can't hash list-typed result columns,
    round-1 CORRECTNESS err; and not string-joined — double→string
    formatting differs between engines while the doubles themselves
    hash exactly). A slice bug returning wrong length or extra/altered
    elements now fails the hash (round-2 ADVICE)."""
    e = load_table(spark, sf_dir, "embeddings")
    head3 = F.slice("embedding", 1, 3)
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.element_at("embedding", 1).alias("first_val"),
        F.array_max("embedding").alias("max_val"),
        F.array_min("embedding").alias("min_val"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.size(head3).alias("head3_len"),
        F.element_at(head3, 1).alias("head3_1"),
        F.element_at(head3, 2).alias("head3_2"),
        F.element_at(head3, 3).alias("head3_3"),
    )


@register(
    "fn_map",
    # The oracle states the expected *values* relationally; the Spark
    # side routes them through map construction + extraction, proving
    # the map fns compute the right thing without relying on DuckDB's
    # MAP type hashing the same way.
    oracle="""
        SELECT p_partkey,
               p_size AS size_from_map,
               CAST(p_retailprice AS DOUBLE) AS price_from_map,
               2 AS n_keys
        FROM part
    """,
    tags=("scalar", "map"),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map type surface: map_from_arrays → element_at / map_keys."""
    p = load_table(spark, sf_dir, "part")
    m = F.map_from_arrays(
        F.array(F.lit("size"), F.lit("price")),
        F.array(F.col("p_size").cast("double"), F.col("p_retailprice")),
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "size").cast("int").alias("size_from_map"),
        F.element_at(m, "price").alias("price_from_map"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "fn_json",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
               (json_extract_string(props, '$.k') IS NOT NULL) AS has_k
        FROM events
        WHERE event_type = 'purchase'
    """,
    tags=("scalar", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (a JSON string column):
    get_json_object for ad-hoc paths, from_json for typed access."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            parsed.getField("k").alias("k_int"),
            F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
        )
    )


@register(
    "fn_time_events",
    oracle="""
        SELECT event_id,
               CAST(date_trunc('hour', ts) AS DATE) AS event_date,
               hour(ts) AS event_hour,
               minute(ts) AS event_minute,
               CAST(extract(epoch FROM date_trunc('second', ts)) AS BIGINT)
                   AS epoch_s
        FROM events
        WHERE event_type = 'error'
    """,
    tags=("scalar", "date", "events"),
)
def fn_time_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-or-coarser time derivations over the ns-precision events
    table (finer than µs is not oracle-comparable — SURVEY.md §7.3)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "error")
        .select(
            "event_id",
            F.date_trunc("hour", "ts").cast("date").alias("event_date"),
            F.hour("ts").alias("event_hour"),
            F.minute("ts").alias("event_minute"),
            F.unix_timestamp(F.date_trunc("second", "ts")).alias("epoch_s"),
        )
    )


@register(
    "fn_array_ops",
    oracle="""
        SELECT a.vec_id,
               len(list_intersect(a.embedding[1:8], b.embedding[1:8]))
                   AS n_common,
               len(flatten([a.embedding[1:3], b.embedding[1:3]])) AS n_flat,
               list_reverse(list_sort(a.embedding[1:4]))[1] AS max_of_head3,
               list_contains(a.embedding, a.embedding[1]) AS has_first
        FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id < 50
    """,
    tags=("scalar", "array"),
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second array-function tranche: set ops on arrays
    (array_intersect), flatten, sort/reverse, membership."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id"), F.col("embedding").alias("ea"))
    b = e.select((F.col("vec_id") - 1).alias("vec_id"),
                 F.col("embedding").alias("eb"))
    return (
        a.join(b, "vec_id")
        .filter(F.col("vec_id") < 50)
        .select(
            "vec_id",
            F.size(F.array_intersect(F.slice("ea", 1, 8), F.slice("eb", 1, 8)))
            .alias("n_common"),
            F.size(F.flatten(F.array(F.slice("ea", 1, 3), F.slice("eb", 1, 3))))
            .alias("n_flat"),
            F.element_at(F.reverse(F.array_sort(F.slice("ea", 1, 4))), 1)
            .alias("max_of_head3"),
            F.array_contains("ea", F.element_at("ea", 1)).alias("has_first"),
        )
    )


@register(
    "fn_date_arith",
    oracle="""
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                   AS plus_3m,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               weekofyear(o_orderdate) AS iso_week,
               dayofyear(o_orderdate) AS doy,
               (year(o_orderdate) % 4 = 0 AND (year(o_orderdate) % 100 <> 0
                    OR year(o_orderdate) % 400 = 0)) AS in_leap_year
        FROM orders
        WHERE o_orderkey < 2000
    """,
    tags=("scalar", "date"),
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic tranche: add_months, last_day, ISO week,
    day-of-year, leap-year predicate."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate").cast("date")
    y = F.year("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus_3m"),
        F.last_day(d).alias("month_end"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.dayofyear("o_orderdate").alias("doy"),
        ((y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0)))
        .alias("in_leap_year"),
    )


@register(
    "fn_regex",
    oracle="""
        SELECT doc_id,
               regexp_matches(text, 'scan .* join') AS mentions_scan_join,
               len(regexp_extract_all(text, '[a-z]+ing')) AS n_ing_words,
               regexp_extract(text, '([a-z]+) (scan)', 1) AS word_before_scan,
               regexp_replace(text, '^the ', 'THE ') AS emphasized
        FROM documents
        WHERE doc_id < 200
    """,
    tags=("scalar", "regex"),
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex tranche: rlike, extract-all counting, group extraction,
    anchored replace (dialect kept to the Spark/DuckDB common subset)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.col("text").rlike("scan .* join").alias("mentions_scan_join"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+ing"), 0))
        .alias("n_ing_words"),
        F.regexp_extract("text", "([a-z]+) (scan)", 1).alias("word_before_scan"),
        F.regexp_replace("text", "^the ", "THE ").alias("emphasized"),
    )


@register(
    "fn_trig",
    oracle="""
        SELECT s_suppkey,
               round(sin(s_acctbal / 1000.0), 6) + 0.0 AS sin_v,
               round(cos(s_acctbal / 1000.0), 6) + 0.0 AS cos_v,
               round(atan2(s_acctbal, 1000.0), 6) + 0.0 AS angle,
               round(degrees(atan2(s_acctbal, 1000.0)), 6) + 0.0 AS angle_deg,
               round(exp(s_acctbal / 10000.0), 6) AS exp_v,
               round(cbrt(abs(s_acctbal)), 6) AS cbrt_v,
               CAST(sign(s_acctbal) AS BIGINT) AS bal_sign
        FROM supplier
    """,
    tags=("scalar", "math", "trig"),
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric / transcendental surface (sin, cos, atan2,
    degrees, exp, cbrt, sign) — all rounded to 6 digits since libm
    implementations are ulp-reproducible, not bit-reproducible, across
    engines (the fn_math ln contract). Pure codegen, zero shuffle."""
    s = load_table(spark, sf_dir, "supplier")
    x = F.col("s_acctbal") / 1000.0
    return s.select(
        "s_suppkey",
        (F.round(F.sin(x), 6) + 0.0).alias("sin_v"),
        (F.round(F.cos(x), 6) + 0.0).alias("cos_v"),
        (F.round(F.atan2(F.col("s_acctbal"), F.lit(1000.0)), 6) + 0.0)
        .alias("angle"),
        (F.round(F.degrees(F.atan2(F.col("s_acctbal"), F.lit(1000.0))), 6) + 0.0)
        .alias("angle_deg"),
        F.round(F.exp(F.col("s_acctbal") / 10000.0), 6).alias("exp_v"),
        F.round(F.cbrt(F.abs("s_acctbal")), 6).alias("cbrt_v"),
        F.signum("s_acctbal").cast("long").alias("bal_sign"),
    )


@register(
    "fn_binary_base64",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               base64(encode(text)) AS b64,
               length(base64(encode(text))) AS b64_len,
               CAST(('0x' || substr(hex(encode(text)), 1, 2)) AS INT)
                   AS first_byte
        FROM documents
        WHERE doc_id < 50
    """,
    tags=("scalar", "binary", "multimodal"),
)
def fn_binary_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec surface — the byte-level primitives under the
    multimodal column family (operators/multimodal.py stores payloads
    as binary): utf-8 encode, octet_length, base64 (the wire encoding
    for binary-in-JSON interchange), and byte indexing. unbase64∘base64
    identity is pinned by re-deriving n_bytes from the decoded copy."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    bin_ = F.encode("text", "utf-8")
    # Spark's base64 is MIME (RFC 2045): CRLF-wrapped at 76 chars;
    # DuckDB's is unwrapped RFC 4648. Strip the soft wraps so both
    # engines speak the same canonical form (unbase64 accepts either).
    b64 = F.replace(F.base64(bin_), F.lit("\r\n"), F.lit(""))
    return docs.select(
        "doc_id",
        F.octet_length(F.unbase64(F.base64(bin_))).alias("n_bytes"),
        b64.alias("b64"),
        F.length(b64).alias("b64_len"),
        F.conv(F.substring(F.hex(bin_), 1, 2), 16, 10).cast("int")
        .alias("first_byte"),
    )
