"""Round-3 function-surface fillers: struct type algebra, array set
operations, presentation-layer string formatting, calendar arithmetic
beyond add_months, and discrete percentiles.

The reference has none of this surface (its only scalar repertoire is
tolower + a char-class strip, sendFileByFile.cpp:89-93); these close
the last gaps in SURVEY.md §2.2's string/date/math/array rows. Every
query here is a pure map-stage projection or a single partial+final
aggregate — no join, at most one exchange — so each is trivially
100 TB-safe; the interesting content is exact cross-engine semantics,
pinned per function in the oracle:

- struct MAX/MIN is *lexicographic by field order* in both Spark and
  DuckDB — the argmax-without-a-join primitive.
- Spark's array_union/except are order-preserving and multiset-
  collapsing; sorting + joining makes the oracle order-insensitive
  while still pinning the element multiset.
- format_number groups thousands with HALF_EVEN decimal rounding;
  DuckDB's float formatter refuses thousand separators, so the twin
  splits integer/cent parts explicitly.
- next_day returns the first strictly-later weekday; months_between
  uses the 31-day-month fraction rule unless both operands are
  month-ends or share a day-of-month (Spark's documented semantics,
  reproduced arithmetically in the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.registry import register


@register(
    "fn_struct",
    oracle="""
        SELECT o_custkey,
               max(struct_pack(tp := o_totalprice, ok := o_orderkey)).tp AS best_tp,
               max(struct_pack(tp := o_totalprice, ok := o_orderkey)).ok AS best_ok,
               CAST(extract(epoch FROM date_trunc('second',
                   min(struct_pack(od := o_orderdate, ok := o_orderkey)).od))
                   AS BIGINT) AS first_od_s,
               min(struct_pack(od := o_orderdate, ok := o_orderkey)).ok AS first_ok,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_custkey
    """,
    tags=("fn", "struct", "agg"),
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-typed aggregation: ``max(struct(price, key))`` is the
    shuffle-free argmax idiom — one partial+final HashAggregate whose
    state is a single 16-byte struct per group, vs the groupBy+self-join
    formulation that shuffles the fact table twice. Lexicographic
    struct comparison (field order = priority order) is identical in
    Spark and DuckDB, which the oracle pins by extracting both fields
    of the max/min structs."""
    o = load_table(spark, sf_dir, "orders")
    best = F.max(F.struct(F.col("o_totalprice").alias("tp"),
                          F.col("o_orderkey").alias("ok"))).alias("best")
    first = F.min(F.struct(F.col("o_orderdate").alias("od"),
                           F.col("o_orderkey").alias("ok"))).alias("first")
    return (
        o.groupBy("o_custkey")
        .agg(best, first, F.count("*").alias("n_orders"))
        .select(
            "o_custkey",
            F.col("best.tp").alias("best_tp"),
            F.col("best.ok").alias("best_ok"),
            F.unix_timestamp(F.date_trunc("second", F.col("first.od")))
            .alias("first_od_s"),
            F.col("first.ok").alias("first_ok"),
            "n_orders",
        )
    )


@register(
    "fn_array_setops",
    oracle="""
        SELECT p_partkey,
               array_to_string(list_sort(list_distinct(
                   list_cat([p_size, p_size + 1, 5], [5, p_size]))), ',') AS un,
               array_to_string(list_sort(list_distinct(list_filter(
                   [p_size, p_size + 1, 5], x -> x != 5))), ',') AS ex,
               list_has_any([p_size], [5, 6]) AS ov
        FROM part
    """,
    tags=("fn", "array", "setops"),
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (union / except / overlap) on per-row arrays
    built from part attributes. Spark's array_union/array_except are
    order-preserving set collapses; the outputs are sorted and joined
    to a string so the oracle compares the element *set* without
    depending on either engine's preservation order. Pure projection:
    zero shuffle, codegen'd end to end."""
    p = load_table(spark, sf_dir, "part")
    a = F.array(F.col("p_size"), F.col("p_size") + 1, F.lit(5))
    b = F.array(F.lit(5), F.col("p_size"))
    return p.select(
        "p_partkey",
        F.array_join(F.array_sort(F.array_union(a, b)), ",").alias("un"),
        F.array_join(F.array_sort(F.array_except(a, F.array(F.lit(5)))), ",")
         .alias("ex"),
        F.arrays_overlap(F.array(F.col("p_size")),
                         F.array(F.lit(5), F.lit(6))).alias("ov"),
    )


@register(
    "fn_string_format",
    oracle="""
        SELECT p_partkey,
               list_reduce(list_transform(string_split(p_name, ' '),
                   t -> CASE WHEN length(t) = 0 THEN t
                        ELSE upper(t[1]) || lower(t[2:]) END),
                   (a, b) -> a || ' ' || b) AS name_title,
               substr(p_name, 1, 2) || 'XX' || substr(p_name, 5) AS ov_insert,
               substr(p_name, 1, 1) || 'YY' || substr(p_name, 7) AS ov_replace,
               format('{:,}', CAST(floor(p_retailprice) AS BIGINT)) || '.' ||
               lpad(CAST(CAST(p_retailprice * 100 AS BIGINT) % 100 AS VARCHAR),
                    2, '0') AS price_pretty
        FROM part
    """,
    tags=("fn", "string", "format"),
)
def fn_string_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presentation-layer string functions: initcap (title-case per
    whitespace word — DuckDB lacks it, so the twin rebuilds it from
    split/upper/lower), overlay in both replace-width forms, and
    format_number's thousands grouping (DuckDB's float formatter
    rejects ',' so the twin formats the integer part and cents
    separately; fixture prices are exact cents, so no rounding-mode
    divergence can surface). All map-stage projections."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.initcap("p_name").alias("name_title"),
        F.overlay(F.col("p_name"), F.lit("XX"), 3).alias("ov_insert"),
        F.overlay(F.col("p_name"), F.lit("YY"), 2, 5).alias("ov_replace"),
        F.format_number(F.col("p_retailprice"), 2).alias("price_pretty"),
    )


@register(
    "fn_datetime_extras",
    oracle="""
        SELECT o_orderkey,
               make_date(year(o_orderdate), month(o_orderdate), 1) AS month_start,
               CAST(o_orderdate + INTERVAL 1 DAY *
                    ((7 - (dayofweek(o_orderdate) + 6) % 7) % 7 +
                     CASE WHEN (dayofweek(o_orderdate) + 6) % 7 = 0
                          THEN 7 ELSE 0 END) AS DATE) AS next_monday,
               round((12 * (1998 - year(o_orderdate)) + (12 - month(o_orderdate)))
                     + CASE WHEN day(o_orderdate) = 1 THEN 0
                            ELSE (1 - day(o_orderdate)) / 31.0 END,
                     4) AS months_to_ref
        FROM orders
    """,
    tags=("fn", "date"),
)
def fn_datetime_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic past add_months/date_trunc: make_date from
    components, next_day (first strictly-later Monday — the oracle
    derives it from day-of-week modular arithmetic), and
    months_between against a fixed reference date (whole months plus a
    days/31 fraction unless the day-of-month matches — Spark's
    documented rule, reproduced arithmetically; the reference date is
    a month-start so the both-month-ends branch cannot fire). Zero
    shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"),
                    F.lit(1)).alias("month_start"),
        F.next_day("o_orderdate", "Mon").alias("next_monday"),
        F.round(F.months_between(F.lit("1998-12-01"), F.col("o_orderdate")),
                4).alias("months_to_ref"),
    )


@register(
    "agg_percentile_disc",
    oracle="""
        SELECT l_returnflag,
               quantile_disc(l_extendedprice, 0.5) AS p50,
               quantile_disc(l_extendedprice, 0.9) AS p90,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (WITHIN GROUP ORDER BY): unlike the
    interpolating percentile in agg_percentiles, percentile_disc
    returns an actual data value (the first element at-or-past the
    cumulative fraction), so results are exact across engines with no
    float-interpolation rounding concerns. Exact percentiles require
    the group's values together (one shuffle on the 3 flag groups); at
    100 TB the same query shape swaps to approx_percentile's
    mergeable sketch — that path is agg_percentiles'."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")
         .alias("p50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)")
         .alias("p90"),
        F.count("*").alias("n"),
    )


@register(
    "fn_csv_codec",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderkey AS VARCHAR) || ',' || o_orderpriority || ','
                   || o_orderstatus AS line,
               o_orderkey AS key_rt,
               o_orderpriority AS pri_rt,
               o_orderstatus AS st_rt
        FROM orders
    """,
    tags=("fn", "csv", "codec"),
)
def fn_csv_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-row CSV codec: ``to_csv(struct(...))`` renders each row to a
    CSV line, ``from_csv`` parses it back against an explicit schema —
    the scalar-function form of the CSV source/sink (source_csv_*),
    used when CSV lives INSIDE a column (log payloads, export blobs)
    rather than in files. The oracle rebuilds the line from string
    concatenation and asserts the round-trip restores every field.
    Columns here are ints/enum-strings with no quoting edge cases —
    quoting/permissive-mode behavior is the file-level
    source_csv_permissive's concern."""
    o = load_table(spark, sf_dir, "orders")
    line = F.to_csv(F.struct(
        F.col("o_orderkey").cast("bigint").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
    ))
    parsed = F.from_csv(line, "k BIGINT, pri STRING, st STRING")
    return o.select(
        "o_orderkey",
        line.alias("line"),
        parsed.getField("k").alias("key_rt"),
        parsed.getField("pri").alias("pri_rt"),
        parsed.getField("st").alias("st_rt"),
    )


@register(
    "fn_na_clean",
    oracle="""
        WITH dirty AS (
            SELECT c_custkey,
                   nullif(c_mktsegment, 'BUILDING') AS seg,
                   CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
            FROM customer)
        SELECT c_custkey,
               CASE coalesce(seg, 'unknown')
                    WHEN 'AUTOMOBILE' THEN 'auto'
                    ELSE coalesce(seg, 'unknown') END AS seg_clean,
               coalesce(bal, 0.0) AS bal_clean,
               seg IS NULL AS was_seg_null,
               bal IS NULL AS was_bal_null,
               (SELECT count(*) FROM dirty
                WHERE seg IS NOT NULL AND bal IS NOT NULL) AS n_complete
        FROM dirty
    """,
    tags=("fn", "null", "na"),
)
def fn_na_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataFrameNaFunctions surface — na.fill / na.replace /
    na.drop — over deterministically manufactured nulls (the fixtures
    are null-free, so nullif/CASE inject them first; SURVEY.md §2.2's
    null-semantics row is otherwise covered by test_null_semantics).
    All three compile to plain projections/filters (Catalyst rewrites
    fill→coalesce, replace→CASE, drop→IsNotNull filter — nothing
    engine-side is 'special' about NA handling, which is the point:
    it rides every pushdown/codegen path ordinary expressions do).
    The na.drop arm is carried as a 1-row broadcast count joined onto
    every row (the layout_zorder bounds pattern)."""
    c = load_table(spark, sf_dir, "customer")
    dirty = c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double"))
         .otherwise(F.col("c_acctbal")).alias("bal"),
    )
    cleaned = (
        dirty
        .withColumn("was_seg_null", F.col("seg").isNull())
        .withColumn("was_bal_null", F.col("bal").isNull())
        .na.fill({"seg": "unknown", "bal": 0.0})
        .na.replace("AUTOMOBILE", "auto", subset=["seg"])
        .withColumnRenamed("seg", "seg_clean")
        .withColumnRenamed("bal", "bal_clean")
    )
    n_complete = dirty.na.drop(how="any").agg(
        F.count("*").alias("n_complete"))
    return cleaned.crossJoin(F.broadcast(n_complete)).select(
        "c_custkey", "seg_clean", "bal_clean",
        "was_seg_null", "was_bal_null", "n_complete",
    )
