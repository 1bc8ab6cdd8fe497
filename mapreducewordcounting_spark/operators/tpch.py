"""TPC-H-shaped analytical queries over the star schema — the classic
multi-join decision-support patterns (beyond the per-operator queries
in relational.py, these exercise operator *composition*: selective
filters + multi-way joins + aggregation + top-k in one plan, the shape
Catalyst's join reordering and AQE exist for).

Q1's pricing summary is already ``agg_suite``; Q5's regional revenue is
``join_star_schema``. Here: Q3 (shipping priority), Q10 (returned
items), a Q18-shaped large-order detection with a HAVING subquery, and
the subquery/predicate-shape tranche — Q4 (correlated EXISTS), Q6
(fully-pushed filter aggregate), Q14 (conditional aggregation), Q15
(scalar subquery over an aggregated view), Q16 (NOT IN + count
distinct), Q19 (disjunctive multi-column predicates), Q22 (NOT EXISTS
anti-join + uncorrelated scalar average) — adapted where the fixture
schema lacks a TPC-H column (no l_commitdate/l_receiptdate/c_phone/
partsupp; substitutions noted per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.functions.numeric import dsum, money, net_price
from mapreducewordcounting_spark.registry import register

_SQL_NET = ("(CAST(l_extendedprice AS DECIMAL(18,2)) * "
            "(CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))))")


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
        SELECT l.l_orderkey,
               CAST(sum({_SQL_NET}) AS DOUBLE) AS revenue,
               CAST(o.o_orderdate AS DATE) AS orderdate
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15'
          AND l.l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: unshipped high-value BUILDING orders. Both date filters push
    below the joins; customer broadcasts; one shuffle join on
    orderkey; top-10 via TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("orderdate"))
        .agg(dsum(net_price()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate")
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
        SELECT c.c_custkey,
               c.c_name,
               CAST(sum({_SQL_NET}) AS DOUBLE) AS revenue,
               n.n_name AS nation
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1998-01-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: customers who returned the most value. Returnflag filter
    prunes lineitem at the scan; dims broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(dsum(net_price()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "nation")
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
        SELECT o.o_orderkey,
               o.o_custkey,
               sum(l.l_quantity) AS total_qty
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(l_quantity) > 250
        )
        GROUP BY o.o_orderkey, o.o_custkey
    """,
    tags=("tpch", "join", "subquery", "having"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: large-volume orders via an IN-aggregate subquery (HAVING).
    The inner aggregate produces a small key set → left-semi join
    against orders; the quantities aggregate once more with the
    customer attached."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "leftsemi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
          AND o.o_orderdate < TIMESTAMP '1997-10-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o.o_orderpriority
    """,
    tags=("tpch", "subquery", "exists"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: orders per priority with a late line (correlated EXISTS).
    Fixture lacks l_commitdate/l_receiptdate, so 'late' is
    l_shipdate > o_orderdate. The EXISTS compiles to a left-semi join
    whose condition spans both tables; the quarter filter prunes orders
    at the scan, so the semi-join probe side is small."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey)
               & (li.l_shipdate > o.o_orderdate), "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("tpch", "filter", "agg"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: revenue increase forecast — the canonical fully-pushed-down
    scan: every predicate reaches the parquet reader (PushedFilters on
    l_shipdate/l_discount/l_quantity), no join, no shuffle beyond the
    single-row final agg. At 100 TB this is the query shape where
    row-group min/max statistics skip most of the table."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(dsum(money("l_extendedprice") * money("l_discount")).alias("revenue"),
             F.count("*").alias("n_lines"))
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
        SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
                             THEN {_SQL_NET} ELSE CAST(0 AS DECIMAL(18,2)) END)
                    AS DOUBLE) * 100.0
               / CAST(sum({_SQL_NET}) AS DOUBLE) AS promo_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
          AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
    tags=("tpch", "join", "conditional-agg"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: share of revenue from promo parts — conditional aggregation
    (CASE inside SUM). part broadcasts; the month filter prunes
    lineitem at the scan. Exact-decimal sums on both sides of the
    division keep the ratio bit-identical to the oracle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp")))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", net_price()).otherwise(
        F.lit("0").cast("decimal(18,2)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg((dsum(promo) * 100.0 / dsum(net_price())).alias("promo_pct"))
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
        WITH rev AS (
            SELECT l_suppkey, CAST(sum({_SQL_NET}) AS DOUBLE) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name, r.total_rev
        FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
        WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
    tags=("tpch", "subquery", "scalar"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with max quarterly revenue — an uncorrelated
    scalar subquery over an aggregated view. The revenue view computes
    once (exact decimal, so the max comparison is ulp-safe); its
    single-row max broadcasts back as a crossJoin filter rather than
    re-aggregating the view twice."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    rev = (li.groupBy("l_suppkey")
           .agg(dsum(net_price()).alias("total_rev")))
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top), rev.total_rev == F.col("max_rev"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_size IN (1, 9, 17, 25, 33, 41, 49)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("tpch", "subquery", "not-in", "distinct"),
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: supplier diversity per part group, excluding flagged
    suppliers — NOT IN over a non-nullable key compiles to a left-anti
    join (broadcast: the exclusion list is tiny). Fixture lacks
    s_comment, so 'complaints' is s_acctbal < 0. count(DISTINCT)
    shuffles once on the group keys with partial distinct upstream."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 17, 25, 33, 41, 49))
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "leftanti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
        SELECT CAST(sum({_SQL_NET}) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 21)
           OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity BETWEEN 20 AND 40)
    """,
    tags=("tpch", "join", "disjunction"),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: discounted revenue over three disjunctive brand/size/qty
    bands. Catalyst extracts the common join key (partkey) and keeps
    the OR-of-ANDs as a post-join filter; the per-table residuals
    (p_brand IN (..), ranges) are inferred and pushed to each scan, so
    the broadcast build side only holds the three bands' parts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    band = (
        ((F.col("p_brand") == "Brand#1")
         & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#7")
           & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#20")
           & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 40)))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(band)
        .agg(dsum(net_price()).alias("revenue"), F.count("*").alias("n_lines"))
    )


@register(
    "tpch_q22_dormant_customers",
    oracle="""
        SELECT c.c_nationkey,
               count(*) AS numcust,
               CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (
                SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                       / count(*)
                FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
        GROUP BY c.c_nationkey
    """,
    tags=("tpch", "subquery", "not-exists", "anti"),
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: well-funded customers with no urgent orders, per nation —
    NOT EXISTS (left-anti join) plus an uncorrelated scalar average.
    Fixture lacks c_phone, so the country grouping is c_nationkey and
    'dormant' means no '1-URGENT' order. The threshold is an
    exact-decimal sum divided by count (identical double in Spark and
    DuckDB, so boundary membership is deterministic); it broadcasts as
    a single-row crossJoin. At scale the anti-join probe side is the
    filtered customer set, the build side just urgent order custkeys."""
    c = load_table(spark, sf_dir, "customer")
    thr = (c.filter(F.col("c_acctbal") > 0)
           .agg((F.sum(money("c_acctbal")).cast("double")
                 / F.count("*")).alias("thr")))
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(urgent, F.col("c_custkey") == urgent.o_custkey, "leftanti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"),
             F.sum(money("c_acctbal")).cast("double").alias("totacctbal"))
    )
