"""TPC-H-shaped analytical queries over the star schema — the classic
multi-join decision-support patterns (beyond the per-operator queries
in relational.py, these exercise operator *composition*: selective
filters + multi-way joins + aggregation + top-k in one plan, the shape
Catalyst's join reordering and AQE exist for).

Q1's pricing summary is already ``agg_suite``; Q5's regional revenue is
``join_star_schema``. Here: Q3 (shipping priority), Q10 (returned
items), and a Q18-shaped large-order detection with a HAVING subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.functions.numeric import dsum, net_price
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
