"""Bucketed-table joins must be exchange-free (SURVEY.md §4.2 hash
partitioning row: the persisted-layout answer to repeated shuffles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.plans import n_exchanges, simple_plan
from mapreducewordcounting_spark.sources import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "orders_b", "o_orderkey", 8)
    write_bucketed(li, "lineitem_b", "l_orderkey", 8)
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    o = spark.table(ot)
    li = spark.table(lt)
    # hint forces SMJ (the fixture dims are small enough to broadcast,
    # which would hide the bucketed-exchange elision being tested)
    joined = (
        o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("total_qty"))
    )
    plan = simple_plan(joined)
    # the join itself must not exchange either side (only the final
    # small aggregation shuffles)
    assert "SortMergeJoin" in plan
    assert n_exchanges(joined) <= 1, plan

    # and the result equals the plain-table join
    o2 = load_table(spark, sf_dir, "orders")
    li2 = load_table(spark, sf_dir, "lineitem")
    expected = sorted(
        tuple(r) for r in o2.join(li2, o2.o_orderkey == li2.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("total_qty")).collect())
    got = sorted(tuple(r) for r in joined.collect())
    assert got == expected
