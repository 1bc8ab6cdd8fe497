"""Property-based relational differentials (SURVEY.md §5.2 item 4):
hypothesis generates small random tables (with NULLs and duplicate
keys — the cases the clean fixtures never produce) and the same
join/aggregate/set-op runs on Spark and DuckDB must agree exactly.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.oracle_util import assert_matches_oracle

# Deep hardening tier (VERDICT r13 item 2): deselected by default
# so the driver's pytest run finishes in budget; `make test-deep`
# runs it. See pytest.ini.
pytestmark = pytest.mark.deep

_key = st.one_of(st.none(), st.integers(min_value=0, max_value=5))
_val = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))


def _table(min_size=0, max_size=12):
    return st.lists(st.tuples(_key, _val), min_size=min_size,
                    max_size=max_size)


def _mk(spark, duck, rows, name):
    pdf = pd.DataFrame(rows, columns=["k", "v"]).astype("object")
    # pandas object columns with None → Spark needs explicit types
    sdf = spark.createDataFrame(
        [(int(k) if k is not None else None,
          int(v) if v is not None else None) for k, v in rows] or [(None, None)],
        "k INT, v INT")
    if not rows:
        sdf = sdf.filter(F.lit(False))
    duck.register(name, pdf.astype({"k": "Int64", "v": "Int64"}))
    return sdf


@settings(max_examples=20, deadline=None)
@given(_table())
def test_groupby_agg_matches(spark_h, duck_h, rows):
    sdf = _mk(spark_h, duck_h, rows, "h_t1")
    out = sdf.groupBy("k").agg(
        F.count("*").alias("n"),
        F.count("v").alias("n_v"),
        F.sum("v").alias("sum_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    assert_matches_oracle(out, duck_h, """
        SELECT k, count(*) AS n, count(v) AS n_v,
               CAST(sum(v) AS INT) AS sum_v,
               min(v) AS min_v, max(v) AS max_v
        FROM h_t1 GROUP BY k
    """)


@settings(max_examples=20, deadline=None)
@given(_table(), _table())
def test_inner_join_matches(spark_h, duck_h, rows_a, rows_b):
    a = _mk(spark_h, duck_h, rows_a, "h_a")
    b = _mk(spark_h, duck_h, rows_b, "h_b")
    out = (
        a.join(b.withColumnRenamed("v", "v2"), "k")
        .select("k", "v", "v2")
    )
    assert_matches_oracle(out, duck_h, """
        SELECT a.k, a.v, b.v AS v2
        FROM h_a a JOIN h_b b ON a.k = b.k
    """)


@settings(max_examples=20, deadline=None)
@given(_table(), _table())
def test_setops_match(spark_h, duck_h, rows_a, rows_b):
    a = _mk(spark_h, duck_h, rows_a, "h_sa").select("k")
    b = _mk(spark_h, duck_h, rows_b, "h_sb").select("k")
    assert_matches_oracle(
        a.unionByName(b).distinct(), duck_h,
        "SELECT k FROM h_sa UNION SELECT k FROM h_sb")
    assert_matches_oracle(
        a.intersect(b), duck_h,
        "SELECT k FROM h_sa INTERSECT SELECT k FROM h_sb")
    assert_matches_oracle(
        a.subtract(b), duck_h,
        "SELECT k FROM h_sa EXCEPT SELECT k FROM h_sb")


@settings(max_examples=15, deadline=None)
@given(_table(min_size=1))
def test_window_rank_matches(spark_h, duck_h, rows):
    from pyspark.sql import Window

    sdf = _mk(spark_h, duck_h, rows, "h_w")
    w = Window.partitionBy("k").orderBy(
        F.asc_nulls_last("v"))
    out = sdf.select(
        "k", "v",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )
    assert_matches_oracle(out, duck_h, """
        SELECT k, v,
               rank() OVER (PARTITION BY k ORDER BY v ASC NULLS LAST) AS rnk,
               dense_rank() OVER (PARTITION BY k ORDER BY v ASC NULLS LAST)
                   AS drnk
        FROM h_w
    """)


@pytest.fixture(scope="module")
def duck_h(duck):
    return duck
