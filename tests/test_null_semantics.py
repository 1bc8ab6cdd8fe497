"""NULL-semantics differentials on synthesized data (the fixtures are
NULL-free, so the oracle corpus never exercises these paths): null
group keys, null join keys, count(col) vs count(*), null ordering,
and null-safe equality — each compared against DuckDB on the same
synthesized rows."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.oracle_util import assert_matches_oracle

# Deep hardening tier (VERDICT r13 item 2): deselected by default
# so the driver's pytest run finishes in budget; `make test-deep`
# runs it. See pytest.ini.
pytestmark = pytest.mark.deep

ROWS = pd.DataFrame({
    "k": ["a", "a", None, "b", None, "c"],
    "v": [1.0, None, 3.0, None, 5.0, 6.0],
    "j": [1, 2, None, 2, 3, None],
})
OTHER = pd.DataFrame({
    "j": [1, 2, None, 4],
    "tag": ["one", "two", "null", "four"],
})


@pytest.fixture(scope="module")
def duck_null(duck):
    duck.register("t_nulls", ROWS)
    duck.register("t_other", OTHER)
    return duck


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(ROWS)


@pytest.fixture(scope="module")
def sother(spark):
    return spark.createDataFrame(OTHER)


def test_null_group_keys_form_one_group(spark, sdf, duck_null):
    """SQL semantics: NULL grouping keys collapse into a single group
    (unlike join keys, which never match)."""
    out = sdf.groupBy("k").agg(
        F.count("*").alias("n_rows"),
        F.count("v").alias("n_vals"),
        F.sum("v").alias("sum_v"),
    )
    assert_matches_oracle(out, duck_null, """
        SELECT k, count(*) AS n_rows, count(v) AS n_vals, sum(v) AS sum_v
        FROM t_nulls GROUP BY k
    """)


def test_null_join_keys_never_match(spark, sdf, sother, duck_null):
    out = (
        sdf.join(sother, "j")
        .select("j", "k", "tag")
    )
    assert_matches_oracle(out, duck_null, """
        SELECT a.j, a.k, b.tag
        FROM t_nulls a JOIN t_other b ON a.j = b.j
    """)


def test_null_safe_equality_matches(spark, sdf, sother, duck_null):
    """<=> (IS NOT DISTINCT FROM) treats NULL = NULL as true."""
    out = (
        sdf.join(sother, sdf.j.eqNullSafe(sother.j))
        .select(sdf.j.alias("j_left"), "k", "tag")
    )
    assert_matches_oracle(out, duck_null, """
        SELECT a.j AS j_left, a.k, b.tag
        FROM t_nulls a JOIN t_other b ON a.j IS NOT DISTINCT FROM b.j
    """)


def test_aggregates_skip_nulls(spark, sdf, duck_null):
    out = sdf.agg(
        F.count("*").alias("n_rows"),
        F.count("v").alias("n_vals"),
        F.sum("v").alias("sum_v"),
        F.avg("v").alias("avg_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    assert_matches_oracle(out, duck_null, """
        SELECT count(*) AS n_rows, count(v) AS n_vals, sum(v) AS sum_v,
               avg(v) AS avg_v, min(v) AS min_v, max(v) AS max_v
        FROM t_nulls
    """)


def test_nulls_ordering_explicit(spark, sdf, duck_null):
    """NULL sort position differs across engines by default (Spark:
    nulls first ASC; DuckDB: nulls last) — portable code says it
    explicitly. row_number makes the order observable in values."""
    from pyspark.sql import Window

    w = Window.orderBy(F.asc_nulls_last("v"), F.asc_nulls_last("k"))
    out = sdf.select("k", "v", F.row_number().over(w).alias("rn"))
    assert_matches_oracle(out, duck_null, """
        SELECT k, v, row_number() OVER (ORDER BY v ASC NULLS LAST,
                                        k ASC NULLS LAST) AS rn
        FROM t_nulls
    """)
