"""Catalog / DDL / caching surface — the engine-management operations
a user of a complete analytics engine expects beyond queries: managed
tables (CTAS, INSERT INTO), views, schema introspection, in-memory
caching, and query-attached observability metrics.

The reference has no catalog at all (its only metadata is a directory
listing, sendFileByFile.cpp:422-444); everything here is Spark's
built-in catalog exercised through SQL, asserted on behavior (row
counts, plan shapes), not just absence-of-error.
"""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F


def _tbl(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:8]}"


def test_ctas_insert_describe_drop(spark, sf_dir):
    name = _tbl("mrwc_nation")
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView(
        "nation_ddl_src")
    try:
        spark.sql(f"CREATE TABLE {name} AS SELECT * FROM nation_ddl_src")
        n0 = spark.table(name).count()
        assert n0 == 25

        spark.sql(f"""
            INSERT INTO {name}
            SELECT n_nationkey + 100, concat('copy_', n_name), n_regionkey
            FROM nation_ddl_src WHERE n_nationkey < 5
        """)
        assert spark.table(name).count() == n0 + 5

        cols = {r.col_name for r in spark.sql(f"DESCRIBE TABLE {name}").collect()}
        assert {"n_nationkey", "n_name", "n_regionkey"} <= cols
    finally:
        loc = None
        try:
            desc = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
            loc = next((r.data_type for r in desc if r.col_name == "Location"),
                       None)
        except Exception:
            pass
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        if loc and loc.startswith("file:"):
            shutil.rmtree(loc[5:], ignore_errors=True)


def test_view_and_cache_plan(spark, sf_dir):
    view = _tbl("mrwc_v")
    spark.read.parquet(f"{sf_dir}/region.parquet").createOrReplaceTempView(
        "region_ddl_src")
    try:
        spark.sql(f"""
            CREATE OR REPLACE TEMPORARY VIEW {view} AS
            SELECT r_regionkey, upper(r_name) AS r_name_u FROM region_ddl_src
        """)
        assert spark.table(view).count() == 5

        spark.catalog.cacheTable(view)
        try:
            df = spark.table(view)
            df.count()  # materialize the cache
            plan = df._jdf.queryExecution().optimizedPlan().toString()
            assert "InMemoryRelation" in plan, plan
        finally:
            spark.catalog.uncacheTable(view)
        plan = spark.table(view)._jdf.queryExecution().optimizedPlan().toString()
        assert "InMemoryRelation" not in plan
    finally:
        spark.sql(f"DROP VIEW IF EXISTS {view}")


def test_observe_metrics(spark, sf_dir):
    """df.observe attaches named aggregates that ride the job for free
    (no second scan) — the engine's per-query observability hook."""
    from pyspark.sql import Observation

    obs = Observation("li_metrics")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("total_qty"),
    )
    n = observed.filter(F.col("l_quantity") > 0).count()
    got = obs.get
    assert got["n_rows"] >= n > 0
    assert got["total_qty"] > 0


def test_load_table_missing_file_raises_original(spark):
    """The nanosAsLong retry is reserved for the ns-precision fixture;
    a missing file must surface the ORIGINAL error, not mutate session
    config and fail again confusingly (round-2 advice)."""
    import pytest
    from mapreducewordcounting_spark.catalog import load_table
    before = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    with pytest.raises(Exception) as ei:
        load_table(spark, "/root/testdata/does_not_exist", "events")
    assert "PARQUET_TYPE_ILLEGAL" not in str(ei.value)
    assert spark.conf.get(
        "spark.sql.legacy.parquet.nanosAsLong", "false") == before
