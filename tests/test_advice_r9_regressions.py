"""Regression gate for the four ADVICE r9 latent-divergence findings.

Each was an engine-portability hazard the standard fixtures never
exercise (no NULL event values, no all-constant stratum, no uniform
draw landing in the DECIMAL-vs-DOUBLE threshold gap). These tests
rebuild exactly the pathological inputs the advisor described and
require the oracle differential to STILL match:

1. ``sample_poisson_det`` — Spark parsed ``1.0/6`` as DECIMAL(7,6)
   while DuckDB promoted to DOUBLE, shifting cumulative thresholds by
   ~2.5e-7. Fixed by inlining repr'd double literals; the test pins
   bit-equality of every threshold across Spark, DuckDB and Python.
2. ``window_ewma_smooth`` — Spark ``collect_list`` drops NULLs,
   DuckDB ``list()`` keeps them. Fixed by a symmetric IS NOT NULL.
3. ``dq_ks_two_sample`` — Spark ASC sorts NULLs first, DuckDB last.
   Fixed by a symmetric filter (ADVICE r10 then dropped the
   belt-and-braces ``asc_nulls_last``: with the symmetric isNotNull
   upstream it was dead code whose stated contract the oracle never
   mirrored).
4. ``sample_stratified_neyman`` — variance cancellation on an
   all-constant stratum can round to a tiny negative: Spark sqrt →
   NaN, DuckDB sqrt → error. Fixed by ``greatest(var, 0)`` both sides.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

from mapreducewordcounting_spark.operators.training_ops import (
    _POIS_THRESHOLDS,
    _double_lit,
)
from mapreducewordcounting_spark.registry import all_queries

from tests.conftest import SF_DIR
from tests.oracle_util import assert_matches_oracle

_SPECS = all_queries()
_ALL_TABLES = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "documents", "embeddings"]


def test_poisson_thresholds_bit_equal_across_engines(spark):
    """Every inverse-CDF threshold literal parses to the bit-identical
    double in Spark, DuckDB and Python (the ADVICE r9 defect was a
    2.5e-7 gap at k<=4 between Spark DECIMAL and DuckDB DOUBLE)."""
    exprs = ", ".join(f"{_double_lit(t)} AS t{k}"
                      for k, t in enumerate(_POIS_THRESHOLDS))
    srow = spark.sql(f"SELECT {exprs}").collect()[0]
    drow = duckdb.sql(f"SELECT {exprs}").fetchone()
    for k, t in enumerate(_POIS_THRESHOLDS):
        assert isinstance(srow[k], float), f"t{k} not DOUBLE in Spark"
        assert srow[k].hex() == t.hex() == drow[k].hex(), (
            k, srow[k].hex(), t.hex(), drow[k].hex())


@pytest.fixture(scope="module")
def null_value_sf_dir(tmp_path_factory) -> str:
    """Fixture dir where ~1/7 of events.value is NULL (the latent
    input for findings 2 and 3); everything else copied through."""
    d = str(tmp_path_factory.mktemp("sf_null_values"))
    con = duckdb.connect()
    con.sql(f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN event_id % 7 = 3 THEN NULL ELSE value END
                AS value)
          FROM '{SF_DIR}/events.parquet'
        ) TO '{d}/events.parquet' (FORMAT PARQUET)""")
    n_null = con.sql(
        f"SELECT count(*) FILTER (value IS NULL) "
        f"FROM '{d}/events.parquet'").fetchone()[0]
    assert n_null > 0, "fixture vacuous: no NULL values injected"
    con.close()
    for t in _ALL_TABLES:
        if t != "events":
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.fixture(scope="module")
def null_value_duck(null_value_sf_dir):
    con = duckdb.connect()
    for t in _ALL_TABLES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{null_value_sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", ["window_ewma_smooth",
                                  "dq_ks_two_sample"])
def test_null_event_values_still_match_oracle(
        name, spark, null_value_sf_dir, null_value_duck):
    spec = _SPECS[name]
    df = spec.fn(spark, null_value_sf_dir)
    assert_matches_oracle(df, null_value_duck, spec.oracle)


@pytest.fixture(scope="module")
def constant_stratum_sf_dir(tmp_path_factory) -> str:
    """Fixture dir where one documents source is ALL-constant in
    n_chars (per-stratum variance cancels to ~0, possibly a tiny
    negative in doubles — finding 4's degenerate case)."""
    d = str(tmp_path_factory.mktemp("sf_const_stratum"))
    con = duckdb.connect()
    con.sql(f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN source = (SELECT min(source)
                                FROM '{SF_DIR}/documents.parquet')
                 THEN 4097 ELSE n_chars END AS n_chars)
          FROM '{SF_DIR}/documents.parquet'
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)""")
    sd0 = con.sql(f"""
        SELECT count(DISTINCT n_chars) FROM '{d}/documents.parquet'
        WHERE source = (SELECT min(source)
                        FROM '{d}/documents.parquet')""").fetchone()[0]
    assert sd0 == 1, "fixture vacuous: stratum not constant"
    con.close()
    for t in _ALL_TABLES:
        if t != "documents":
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{d}/{t}.parquet")
    return d


def test_constant_stratum_neyman_matches_oracle(
        spark, constant_stratum_sf_dir):
    con = duckdb.connect()
    for t in _ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '{constant_stratum_sf_dir}/{t}.parquet'")
    try:
        spec = _SPECS["sample_stratified_neyman"]
        df = spec.fn(spark, constant_stratum_sf_dir)
        assert_matches_oracle(df, con, spec.oracle)
    finally:
        con.close()
