"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``mapreducewordcounting_spark.registry`` — every
operator from SURVEY.md §2 registers a (query, oracle SQL) pair there;
this module re-exports the registry in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreducewordcounting_spark import registry as _registry
from mapreducewordcounting_spark.operators.wordcount import flagship as _flagship

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship word count on sf0.001 (full reference pipeline O1-O13)."""
    return _flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every SQL-expressible query."""
    return _registry.oracle_sql()
