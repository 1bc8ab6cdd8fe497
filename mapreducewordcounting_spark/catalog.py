"""Table catalog: loads the driver fixture tables.

The reference's only "catalog" is a hardcoded directory listing of
``./RawText/`` (sendFileByFile.cpp:422-444). Here, sources are parquet
tables under a scale-factor directory (TESTDATA.md); loading is a
``spark.read.parquet`` so Catalyst gets column pruning + predicate
pushdown + split planning for free (SURVEY.md §4.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. ``name`` must be in :data:`TABLES`."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load several tables as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for ``spark.sql`` use."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
