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
    """Load one fixture table. ``name`` must be in :data:`TABLES`.

    ``events.ts`` has shipped in two physical encodings across fixture
    generations: µs-precision TIMESTAMP (reads as TIMESTAMP_NTZ) and
    ns-precision TIMESTAMP(NANOS) (which Spark's vectorized reader
    rejects outright, PARQUET_TYPE_ILLEGAL, unless
    ``spark.sql.legacy.parquet.nanosAsLong`` maps it to raw int64).
    We branch on the *observed* type rather than assuming a generation,
    and normalize every variant to session-tz TimestampType so all
    downstream operators (windows, watermarks, oracle hashing) see one
    stable schema.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Pin the session timezone: fixture timestamps are tz-naive, and a
    # non-UTC driver session would shift every collected/derived value
    # relative to the DuckDB oracle (which is always tz-naive).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        try:
            df = spark.read.parquet(path)
        except Exception as exc:
            # Only the ns-precision fixture earns the nanosAsLong retry
            # (mutating session config); anything else — missing file,
            # corrupt footer, permissions — re-raises the original error
            # rather than masking it behind a confusing second failure.
            if "PARQUET_TYPE_ILLEGAL" not in str(exc) and \
                    "Illegal Parquet type" not in str(exc):
                raise
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # Raw epoch-nanos. `ts div 1000` (integer division) — a
            # double division would lose precision above 2^53 ns.
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, TimestampNTZType):
            # NTZ → LTZ is value-identity under the UTC session tz
            # pinned above; keeps one TimestampType across fixtures.
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load several tables as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for ``spark.sql`` use."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
