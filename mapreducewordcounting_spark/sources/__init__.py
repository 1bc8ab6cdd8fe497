"""Source / sink connectors (SURVEY.md §2.2 rows 1-2 — M7).

The reference reads a hardcoded directory of text files
(sendFileByFile.cpp:422-444, :82-88) and writes one space-separated
text file per (rank, reducer) — never merged (README.md:11 TODO,
sendFileByFile.cpp:376-392). Here both ends generalize:

- sources: parquet (primary, via catalog), text-file corpus
  (the reference's actual input mode), csv, json;
- sinks: parquet / csv / json writers plus ``write_wordcount_text`` —
  the reference's O13 sink re-expressed (per-partition sorted
  ``word count`` lines), with ``merge=True`` closing the README TODO
  via ``coalesce(1)``.

Everything is ``DataFrameReader``/``DataFrameWriter``: split planning,
partition discovery, predicate pushdown and output committers are
Spark's, not ours (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(spark: SparkSession, directory: str) -> DataFrame:
    """Directory-of-text-files source — the reference's O1+O3 input
    (one row per line, plus the originating file like the reference's
    per-file work units). Large files split across tasks automatically,
    fixing the reference's one-file-one-reader serialization
    (SURVEY.md §4.2 scheduling)."""
    return (
        spark.read.text(directory)
        .select(
            F.input_file_name().alias("file"),
            F.col("value").alias("text"),
        )
    )


def write_wordcount_text(df: DataFrame, path: str, merge: bool = False) -> None:
    """Reference O13 sink: ``word count`` lines, sorted within each
    output file (the reference's per-reducer std::map iteration order,
    sendFileByFile.cpp:376-392). ``merge=True`` = the README.md:11 TODO
    ("merge into 1 txt"): coalesce to a single partition first.

    Expects columns (word, cnt). At scale, leave merge=False — a
    single merged file serializes the sink through one task.
    """
    out = df.select(F.concat_ws(" ", "word", "cnt").alias("value"))
    if merge:
        out = out.coalesce(1)
    out.sortWithinPartitions("value").write.mode("overwrite").text(path)


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                partition_by: tuple[str, ...] = (), **options) -> None:
    """Generic sink: parquet/csv/json with optional hive-style
    partitioning (partition pruning on re-read comes free)."""
    w = df.write.mode("overwrite").format(fmt)
    for k, v in options.items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema=None, **options) -> DataFrame:
    """Generic source twin of :func:`write_table`."""
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    for k, v in options.items():
        r = r.option(k, v)
    if fmt == "csv":
        r = r.option("header", options.get("header", "true"))
    return r.load(path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 8,
                   sort_col: str | None = None) -> None:
    """Bucketed managed table (Spark bucketing = hive-style hash
    bucketing persisted in the metastore). Two tables bucketed the same
    way on their join key join WITHOUT any exchange — the pre-shuffled
    layout a 100 TB star schema is stored in so the nightly joins never
    pay the network again."""
    import os
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    # A fresh session's in-memory metastore doesn't know tables written
    # by a PREVIOUS session, but their warehouse directories survive —
    # saveAsTable then fails with LOCATION_ALREADY_EXISTS. Drop both.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(wh, table.lower()), ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def write_training_shards(df: DataFrame, path: str,
                          partition_by: str = "lang",
                          max_records_per_file: int = 10_000) -> None:
    """Training-data delivery: hive-partitioned parquet shards with a
    per-file record cap — the layout downstream dataloaders want
    (partition pruning by lang/source; bounded shard sizes so a
    1000-reader job gets even work without re-splitting)."""
    (df.write.mode("overwrite")
     .option("maxRecordsPerFile", max_records_per_file)
     .partitionBy(partition_by)
     .parquet(path))
