"""Custom Python data source (Spark 4 ``pyspark.sql.datasource``) —
the user-extensible *source* connector surface.

The reference's only source is a hand-rolled directory scanner feeding
a pull-based file dispatcher (sendFileByFile.cpp:422-444, :40-64).
Spark's native readers replace that entirely (sources/__init__.py);
this module covers the remaining question — "what if the engine needs
a format Spark has no reader for?" — with the Python DataSource API:
declare a schema, split the input into ``InputPartition``s (the
dispatcher's work units, planned not polled), and read each partition
in a Python worker.

The demo format wraps a parquet file via pyarrow, one partition per
row group, so its output is oracle-checkable against the same table
read natively. Scale posture: partitions() is the split planning the
reference's dispatcher did with MPI polling — here it's metadata-only
on the driver, and each split reads in parallel. A Python source pays
the Python-worker toll, so it's for format gaps, not the hot path
(the catalog stays on the native vectorized parquet reader).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from mapreducewordcounting_spark.functions.text import tokenize_canonical
from mapreducewordcounting_spark.operators.wordcount import _ORACLE_WORDCOUNT
from mapreducewordcounting_spark.registry import register


class _RowGroupPartition(InputPartition):
    """One work unit = one parquet row group (the analog of the
    reference's one-filename work unit, sendFileByFile.cpp:75-76)."""

    def __init__(self, path: str, row_group: int):
        self.path = path
        self.row_group = row_group


class DocCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).num_row_groups
        return [_RowGroupPartition(self.path, g) for g in range(n)]

    def read(self, partition: _RowGroupPartition):
        import pyarrow.parquet as pq

        f = pq.ParquetFile(partition.path)
        tbl = f.read_row_group(partition.row_group,
                               columns=["doc_id", "text"])
        for batch in tbl.to_batches():
            yield from zip(batch.column("doc_id").to_pylist(),
                           batch.column("text").to_pylist())


class DocCorpusDataSource(DataSource):
    """``spark.read.format("doccorpus").option("path", …)``."""

    @classmethod
    def name(cls) -> str:
        return "doccorpus"

    def schema(self) -> str:
        return "doc_id long, text string"

    def reader(self, schema) -> DocCorpusReader:
        return DocCorpusReader(self.options)


def register_doc_corpus(spark: SparkSession) -> None:
    spark.dataSource.register(DocCorpusDataSource)


@register(
    "pyds_wordcount",
    oracle=_ORACLE_WORDCOUNT,
    tags=("source", "python-datasource", "flagship"),
)
def pyds_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship word count with its scan swapped for the custom
    Python data source — same oracle as wordcount_canonical, so the
    connector's correctness (schema, partitioning, values) is pinned
    against the native reader end-to-end."""
    register_doc_corpus(spark)
    docs = (
        spark.read.format("doccorpus")
        .option("path", f"{sf_dir}/documents.parquet")
        .load()
    )
    return (
        docs.select(F.explode(tokenize_canonical("text")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
