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
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

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

    def writer(self, schema, overwrite: bool) -> "DocCorpusWriter":
        return DocCorpusWriter(self.options, overwrite)


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


# ---------------------------------------------------------------------------
# Writer half — the user-extensible *sink* connector surface
# ---------------------------------------------------------------------------

class _ShardCommit(WriterCommitMessage):
    """Per-task commit message: which shard file, how many rows."""

    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class DocCorpusWriter(DataSourceWriter):
    """JSONL shard writer with a TWO-PHASE COMMIT: tasks write
    uniquely-named shards and return commit messages; only `commit`
    (driver, after every task succeeded) publishes the manifest naming
    the valid shards. A reader that honors the manifest never sees
    partial output from failed/speculative tasks — the exactly-once
    contract the reference's sink lacks entirely (its per-thread
    ``Rank_<r>_Thread_<t>.txt`` files have no commit protocol at all,
    sendFileByFile.cpp:376-392)."""

    def __init__(self, options: dict, overwrite: bool = False):
        import os
        import shutil

        self.path = options["path"]
        if overwrite:
            # overwrite semantics resolve HERE (driver, before any task
            # writes): clear prior shards + manifest, so overwrite and
            # append are genuinely different modes
            shutil.rmtree(self.path, ignore_errors=True)
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        import json
        import os
        import uuid

        fn = f"shard-{uuid.uuid4().hex}.jsonl"
        # write under a .tmp name and rename on success: a task dying
        # mid-write leaves only a *.tmp that neither the manifest nor a
        # *.jsonl glob can see — partial shards are never ingested
        tmp = os.path.join(self.path, fn + ".tmp")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(
                    {"doc_id": row.doc_id, "text": row.text}) + "\n")
                n += 1
        os.rename(tmp, os.path.join(self.path, fn))
        return _ShardCommit(fn, n)

    def commit(self, messages):
        import json
        import os

        manifest_path = os.path.join(self.path, "_MANIFEST.json")
        # append semantics: merge previously committed shards — a commit
        # that listed only this job's shards would make every earlier
        # append invisible to manifest-honoring readers
        prior = {"shards": [], "total_rows": 0}
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                prior = json.load(f)
        manifest = {
            "shards": sorted(set(prior["shards"])
                             | {m.filename for m in messages}),
            "total_rows": prior["total_rows"]
                          + sum(m.n_rows for m in messages),
        }
        with open(manifest_path, "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


@register(
    "pyds_sink_roundtrip",
    oracle=_ORACLE_WORDCOUNT,
    tags=("sink", "python-datasource", "flagship"),
)
def pyds_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus → custom Python SINK (manifest-committed JSONL shards) →
    JSON source → word count, sharing the flagship oracle: the whole
    write path (per-task shards, two-phase manifest commit) must
    preserve the word multiset bit-for-bit. Only manifest-listed shards
    are read back — the atomicity the commit protocol buys."""
    import json as _json
    import os
    import shutil

    from mapreducewordcounting_spark.catalog import load_table
    from mapreducewordcounting_spark.operators.io_roundtrip import _io_path

    register_doc_corpus(spark)
    out = _io_path(sf_dir, "pyds_sink")
    shutil.rmtree(out, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.write.format("doccorpus").option("path", out).mode("append").save()

    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = _json.load(f)
    shard_paths = [os.path.join(out, s) for s in manifest["shards"]]
    back = spark.read.schema("doc_id long, text string").json(shard_paths)
    return (
        back.select(F.explode(tokenize_canonical("text")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Streaming half — the user-extensible *streaming source* surface
# ---------------------------------------------------------------------------

class _RowRangePartition(InputPartition):
    """One work unit = one row range [lo, hi) of the ledger file —
    the intra-batch parallelism unit (a micro-batch fans out to
    multiple of these, one per executor slot)."""

    def __init__(self, path: str, lo: int, hi: int):
        self.path = path
        self.lo = lo
        self.hi = hi


class EventLedgerStreamReader(DataSourceStreamReader):
    """Offset-tracked replay of an append-only event ledger (here: a
    parquet file standing in for a log segment).

    The streaming-source contract, mapped onto the reference's only
    'streaming' idea (per-file punctuation sentinels that flush mapper
    state, sendFileByFile.cpp:111-114, :168-172):

    - ``initialOffset``/``latestOffset`` replace sentinel counting with
      DURABLE offsets: progress is {"row": n}, checkpointed by the
      engine, so a crashed query resumes where it left off — the
      reference's protocol hangs forever if any rank dies mid-count.
    - ``partitions(start, end)`` plans the micro-batch as row-range
      splits (metadata only, driver-side); each range reads in a
      parallel task — the pull-based dispatcher (:40-64) without the
      polling.
    - ``commit(end)`` is where a real segment store would truncate;
      a ledger is immutable so it is a no-op here.

    Scale posture: offsets are O(1) driver state; batch planning never
    touches data; ranges map 1:1 onto executor tasks. For a multi-file
    100 TB log the offset becomes (segment, row) and partitions() maps
    ranges to whole segments — same protocol, no code-shape change.
    """

    def __init__(self, options: dict):
        self.path = options["path"]
        self.batch_rows = int(options.get("batch_rows", 4096))

    def _total_rows(self) -> int:
        import pyarrow.parquet as pq

        return pq.ParquetFile(self.path).metadata.num_rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        return {"row": self._total_rows()}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["row"], end["row"]
        return [
            _RowRangePartition(self.path, a, min(a + self.batch_rows, hi))
            for a in range(lo, hi, self.batch_rows)
        ] or [_RowRangePartition(self.path, lo, lo)]

    def read(self, partition: _RowRangePartition):
        import pyarrow.parquet as pq

        if partition.hi <= partition.lo:
            return
        tbl = pq.ParquetFile(partition.path).read(
            columns=["event_id", "event_type", "user_id"])
        sl = tbl.slice(partition.lo, partition.hi - partition.lo)
        yield from zip(sl.column("event_id").to_pylist(),
                       sl.column("event_type").to_pylist(),
                       sl.column("user_id").to_pylist())

    def commit(self, end: dict) -> None:
        pass  # immutable ledger: nothing to truncate


class EventLedgerDataSource(DataSource):
    """``spark.readStream.format("eventledger").option("path", …)``."""

    @classmethod
    def name(cls) -> str:
        return "eventledger"

    def schema(self) -> str:
        return "event_id long, event_type string, user_id long"

    def streamReader(self, schema) -> EventLedgerStreamReader:
        return EventLedgerStreamReader(self.options)


@register(
    "pyds_stream_ledger",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(user_id) AS BIGINT) AS sum_user,
               min(event_id) AS min_id,
               max(event_id) AS max_id
        FROM events
        GROUP BY event_type
    """,
    tags=("streaming", "source", "python-datasource"),
)
def pyds_stream_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end custom STREAMING source: the event ledger replays
    through the offset/partition protocol under Trigger.AvailableNow,
    aggregates in complete mode, and must reproduce the batch answer
    exactly — the same batch-twin discipline as the file-based
    streaming queries, but here the thing under test is the
    user-extensible streaming connector itself (offset planning,
    range-split reads, exactly-once replay)."""
    from mapreducewordcounting_spark.streaming import run_available_now

    spark.dataSource.register(EventLedgerDataSource)
    stream = (
        spark.readStream.format("eventledger")
        .option("path", f"{sf_dir}/events.parquet")
        .option("batch_rows", 4096)
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("user_id").alias("sum_user"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )
    return run_available_now(agg)
