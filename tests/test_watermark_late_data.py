"""Watermark late-data semantics (SURVEY.md §2.2 'watermarks / late
data'): a two-micro-batch file stream where a row older than the
watermark arrives in batch 2 and must be dropped from the append-mode
output, while a fresh row is accepted."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch")


@pytest.fixture()
def stream_dir(request):
    d = os.path.join(SCRATCH, f"late_{uuid.uuid4().hex[:8]}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(os.path.join(d, "in"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_late_rows_dropped_past_watermark(spark, stream_dir):
    in_dir = os.path.join(stream_dir, "in")
    ckpt = os.path.join(stream_dir, "ckpt")

    def write_batch(name, rows):
        spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(in_dir, name))

    ts = lambda s: f"2024-01-01 {s}"  # noqa: E731

    # batch 1: events up to 10:00 → watermark advances to 10:00 - 30min
    write_batch("b1", [
        Row(ts=ts("08:00:00"), k="a"),
        Row(ts=ts("09:00:00"), k="a"),
        Row(ts=ts("10:00:00"), k="a"),
    ])

    stream = (
        spark.readStream.schema("ts STRING, k STRING")
        .option("pathGlobFilter", "*.parquet")
        .parquet(os.path.join(in_dir, "*"))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "k", "n")
    )
    out_dir = os.path.join(stream_dir, "out")

    def run_stream():
        q = (stream.writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    run_stream()

    # batch 2: one late row (07:30, far below the 09:30 watermark) and
    # one fresh row (11:00)
    write_batch("b2", [
        Row(ts=ts("07:30:00"), k="late"),
        Row(ts=ts("11:00:00"), k="fresh"),
    ])
    run_stream()
    # close out remaining windows so appended results flush
    write_batch("b3", [Row(ts=ts("23:00:00"), k="flush")])
    run_stream()

    # hour computed JVM-side (session tz): collect()'d datetimes convert
    # through the OS-local tz and would shift the hour on non-UTC hosts
    out = {(r.h, r.k): r.n
           for r in spark.read.parquet(out_dir)
           .select(F.hour("w_start").alias("h"), "k", "n").collect()}
    assert (11, "fresh") in out, f"fresh row missing: {out}"
    assert not any(k == "late" for _, k in out), f"late row not dropped: {out}"
    # on-time batch-1 rows all present
    assert out[(8, "a")] == 1 and out[(9, "a")] == 1 and out[(10, "a")] == 1
