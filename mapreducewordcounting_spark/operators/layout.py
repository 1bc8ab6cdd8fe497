"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

A 100 TB table filtered on two independent columns (here lineitem's
partkey and suppkey) can only be file-skipped on ONE of them if the
data is range-sorted on that column alone. Interleaving the bits of
both quantized dimensions into a single Morton key and range-sorting
on it bounds BOTH dimensions' min/max span within every file/bucket —
so parquet min/max statistics prune scans for predicates on either
column. This is the layout trick behind Delta/Iceberg ``ZORDER BY``,
expressed here in plain engine arithmetic (no table-format dependency):
the real write path is ``df.repartitionByRange("zval")
.sortWithinPartitions("zval").write.parquet(...)``.

The registered query computes the keys and the per-bucket dimensional
spans — the measurable claim ("every z-bucket covers a narrow px AND
sx range") that makes the layout worth its sort. The whole thing is
codegen'd integer arithmetic: one 1-row bounds aggregate broadcast
onto the scan, then one groupBy on 256 buckets.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.registry import register

#: bits per dimension (2 dims × 8 bits → 16-bit Morton key)
_BITS = 8


def morton_interleave(px: Column, sx: Column, bits: int = _BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: px's bit b
    lands at position 2b, sx's at 2b+1. Pure shift/mask/add — stays in
    whole-stage codegen."""
    return reduce(
        lambda acc, b: acc
        + F.shiftright(px, b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b))
        + F.shiftright(sx, b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b + 1)),
        range(bits),
        F.lit(0).cast("long"),
    )


# DuckDB twin of morton_interleave, generated from the same bit layout
_MORTON_SQL = " + ".join(
    f"((px >> {b}) & 1) * {1 << (2 * b)} + ((sx >> {b}) & 1) * {1 << (2 * b + 1)}"
    for b in range(_BITS)
)


@register(
    "layout_zorder",
    oracle=f"""
        WITH b AS (
            SELECT min(l_partkey) AS mnp, max(l_partkey) AS mxp,
                   min(l_suppkey) AS mns, max(l_suppkey) AS mxs
            FROM lineitem
        ),
        q AS (
            SELECT ((l_partkey - mnp) * 256) // (mxp - mnp + 1) AS px,
                   ((l_suppkey - mns) * 256) // (mxs - mns + 1) AS sx
            FROM lineitem, b
        ),
        z AS (SELECT px, sx, {_MORTON_SQL} AS zval FROM q)
        SELECT zval // 256 AS zbucket,
               count(*) AS n_rows,
               min(px) AS p_min, max(px) AS p_max,
               min(sx) AS s_min, max(sx) AS s_max
        FROM z GROUP BY zbucket
    """,
    tags=("layout", "zorder", "data-skipping"),
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-key layout stats: quantize (l_partkey, l_suppkey) to 8
    bits each against their global bounds, interleave into a 16-bit
    z-value, and report per-z-bucket row counts and dimensional spans.

    Plan shape: the bounds aggregate is one row, broadcast onto the
    fact scan (no shuffle of fact data for quantization); the only
    fact-sized exchange is the final 256-bucket groupBy, which is
    map-side combinable. Quantization uses integer ``div`` throughout
    so Spark and DuckDB agree bit-for-bit — no float rounding at
    bucket edges."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bounds = li.agg(
        F.min("l_partkey").alias("mnp"), F.max("l_partkey").alias("mxp"),
        F.min("l_suppkey").alias("mns"), F.max("l_suppkey").alias("mxs"))
    q = li.crossJoin(F.broadcast(bounds)).select(
        F.expr("((l_partkey - mnp) * 256) div (mxp - mnp + 1)").alias("px"),
        F.expr("((l_suppkey - mns) * 256) div (mxs - mns + 1)").alias("sx"))
    z = q.select("px", "sx", morton_interleave(F.col("px"), F.col("sx"))
                 .alias("zval"))
    return (
        z.groupBy(F.expr("zval div 256").alias("zbucket"))
        .agg(F.count("*").alias("n_rows"),
             F.min("px").alias("p_min"), F.max("px").alias("p_max"),
             F.min("sx").alias("s_min"), F.max("sx").alias("s_max"))
    )


@register(
    "layout_compact_files",
    oracle="""
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               count(DISTINCT doc_id) AS n_distinct_ids
        FROM documents
        GROUP BY source
    """,
    tags=("layout", "compaction", "sink"),
)
def layout_compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the lakehouse maintenance operation that
    keeps a 100 TB table scannable. A fragmented copy of the corpus is
    produced first (``maxRecordsPerFile`` caps rows per file — the
    shape left behind by streaming ingest or over-parallel writers:
    every file carries footer/open/seek overhead and its own parquet
    dictionary, and at 10⁶+ files the driver's split planning itself
    becomes the bottleneck). Compaction is then a single
    ``repartition(target)`` rewrite — a round-robin shuffle whose
    target count a real deployment derives from bytes/128 MiB; AQE's
    partition coalescing handles the long tail automatically. The
    oracle aggregates the ORIGINAL table, so the check proves the
    rewrite preserved every row and every value through both hops.
    """
    from mapreducewordcounting_spark.operators.io_roundtrip import _io_path

    docs = load_table(spark, sf_dir, "documents")
    frag = _io_path(sf_dir, "fragmented_docs")
    docs.write.mode("overwrite").option("maxRecordsPerFile", 50).parquet(frag)
    compacted = _io_path(sf_dir, "compacted_docs")
    spark.read.parquet(frag).repartition(4) \
        .write.mode("overwrite").parquet(compacted)
    back = spark.read.parquet(compacted)
    return back.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.count_distinct("doc_id").alias("n_distinct_ids"),
    )
