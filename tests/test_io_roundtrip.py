"""Source/sink round-trip invariants beyond the oracle hash:
plan-shape proof that the partitioned sink actually prunes, and that
the text-dir source reproduces the flagship result exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.operators import io_roundtrip as io
from mapreducewordcounting_spark.registry import all_queries


def test_partitioned_read_prunes(spark, sf_dir):
    """The event_type filter must resolve as a PartitionFilter (directory
    pruning), not a data filter — at 100 TB this is the difference
    between listing one partition and scanning the whole store."""
    df = all_queries()["sink_partitioned_prune"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the pushed partition predicate names the partition column
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_type" in pf_line
    # and it is NOT re-checked as a post-scan data filter on parquet rows
    assert "PushedFilters: [], " in plan or "PushedFilters: []" in plan


def test_text_dir_equals_flagship(spark, sf_dir):
    """Round-tripping the corpus through the text sink/source must not
    change the word multiset (line splits are whitespace)."""
    qs = all_queries()
    via_text = qs["source_text_dir_wordcount"].fn(spark, sf_dir)
    direct = qs["wordcount_canonical"].fn(spark, sf_dir)
    assert via_text.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_text).count() == 0


def test_csv_preserves_row_count(spark, sf_dir):
    df = all_queries()["source_csv_roundtrip"].fn(spark, sf_dir)
    total = df.agg(F.sum("n_rows").alias("n")).collect()[0]["n"]
    assert total == load_table(spark, sf_dir, "lineitem").count()


def test_partitioned_sink_layout(spark, sf_dir, tmp_path):
    """partitionBy writes hive-style directories, one per value."""
    import os
    all_queries()["sink_partitioned_prune"].fn(spark, sf_dir).collect()
    root = io._io_path(sf_dir, "part_events")
    types = sorted(
        d.split("=", 1)[1] for d in os.listdir(root)
        if d.startswith("event_type=")
    )
    ev_types = [
        r["event_type"] for r in load_table(spark, sf_dir, "events")
        .select("event_type").distinct().collect()
    ]
    assert types == sorted(ev_types)


def test_compaction_reduces_file_count(spark, sf_dir):
    """The fragmented copy has many small parquet files; the compacted
    rewrite collapses them to the target partition count."""
    import glob
    import os
    all_queries()["layout_compact_files"].fn(spark, sf_dir).collect()
    frag = glob.glob(os.path.join(io._io_path(sf_dir, "fragmented_docs"),
                                  "*.parquet"))
    comp = glob.glob(os.path.join(io._io_path(sf_dir, "compacted_docs"),
                                  "*.parquet"))
    assert len(comp) <= 4 < len(frag)


def test_csv_quoting_edge_cases(spark, tmp_path):
    """CSV sink/source must round-trip hostile strings exactly. Two
    documented cliffs pinned here: (a) embedded newlines require
    multiLine=true on the READ (without it a quoted newline splits the
    record); (b) the WRITE side defaults ignoreLeading/TrailingWhiteSpace
    to TRUE — it silently trims data unless both are set false."""
    hostile = [
        'plain', 'comma,inside', 'quote"inside', '"fully quoted"',
        'new\nline', 'crlf\r\n', 'uni: é中文', '', ' leading',
        'trailing ', "apostrophe's", 'back\\slash', 'tab\there',
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(hostile)], "id LONG, s STRING")
    path = str(tmp_path / "hostile_csv")
    (df.write.mode("overwrite").option("header", True)
       .option("ignoreLeadingWhiteSpace", False)
       .option("ignoreTrailingWhiteSpace", False)
       .csv(path))
    back = (
        spark.read.schema("id LONG, s STRING")
        .option("header", True).option("multiLine", True)
        .csv(path)
    )
    got = {r["id"]: r["s"] for r in back.collect()}
    want = {i: (s if s != "" else None) for i, s in enumerate(hostile)}
    # Spark's CSV writes empty string as empty field, which reads back
    # as null — the one asymmetry, pinned here so it's a known contract.
    assert got == want


def test_dpp_injects_runtime_partition_filter(spark, sf_dir):
    """The dim-side filter must reach the partitioned fact scan as a
    DYNAMIC pruning subquery — scanning all partitions and filtering
    post-join is the failure mode this operator exists to avoid."""
    df = all_queries()["join_dpp_partitioned"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_tombstone_purge_prunes_and_removes_only_tombstones(spark, sf_dir):
    """(a) The rewrite's blast radius: after the purge runs, every
    tombstoned user is gone and every retained row survives (vs the
    source table). (b) Plan shape: the rewrite scan must prune at the
    partition level (bucket PartitionFilters), proving untouched
    buckets are never read during the rewrite."""
    import os

    df = all_queries()["sink_tombstone_purge"].fn(spark, sf_dir)
    got = {r["bucket"]: r["n_events"] for r in df.collect()}
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["bucket"]: r["n"]
        for r in ev.filter(F.col("user_id") % 97 != 0)
        .groupBy((F.col("user_id") % 8).alias("bucket"))
        .agg(F.count("*").alias("n")).collect()
    }
    assert got == want

    # plan shape of the rewrite scan: partition-pruned, anti-joined
    store = io._io_path(sf_dir, "purge_events")
    if not os.path.isdir(store):  # zero-row fixture: nothing written
        return
    fact = spark.read.parquet(store)
    tomb = (ev.filter(F.col("user_id") % 97 == 0)
            .select("user_id").distinct())
    cleaned = (fact.filter(F.col("bucket").isin([0, 1]))
               .join(F.broadcast(tomb), "user_id", "left_anti"))
    plan = cleaned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "bucket" in pf_line
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_parquet_footer_stats_per_row_group_exact(spark, sf_dir):
    """The per-ROW-GROUP grain behind source_parquet_footer_stats:
    every row group's footer [min, max] must equal the actual range
    of its rows (parquet numeric stats are exact, the data-skipping
    contract), and per-group value counts must sum to the table."""
    import pyarrow.parquet as pq

    from mapreducewordcounting_spark.operators.io_roundtrip import (
        FOOTER_STAT_COLS,
    )

    pf = pq.ParquetFile(f"{sf_dir}/lineitem.parquet")
    md = pf.metadata
    assert md.num_row_groups >= 1
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    for col in FOOTER_STAT_COLS:
        total = 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            data = pf.read_row_group(rg, columns=[col]).column(0)
            vals = [v.as_py() for v in data]
            assert st.min == min(vals) and st.max == max(vals)
            assert st.num_values == len([v for v in vals if v is not None])
            total += st.num_values
        assert total == md.num_rows
