"""Streaming ≡ batch differential tests (SURVEY.md §5.2): every true
streaming query must equal its batch twin under deterministic
AvailableNow replay of the fixture files."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.streaming import (
    stream_dedup,
    stream_stateful_counter,
    stream_tumbling,
    stream_tumbling_batch_twin,
)


def _rows(df):
    return sorted(
        (tuple(r[c] for c in sorted(df.columns)) for r in df.collect()),
        key=repr,
    )


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream = stream_tumbling(spark, sf_dir)
    batch = stream_tumbling_batch_twin(spark, sf_dir)
    assert _rows(stream) == _rows(batch)


def test_stream_dedup_equals_batch_distinct(spark, sf_dir):
    stream = stream_dedup(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unique_events"))
    )
    assert _rows(stream) == _rows(batch)


def test_stateful_counter_equals_batch_agg(spark, sf_dir):
    stream = stream_stateful_counter(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    s = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in stream.collect()}
    b = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in batch.collect()}
    assert s == b


def test_stream_static_join_equals_batch(spark, sf_dir):
    from mapreducewordcounting_spark.streaming import stream_static_join

    stream = stream_static_join(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    profile = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"))
    batch = (
        ev.join(profile, "user_id", "left")
        .groupBy("segment", "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    assert _rows(stream) == _rows(batch)


def test_stream_stream_join_equals_batch(spark, sf_dir):
    from mapreducewordcounting_spark.streaming import stream_stream_join

    stream = stream_stream_join(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"))
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"))
    batch = e.join(
        p,
        (F.col("e_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("e_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("p_ts") < F.col("e_ts")),
    ).select("e_id", "p_id", "e_user")
    assert _rows(stream) == _rows(batch)


def test_incremental_ingest_matches_batch_dedup(spark, sf_dir):
    """The foreachBatch merge must keep exactly one row per distinct
    content hash — the same answer batch dedup gives in one shot."""
    from pyspark.sql import functions as F

    from mapreducewordcounting_spark.catalog import load_table
    from mapreducewordcounting_spark.streaming import stream_incremental_ingest

    row = stream_incremental_ingest(spark, sf_dir).collect()[0]
    assert row["n_kept"] == row["n_distinct"]
    batch_distinct = (
        load_table(spark, sf_dir, "documents")
        .select(F.sha2("text", 256).alias("h")).distinct().count())
    assert row["n_distinct"] == batch_distinct


def test_stateful_surface_is_apply_in_pandas_with_state():
    """transformWithStateInPandas was RETIRED in r8 (VERDICT r7 item
    5): the protobuf runtime its state-server protocol needs is absent
    from the frozen container and may not be installed or vendored.
    This pins the decision so it cannot silently regress into a
    half-registered operator again:

    * ``stream_transform_with_state`` is NOT registered and NOT
      importable — the capability flag is gone, not dormant;
    * ``stream_stateful_counter`` (applyInPandasWithState) IS
      registered — it is the engine's supported custom-stateful
      surface, and its batch-twin equivalence is tested above.
    """
    from mapreducewordcounting_spark.registry import all_queries
    import mapreducewordcounting_spark.streaming as streaming

    registered = set(all_queries())
    assert "stream_transform_with_state" not in registered
    assert not hasattr(streaming, "stream_transform_with_state")
    assert not hasattr(streaming, "_has_protobuf")
    assert "stream_stateful_counter" in registered


def test_stream_outer_join_equals_oracled_twin(spark, sf_dir):
    """The LEFT OUTER stream-stream join must equal its batch twin
    row-for-row: matched pairs identical to the inner join, plus NULL
    rows exactly for unmatched errors the joint watermark has passed
    (e_ts < min(max p_ts, max e_ts) - 30min). The twin is DuckDB-
    oracled, so this pins Spark's outer-emission/state-eviction
    semantics to an externally checked statement."""
    from mapreducewordcounting_spark.streaming import (
        stream_outer_join_batch_twin,
        stream_stream_outer_join,
    )

    stream = stream_stream_outer_join(spark, sf_dir)
    twin = stream_outer_join_batch_twin(spark, sf_dir)
    srows, trows = _rows(stream), _rows(twin)
    assert srows == trows
    # the eviction path must be exercised (sf0.001 has no matched
    # pairs — the matched path is covered at sf0.01 by the driver
    # correctness run and by test_stream_stream_join_equals_batch)
    n_null = sum(1 for r in srows if r[2] is None)  # p_id (sorted cols)
    assert n_null > 0
    # matched rows, when present, must be exactly the inner join's
    matched = [r for r in srows if r[2] is not None]
    from mapreducewordcounting_spark.streaming import stream_stream_join
    inner = _rows(stream_stream_join(spark, sf_dir))
    assert matched == inner


def test_stream_full_outer_join_equals_oracled_twin(spark, sf_dir):
    """The FULL OUTER stream-stream join must equal its batch twin
    row-for-row: matched pairs identical to the inner join, NULL-
    purchase rows exactly for watermark-passed unmatched errors
    (e_ts < cut), and NULL-error rows exactly for unmatched purchases
    whose last possible match time passed (p_ts + 10min < cut — the
    condition's asymmetry). The twin is DuckDB-oracled, so Spark's
    two-sided eviction semantics are pinned externally."""
    from mapreducewordcounting_spark.streaming import (
        stream_full_outer_join_batch_twin,
        stream_stream_full_outer_join,
    )

    stream = stream_stream_full_outer_join(spark, sf_dir)
    twin = stream_full_outer_join_batch_twin(spark, sf_dir)
    srows, trows = _rows(stream), _rows(twin)
    assert srows == trows
    # both eviction paths must be exercised (cols sorted: e_id, e_user,
    # p_id, p_user)
    assert sum(1 for r in srows if r[2] is None) > 0   # p_id NULL
    assert sum(1 for r in srows if r[0] is None) > 0   # e_id NULL
    # matched rows, when present, must be exactly the inner join's
    matched = sorted((r[0], r[2], r[1]) for r in srows
                     if r[0] is not None and r[2] is not None)
    from mapreducewordcounting_spark.streaming import stream_stream_join
    inner = sorted((r[0], r[2], r[1])
                   for r in _rows(stream_stream_join(spark, sf_dir)))
    assert matched == inner


def test_stateful_session_gap_equals_oracled_twin(spark, sf_dir):
    """The custom-state sessionizer (applyInPandasWithState +
    EventTimeTimeout) must equal its batch twin row-for-row: closed
    sessions emitted in-data, the final open session emitted by the
    TIMEOUT path iff session_end + gap < the final watermark, and the
    trailing session the watermark never passes withheld. The twin is
    DuckDB-oracled, so the timeout semantics are pinned externally."""
    from mapreducewordcounting_spark.streaming import (
        stream_session_gap_batch_twin,
        stream_stateful_session_gap,
    )

    stream = stream_stateful_session_gap(spark, sf_dir)
    twin = stream_session_gap_batch_twin(spark, sf_dir)
    srows, trows = _rows(stream), _rows(twin)
    assert srows == trows
    assert srows, "fixture must produce sessions"
    # multi-event sessions must exist or the gap logic is vacuous
    # (cols sorted: n_events, session_end_us, session_start_us, user_id)
    assert any(r[0] > 1 for r in srows)
