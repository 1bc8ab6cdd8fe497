"""Structured Streaming operators (SURVEY.md §2.2 streaming rows — M6).

The reference's only "streaming" trait is punctuation: per-file
``count=-1`` sentinels trigger mapper state flushes
(sendFileByFile.cpp:111-114 → :172, :186-200) — a degenerate per-file
tumbling window. This module provides the real thing over `events`:

- tumbling / sliding / session event-time windows,
- watermarks with late-data drop,
- streaming dedup (``dropDuplicates`` + watermark),
- a custom stateful operator via ``applyInPandasWithState``.

**Checking strategy** (SURVEY.md §5.2): streaming is not
DuckDB-checkable, so each streaming query has a *batch twin* computed
with the identical window expression; the batch twins ARE
oracle-checked (gaps-and-islands SQL for session windows), and
tests/test_streaming.py asserts stream-result == batch-result under
``Trigger.AvailableNow`` (deterministic replay of the fixture).

Scale: event-time windows shuffle once on (key, window); state size is
bounded by watermark horizon × key cardinality, not stream length —
the property that makes this viable on an unbounded 100 TB/day feed.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.registry import register

def _events_raw_schema(ts_type) -> StructType:
    return StructType([
        StructField("event_id", LongType()),
        StructField("ts", ts_type),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ])


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream, normalized to the same
    session-tz TimestampType the batch catalog emits.

    The fixture's ts column has shipped as both µs TIMESTAMP (reads as
    TIMESTAMP_NTZ) and ns TIMESTAMP(NANOS) (readable only as raw int64
    under nanosAsLong) across generations — see catalog.load_table.
    A readStream needs its schema up front, so probe the batch reader's
    view of the footer first and branch on the OBSERVED type; assuming
    ns here while the file is µs would silently divide every timestamp
    by an extra 1000 (2024 collapses to 1970-01-20)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, "events.parquet")
    # Footer probe with the batch reader: what type does ts REALLY have?
    try:
        raw_type = spark.read.parquet(path).schema["ts"].dataType
    except Exception as exc:
        if "PARQUET_TYPE_ILLEGAL" not in str(exc) and \
                "Illegal Parquet type" not in str(exc):
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw_type = spark.read.parquet(path).schema["ts"].dataType
    def _stream(ts_type):
        # file-stream source wants a DIRECTORY; select the one file by glob
        return (
            spark.readStream.schema(_events_raw_schema(ts_type))
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )

    if isinstance(raw_type, LongType):
        # ns fixture under nanosAsLong: ts arrives as epoch-nanos int64.
        return _stream(LongType()).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _stream(raw_type).withColumn("ts", F.col("ts").cast("timestamp"))


#: State-store partition count for streaming queries. A stateful
#: streaming query creates one state store per shuffle partition, and
#: that count is FROZEN into the checkpoint at first start — so it is a
#: deliberate capacity decision (keys × state size ÷ executor memory),
#: not something to inherit from the batch shuffle default. On the
#: fixture streams, 32 state stores are pure per-partition setup
#: overhead (measured 5.7 s → 0.9 s per query at 4); a 100 TB/day feed
#: would size this to hundreds and keep it stable across restarts.
STREAM_SHUFFLE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "4"))


class _stream_partitions:
    """Scope spark.sql.shuffle.partitions for a streaming run (the conf
    is read at query start; queries here run to completion inside the
    scope, so batch queries never see the override)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.saved = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions",
                            str(STREAM_SHUFFLE_PARTITIONS))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.saved)


def run_available_now(stream_df: DataFrame, name: str | None = None) -> DataFrame:
    """Execute a streaming aggregation to completion on the existing
    files (Trigger.AvailableNow → memory sink) and return the result as
    a batch DataFrame. Deterministic replay for tests and the driver."""
    sink = name or f"mrwc_stream_{uuid.uuid4().hex[:8]}"
    spark = stream_df.sparkSession
    with _stream_partitions(spark):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


# --------------------------------------------------------------------------
# Batch twins (oracle-checked) — same window semantics, batch engine
# --------------------------------------------------------------------------

@register(
    "stream_tumbling_batch_twin",
    oracle="""
        SELECT epoch_us(CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP))
                   AS w_start_us,
               event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("streaming", "window", "batch-twin"),
)
def stream_tumbling_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window counts — the batch twin of
    stream_tumbling (identical F.window expression, batch source)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("total_value"),
        )
        .select(F.unix_micros(F.col("w.start")).alias("w_start_us"),
                "event_type", "n_events", "total_value")
    )


@register(
    "stream_sliding_batch_twin",
    oracle="""
        WITH offsets AS (SELECT unnest([0, 30]) AS off_min),
        bucketed AS (
            SELECT CAST(time_bucket(INTERVAL '1 hour',
                                    ts - to_minutes(off_min))
                        + to_minutes(off_min) AS TIMESTAMP) AS w_start,
                   value
            FROM events CROSS JOIN offsets
        )
        SELECT epoch_us(w_start) AS w_start_us, count(*) AS n_events
        FROM bucketed
        GROUP BY w_start
    """,
    tags=("streaming", "window", "batch-twin"),
)
def stream_sliding_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 30 min slide): every event lands in
    2 overlapping windows (Spark's window() expands to the same two
    offset buckets the oracle enumerates)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.unix_micros(F.col("w.start")).alias("w_start_us"),
                "n_events")
    )


@register(
    "stream_session_batch_twin",
    oracle="""
        WITH ordered AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             IS NULL
                          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             >= INTERVAL 10 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS session_no
            FROM ordered
        )
        SELECT user_id,
               epoch_us(min(ts)) AS session_start_us,
               count(*) AS n_events
        FROM sessions
        GROUP BY user_id, session_no
    """,
    tags=("streaming", "window", "session", "batch-twin"),
)
def stream_session_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) per user. Spark: built-in
    session_window; oracle: the classic gaps-and-islands rewrite —
    proving the semantics, not just the plumbing. The new-session
    condition is gap >= 10 min because Spark's session end
    (last_event + gap) is EXCLUSIVE: an event exactly one gap after the
    previous one starts a new session. Session identity is compared on
    epoch-µs of the first event (ns tails truncate identically on both
    sides)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes").alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# True streaming queries (rows-only; equality-to-batch pinned in tests)
# --------------------------------------------------------------------------

@register(
    "stream_tumbling",
    oracle=None,  # streaming — equality with the oracle-checked batch
    # twin is asserted in tests/test_streaming.py.
    tags=("streaming", "window"),
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows with a 30-minute watermark over the
    events *stream* (file source, AvailableNow). Runs in COMPLETE output
    mode so the memory-sink result deterministically equals the batch
    twin — note complete mode retains all window state (the watermark
    evicts nothing here). The bounded-state deployment shape is APPEND
    mode, where the watermark finalizes + evicts closed windows and
    drops late rows — exercised end-to-end in
    tests/test_watermark_late_data.py."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("total_value"),
        )
        .select(F.unix_micros(F.col("w.start")).alias("w_start_us"),
                "event_type", "n_events", "total_value")
    )
    return run_available_now(agg)


@register(
    "stream_dedup",
    oracle=None,  # streaming; tests assert equality with batch distinct
    tags=("streaming", "dedup"),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup — the streaming face of dedup_exact.
    dropDuplicatesWithinWatermark (not plain dropDuplicates) is what
    makes the state bounded: plain dropDuplicates without the event-time
    column in its key set keeps every id ever seen, unbounded."""
    ev = read_events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unique_events"))
    )
    return run_available_now(deduped)


@register(
    "stream_stateful_counter",
    oracle=None,  # custom stateful op; tests assert equality with batch
    tags=("streaming", "stateful"),
)
def stream_stateful_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value sum kept in explicit GroupState —
    the applyInPandasWithState plumbing (Arrow-batched state updates)
    that backs bespoke operators Spark lacks natively."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = read_events_stream(spark, sf_dir)

    out_schema = "user_id LONG, n_events LONG, total_value DOUBLE"
    state_schema = "n LONG, v DOUBLE"

    def update(key, pdfs, state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [v]})

    counted = (
        ev.withWatermark("ts", "30 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink = f"mrwc_state_{uuid.uuid4().hex[:8]}"
    # Deliberately NOT under _stream_partitions: this operator's cost is
    # the Arrow/pandas worker round-trip, not JVM state-store setup, so
    # shuffle-partition count here is Python parallelism (A/B at sf0.1:
    # 1.8 s at 32 partitions vs 4.5 s at 4).
    q = (
        counted.writeStream.format("memory").queryName(sink)
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    # update-mode emits one row per user per batch; keep the last state
    # per user (single batch here, but be robust to multi-batch replay).
    tbl = spark.table(sink)
    # keep the LAST emission per user (the row with max n_events) —
    # independent per-column maxes could pair values from different
    # emissions when total_value is non-monotone (negative values)
    return tbl.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
    )


@register(
    "stream_static_join",
    oracle=None,  # streaming; equality with the batch join is asserted
    # in tests/test_streaming.py.
    tags=("streaming", "join"),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: enrich the event stream with a static
    dimension (customer-as-user-profile) — the feature-lookup shape.
    The static side re-reads per micro-batch and broadcasts; no state
    is kept, so this scales to unbounded streams for free."""
    from mapreducewordcounting_spark.catalog import load_table

    ev = read_events_stream(spark, sf_dir)
    profile = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"))
    enriched = (
        ev.join(F.broadcast(profile), "user_id", "left")
        .groupBy("segment", "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    return run_available_now(enriched)


def _interval_joined_stream(spark: SparkSession, sf_dir: str, how: str,
                            cols: tuple = ("e_id", "p_id", "e_user"),
                            ) -> DataFrame:
    """The (errors x preceding-10-min purchases) interval join all
    stream-stream join queries share — ONE definition of the sides, the
    watermarks, and the condition, so the inner and outer variants can
    never drift apart (the outer tests assert their matched rows equal
    the inner result, which requires exactly this). ``cols`` widens the
    projection for the full-outer form, whose purchase-only rows need
    p_user (e_user is NULL there)."""
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("p_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "30 minutes")
    )
    errors = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(F.col("event_id").alias("e_id"),
                F.col("user_id").alias("e_user"),
                F.col("ts").alias("e_ts"))
        .withWatermark("e_ts", "30 minutes")
    )
    return errors.join(
        purchases,
        (F.col("e_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("e_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("p_ts") < F.col("e_ts")),
        how,
    ).select(*cols)


@register(
    "stream_stream_join",
    oracle=None,  # streaming; equality with the equivalent batch
    # interval join asserted in tests/test_streaming.py.
    tags=("streaming", "join", "stream-stream"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each error event matched to the
    same user's purchases in the preceding 10 minutes. Both sides carry
    watermarks, and the join condition bounds event-time distance, so
    each side's state buffer is capped at (watermark + interval) — the
    two requirements that make an unbounded×unbounded join feasible."""
    joined = _interval_joined_stream(spark, sf_dir, "inner")
    sink = f"mrwc_ssj_{uuid.uuid4().hex[:8]}"
    # A two-sided stream join keeps FOUR state stores per shuffle
    # partition; at 32 partitions the fixed per-store setup cost
    # dominated this fixture (measured 7.6 s → 2.6 s median at 4).
    with _stream_partitions(spark):
        q = (joined.writeStream.format("memory").queryName(sink)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
    return spark.table(sink)


@register(
    "stream_stream_outer_join",
    oracle=None,  # streaming; equality with the oracled batch twin
    # (stream_outer_join_batch_twin) asserted in tests/test_streaming.py.
    tags=("streaming", "join", "stream-stream", "outer"),
)
def stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join — the semantics the inner
    join (stream_stream_join) cannot give: every error event appears,
    with NULL purchase columns when no same-user purchase preceded it
    within 10 minutes. The interesting part is WHEN the NULL row can be
    emitted: only once the joint watermark guarantees no matching
    purchase can still arrive — i.e. state eviction, not match failure,
    produces the outer row. Under the deterministic AvailableNow replay
    the emission rule is exact (verified against batch on the fixture):
    a NULL row appears iff ``e_ts < min(max(p_ts), max(e_ts)) - 30min``
    (the joint watermark is the MIN of the two inputs' watermarks —
    multipleWatermarkPolicy default); matched rows appear regardless.
    The batch twin (stream_outer_join_batch_twin) states that rule in
    one SQL expression and is DuckDB-oracled, so the eviction semantics
    themselves are externally checked.

    Scale: same bounded-state argument as the inner join — watermarks
    on both sides plus an event-time-bounded condition cap each side's
    buffer at (watermark horizon + interval); the outer rows add no
    state, they are emitted exactly at eviction."""
    joined = _interval_joined_stream(spark, sf_dir, "leftOuter")
    sink = f"mrwc_ossj_{uuid.uuid4().hex[:8]}"
    with _stream_partitions(spark):
        q = (joined.writeStream.format("memory").queryName(sink)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
    return spark.table(sink)


@register(
    "stream_outer_join_batch_twin",
    oracle="""
        WITH ev AS (
            SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                   user_id, event_type
            FROM events),
        p AS (SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
              FROM ev WHERE event_type = 'purchase'),
        e AS (SELECT event_id AS e_id, user_id AS e_user, ts AS e_ts
              FROM ev WHERE event_type = 'error'),
        wm AS (SELECT least((SELECT max(p_ts) FROM p),
                            (SELECT max(e_ts) FROM e))
                      - INTERVAL 30 MINUTE AS cut)
        SELECT e.e_id, p.p_id, e.e_user
        FROM e
        LEFT JOIN p
          ON e.e_user = p.p_user
         AND p.p_ts >= e.e_ts - INTERVAL 10 MINUTE
         AND p.p_ts < e.e_ts
        CROSS JOIN wm
        WHERE p.p_id IS NOT NULL OR e.e_ts < wm.cut
    """,
    tags=("streaming", "batch-twin", "join", "outer"),
)
def stream_outer_join_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch statement of stream_stream_outer_join's emission rule,
    DuckDB-oracled: all matched (error, purchase) interval pairs, plus
    a NULL row for every unmatched error whose event time the joint
    watermark has passed (``e_ts < min(max(p_ts), max(e_ts)) - 30min``
    — the MIN is Spark's default multipleWatermarkPolicy across the two
    inputs). tests/test_streaming.py asserts the streaming result
    equals this twin row-for-row under AvailableNow replay, so the
    state-eviction semantics are pinned by an externally-checked query
    rather than trusted. The oracle casts ns-parquet event times to
    µs TIMESTAMP — the same truncation Spark applies — so interval
    comparisons agree at the bit level; no raw timestamps appear in
    the OUTPUT (driver-hash precision discipline).

    Scale shape: one fact scan feeds both sides and the 1-row
    watermark aggregate (broadcast); the interval join is the same
    (user, time-bounded) equi+residual join as the streaming form."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"))
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"))
    wm = ev.agg(
        (F.least(F.max(F.when(F.col("event_type") == "purchase",
                              F.col("ts"))),
                 F.max(F.when(F.col("event_type") == "error",
                              F.col("ts"))))
         - F.expr("INTERVAL 30 MINUTES")).alias("cut"))
    return (
        e.join(
            p,
            (F.col("e_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("e_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("p_ts") < F.col("e_ts")),
            "left")
        .crossJoin(F.broadcast(wm))
        .filter(F.col("p_id").isNotNull() | (F.col("e_ts") < F.col("cut")))
        .select("e_id", "p_id", "e_user")
    )


@register(
    "stream_stream_full_outer_join",
    oracle=None,  # streaming; equality with the oracled batch twin
    # (stream_full_outer_join_batch_twin) asserted in
    # tests/test_streaming.py.
    tags=("streaming", "join", "stream-stream", "outer", "full"),
)
def stream_stream_full_outer_join(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """FULL OUTER stream-stream interval join — completes the engine's
    stream-stream matrix (inner / left outer / full outer): every
    error AND every purchase appears, NULL-padded on whichever side
    found no interval match. Each side's NULL row is emitted at state
    EVICTION, and the two sides evict at different event times
    because the interval condition is asymmetric: an error at e_ts
    can only match purchases at p_ts ∈ [e_ts−10min, e_ts), so the
    error side needs no future input once the joint watermark passes
    e_ts itself, while a purchase at p_ts can still match errors up
    to e_ts = p_ts+10min — its NULL row waits 10 minutes longer.
    The batch twin (stream_full_outer_join_batch_twin) states both
    cutoffs in one SQL expression and is DuckDB-oracled;
    tests/test_streaming.py asserts stream == twin row-for-row and
    matched == inner.

    Scale: identical bounded-state argument to the inner join —
    watermarks both sides + the time-bounded condition cap both
    buffers; outer rows add no state."""
    joined = _interval_joined_stream(
        spark, sf_dir, "fullOuter",
        cols=("e_id", "p_id", "e_user", "p_user"))
    sink = f"mrwc_fossj_{uuid.uuid4().hex[:8]}"
    with _stream_partitions(spark):
        q = (joined.writeStream.format("memory").queryName(sink)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
    return spark.table(sink)


@register(
    "stream_full_outer_join_batch_twin",
    oracle="""
        WITH ev AS (
            SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                   user_id, event_type
            FROM events),
        p AS (SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
              FROM ev WHERE event_type = 'purchase'),
        e AS (SELECT event_id AS e_id, user_id AS e_user, ts AS e_ts
              FROM ev WHERE event_type = 'error'),
        wm AS (SELECT least((SELECT max(p_ts) FROM p),
                            (SELECT max(e_ts) FROM e))
                      - INTERVAL 30 MINUTE AS cut)
        SELECT e.e_id, p.p_id, e.e_user, p.p_user
        FROM e
        FULL OUTER JOIN p
          ON e.e_user = p.p_user
         AND p.p_ts >= e.e_ts - INTERVAL 10 MINUTE
         AND p.p_ts < e.e_ts
        CROSS JOIN wm
        WHERE (e.e_id IS NOT NULL AND p.p_id IS NOT NULL)
           OR (p.p_id IS NULL AND e.e_ts < wm.cut)
           OR (e.e_id IS NULL
               AND p.p_ts + INTERVAL 10 MINUTE < wm.cut)
    """,
    tags=("streaming", "batch-twin", "join", "outer", "full"),
)
def stream_full_outer_join_batch_twin(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Batch statement of stream_stream_full_outer_join's emission
    rule, DuckDB-oracled: all matched interval pairs, plus a NULL-
    purchase row for every unmatched error the joint watermark passed
    (``e_ts < cut``), plus a NULL-error row for every unmatched
    purchase whose LAST possible match time the watermark passed
    (``p_ts + 10min < cut`` — the asymmetry is the join condition's:
    future errors can match a buffered purchase for another interval
    length, so purchase state must outlive error state by exactly the
    interval). cut = min(max p_ts, max e_ts) − 30min, Spark's default
    MIN multipleWatermarkPolicy. tests/test_streaming.py asserts the
    streaming result equals this twin row-for-row under AvailableNow
    replay. No raw timestamps in the output (driver-hash precision
    discipline; the oracle casts ns→µs like Spark).

    Scale shape: one fact scan feeds both sides and the 1-row
    watermark aggregate (broadcast); the interval join is the same
    (user, time-bounded) equi+residual join as the streaming form."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"))
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"))
    wm = ev.agg(
        (F.least(F.max(F.when(F.col("event_type") == "purchase",
                              F.col("ts"))),
                 F.max(F.when(F.col("event_type") == "error",
                              F.col("ts"))))
         - F.expr("INTERVAL 30 MINUTES")).alias("cut"))
    return (
        e.join(
            p,
            (F.col("e_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("e_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("p_ts") < F.col("e_ts")),
            "full_outer")
        .crossJoin(F.broadcast(wm))
        .filter(
            (F.col("e_id").isNotNull() & F.col("p_id").isNotNull())
            | (F.col("p_id").isNull() & (F.col("e_ts") < F.col("cut")))
            | (F.col("e_id").isNull()
               & (F.col("p_ts") + F.expr("INTERVAL 10 MINUTES")
                  < F.col("cut"))))
        .select("e_id", "p_id", "e_user", "p_user")
    )


@register(
    "stream_incremental_ingest",
    oracle=None,  # foreachBatch side-effecting pipeline; invariants
    # (kept == distinct content hashes == batch-dedup answer,
    # idempotent across arrival chunks) in tests/test_streaming.py.
    tags=("streaming", "foreachBatch", "dedup", "ingest"),
)
def stream_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus ingestion — the training-data loop: documents
    arrive in chunks, each micro-batch is exact-deduped within itself
    and anti-joined against the accumulated store on content hash, and
    only novel content is appended. ``foreachBatch`` is the escape
    hatch that lets a stream run arbitrary batch relational logic per
    micro-batch with exactly-once bookkeeping from the checkpoint.

    Returns (n_kept, n_distinct) of the final store — equal iff the
    merge is correct, and arrival-order-invariant (which per-doc row
    survives depends on chunk order; the *count* of distinct contents
    does not, so this is the deterministic surface).

    Scale: the anti-join probes the store on its hash key — with the
    store bucketed/partitioned by hash prefix this is a pruned probe,
    not a full scan; on a real lakehouse this exact pattern is
    ``MERGE INTO ... WHEN NOT MATCHED INSERT`` on a Delta/Iceberg
    table, with the same join underneath."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="mrwc_ingest_")
    src_dir = os.path.join(tmp, "arrivals")
    store = os.path.join(tmp, "store")
    try:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source",
            F.sha2("text", 256).alias("content_hash"))
        # stage the corpus as 4 arrival chunks
        docs.repartition(4).write.parquet(src_dir)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

        def merge(batch: DataFrame, _batch_id: int) -> None:
            fresh = batch.dropDuplicates(["content_hash"])
            if os.path.isdir(store):
                seen = batch.sparkSession.read.parquet(store).select(
                    "content_hash")
                fresh = fresh.join(seen, "content_hash", "leftanti")
            fresh.write.mode("append").parquet(store)

        with _stream_partitions(spark):
            q = (stream.writeStream.foreachBatch(merge)
                 .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination()
        final = spark.read.parquet(store)
        result = final.agg(
            F.count("*").alias("n_kept"),
            F.count_distinct("content_hash").alias("n_distinct"))
        rows = result.collect()  # materialize before tmp cleanup
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# transformWithStateInPandas (Spark 4's typed-state successor to
# applyInPandasWithState) — RETIRED as a registered operator (VERDICT
# r7 item 5, decided r8). The Python<->JVM state-server wire protocol
# imports the google.protobuf RUNTIME, which this container's frozen
# environment lacks and the build rules forbid installing; vendoring
# ~10k LoC of third-party runtime to light up one operator would dwarf
# it and muddy the copy-check surface. The engine's SUPPORTED custom-
# stateful surface is ``applyInPandasWithState``
# (``stream_stateful_counter`` above — externally green since r5, with
# a batch-twin equivalence test); its semantics are a superset of what
# the retired query demonstrated (per-key running aggregate). A
# deployment wanting the typed-state API can express the same Counter
# as a StatefulProcessor with a getValueState handle — a mechanical
# port documented in SURVEY.md §2.2 — without any engine change here.
# History: the gated implementation lived at this spot r3-r7
# (git log -S stream_transform_with_state).


@register(
    "stream_partitioned_sink",
    # Deterministic under availableNow full replay, so this streaming
    # query is fully oracle-checked — same oracle as the batch
    # sink_partitioned_prune (operators/io_roundtrip.py).
    oracle="""
        SELECT user_id % 8 AS user_bucket,
               count(*) AS n_events,
               CAST(sum(user_id) AS BIGINT) AS sum_user,
               min(value) AS min_value,
               max(value) AS max_value,
               CAST(extract(epoch FROM date_trunc('second', min(ts))) AS BIGINT)
                   AS first_ts_s,
               CAST(extract(epoch FROM date_trunc('second', max(ts))) AS BIGINT)
                   AS last_ts_s
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY user_id % 8
    """,
    tags=("streaming", "sink", "partitioning"),
)
def stream_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest into a Hive-partitioned parquet store: the
    events stream passes through (append mode, no pre-aggregation) into
    ``writeStream.partitionBy(event_type)`` with exactly-once file
    bookkeeping from the checkpoint, then the store is read BACK as a
    pruned batch scan (PartitionFilters, like its batch twin
    ``sink_partitioned_prune``). This is the standing shape of a
    continuously-ingesting 100 TB corpus: the stream lays data out by
    partition key at write time so every later batch reader prunes;
    the checkpoint (not the sink) is what makes restarts exactly-once.
    Result rows are materialized before the scratch dir is removed."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="mrwc_psink_")
    store = os.path.join(tmp, "store")
    try:
        ev = read_events_stream(spark, sf_dir)
        with _stream_partitions(spark):
            q = (
                ev.writeStream.format("parquet")
                .partitionBy("event_type")
                .option("path", store)
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        back = spark.read.schema(ev.schema).parquet(store).filter(
            F.col("event_type") == "purchase")
        result = back.groupBy(
            (F.col("user_id") % 8).alias("user_bucket"),
        ).agg(
            F.count("*").alias("n_events"),
            F.sum("user_id").alias("sum_user"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            # Second-truncated epoch integers (SURVEY §7.3): raw-µs
            # comparison is encoding-sensitive across engines/fixture
            # generations; second truncation is stable and the sink
            # semantics under test don't live in the µs.
            F.unix_timestamp(F.date_trunc("second", F.min("ts")))
                .alias("first_ts_s"),
            F.unix_timestamp(F.date_trunc("second", F.max("ts")))
                .alias("last_ts_s"),
        )
        rows = result.collect()  # materialize before tmp cleanup
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "stream_foreachbatch_compact",
    # Deterministic under availableNow replay: batch BOUNDARIES vary
    # with file-split planning, but the union of all batch ledgers is
    # exactly the source rows, and keep-latest is computed over that
    # union — so the oracle is the batch keep-latest over events.
    oracle="""
        WITH ranked AS (
            SELECT user_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC)
                       AS rn
            FROM events)
        SELECT event_type,
               count(*) AS n_users,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS latest_value_sum
        FROM ranked WHERE rn = 1
        GROUP BY event_type
    """,
    tags=("streaming", "foreachBatch", "compaction"),
)
def stream_foreachbatch_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``foreachBatch`` — the micro-batch escape hatch that lets a
    stream drive ARBITRARY batch sinks — in its canonical idempotent
    shape: each micro-batch appends to a batch-id-keyed ledger
    directory (``batch=<id>``; a replayed batch OVERWRITES its own
    directory, so retries after crash never duplicate — idempotence
    comes from the deterministic batch id, exactly-once from id +
    overwrite), and consumers run MERGE-ON-READ keep-latest over the
    ledger (the WindowGroupLimit compaction of ``compact_keep_latest``).

    This is the parquet-only upsert pattern: without a transactional
    table format a foreachBatch can't atomically rewrite a keyed store,
    so the stream appends immutably and compaction moves to read time
    (or a periodic ``layout_compact_files`` pass). State stays bounded:
    the writer holds NO keyed state at all — the keep-latest state
    lives in the ledger itself."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    tmp = tempfile.mkdtemp(prefix="mrwc_febatch_")
    ledger = os.path.join(tmp, "ledger")
    try:
        ev = read_events_stream(spark, sf_dir).select(
            "event_id", "ts", "user_id", "event_type", "value")
        schema = ev.schema

        def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
            # overwrite-own-directory => idempotent on replay
            batch_df.write.mode("overwrite").parquet(
                os.path.join(ledger, f"batch={batch_id}"))

        with _stream_partitions(spark):
            q = (
                ev.writeStream.foreachBatch(sink_batch)
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        if not os.path.isdir(ledger):  # zero-row source: no batches ran
            return spark.createDataFrame(
                [], "event_type STRING, n_users BIGINT, "
                    "latest_value_sum DOUBLE")
        union = spark.read.schema(schema).option(
            "recursiveFileLookup", True).parquet(ledger)
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id"))
        latest = (union.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1))
        result = latest.groupBy("event_type").agg(
            F.count("*").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("latest_value_sum"))
        rows = result.collect()  # materialize before tmp cleanup
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


#: session gap for the stateful sessionizer (µs / ms views)
SESSION_GAP_US = 600_000_000
SESSION_GAP_MS = SESSION_GAP_US // 1000


@register(
    "stream_stateful_session_gap",
    oracle=None,  # streaming; equality with the oracled batch twin
    # (stream_session_gap_batch_twin) asserted in tests/test_streaming.py.
    tags=("streaming", "stateful", "session", "timeout"),
)
def stream_stateful_session_gap(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Custom stateful SESSIONIZATION with EVENT-TIME TIMEOUT — the
    applyInPandasWithState surface stream_stateful_counter does not
    exercise: per-user gap sessions (10 min) kept in explicit state,
    CLOSED sessions emitted as data arrives, and the final open
    session emitted by the TIMEOUT path (``state.hasTimedOut``) when
    the event-time watermark passes session_end + gap — i.e. state
    eviction is the emitter, exactly the built-in session window's
    semantics re-implemented on the custom-state API (which is what
    bespoke session logic — carried attributes, dynamic gaps — needs).
    A trailing session the final watermark never passes stays in
    state and is NOT emitted; the oracled batch twin states that rule.

    Scale: state per key is one (start, end, n) triple; the timeout
    registration is O(1) per batch; the shuffle is the stream's
    (user_id) state-store exchange, same as any keyed stateful op."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = read_events_stream(spark, sf_dir)

    out_schema = ("user_id LONG, session_start_us LONG, "
                  "session_end_us LONG, n_events LONG")
    state_schema = "s LONG, e LONG, n LONG"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [key[0]],
                                "session_start_us": [s],
                                "session_end_us": [e],
                                "n_events": [n]})
            return
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()
        cur = list(state.get) if state.exists else None
        closed = []
        for t in ts_us:
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] > SESSION_GAP_US:
                closed.append(cur)
                cur = [t, t, 1]
            else:
                cur[1] = t
                cur[2] += 1
        state.update(tuple(cur))
        state.setTimeoutTimestamp(cur[1] // 1000 + SESSION_GAP_MS)
        yield pd.DataFrame({
            "user_id": [key[0]] * len(closed),
            "session_start_us": [c[0] for c in closed],
            "session_end_us": [c[1] for c in closed],
            "n_events": [c[2] for c in closed],
        })

    sessions = (
        ev.withWatermark("ts", "30 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    sink = f"mrwc_sess_{uuid.uuid4().hex[:8]}"
    q = (sessions.writeStream.format("memory").queryName(sink)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(sink)


@register(
    "stream_session_gap_batch_twin",
    oracle=f"""
        WITH ev AS (
            SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
                   event_id
            FROM events),
        marked AS (
            SELECT user_id, t, event_id,
                   CASE WHEN t - lag(t) OVER w > {SESSION_GAP_US}
                        OR lag(t) OVER w IS NULL
                        THEN 1 ELSE 0 END AS is_start
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        sess AS (
            SELECT user_id, t,
                   sum(is_start) OVER (PARTITION BY user_id
                       ORDER BY t, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sid
            FROM marked),
        agg AS (
            SELECT user_id, sid,
                   min(t) AS session_start_us,
                   max(t) AS session_end_us,
                   count(*) AS n_events,
                   max(max(t)) OVER (PARTITION BY user_id) AS user_last
            FROM sess GROUP BY user_id, sid),
        wm AS (SELECT max(t) - 1800000000 AS cut FROM ev)
        SELECT user_id, session_start_us, session_end_us, n_events
        FROM agg CROSS JOIN wm
        WHERE session_end_us < user_last
           OR session_end_us + {SESSION_GAP_US} < wm.cut
    """,
    tags=("streaming", "batch-twin", "session", "timeout"),
)
def stream_session_gap_batch_twin(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Batch statement of stream_stateful_session_gap's emission rule,
    DuckDB-oracled: gap-sessionize per user (lag + cumulative
    is_start), then a session emits iff it CLOSED IN-DATA (a later
    same-user event exists: session_end < the user's last event time)
    or its TIMEOUT fired (session_end + gap < the final event-time
    watermark, max(ts) − 30 min). The trailing session of a user whose
    timeout the watermark never passes is withheld — exactly the
    state the streaming query still holds at shutdown.
    tests/test_streaming.py asserts stream == twin row-for-row under
    AvailableNow replay, pinning the custom-state timeout semantics
    to an externally checked query. Timestamps surface as epoch µs
    (driver-hash precision discipline)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t"), "event_id")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    marked = ev.select(
        "user_id", "t", "event_id",
        F.when(F.lag("t").over(w).isNull()
               | (F.col("t") - F.lag("t").over(w) > SESSION_GAP_US),
               1).otherwise(0).alias("is_start"))
    # Cumulative window tie-breaks on (t, event_id) like the marking
    # window and the streaming sessionizer, so a duplicate (user_id,
    # ts) at a session boundary cannot make membership order-dependent
    # (ADVICE r8).
    w_cum = (Window.partitionBy("user_id").orderBy("t", "event_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sess = marked.withColumn("sid", F.sum("is_start").over(w_cum))
    agg = (sess.groupBy("user_id", "sid")
           .agg(F.min("t").alias("session_start_us"),
                F.max("t").alias("session_end_us"),
                F.count("*").alias("n_events")))
    w_user = Window.partitionBy("user_id")
    agg = agg.withColumn("user_last",
                         F.max("session_end_us").over(w_user))
    wm = load_table(spark, sf_dir, "events").agg(
        (F.max(F.unix_micros("ts")) - 1_800_000_000).alias("cut"))
    return (
        agg.crossJoin(F.broadcast(wm))
        .filter((F.col("session_end_us") < F.col("user_last"))
                | (F.col("session_end_us") + SESSION_GAP_US
                   < F.col("cut")))
        .select("user_id", "session_start_us", "session_end_us",
                "n_events")
    )
