"""Change-data-capture-shaped operators: MERGE-style upsert and SCD2
(slowly-changing-dimension type 2) interval construction.

No reference counterpart (the reference has no notion of mutation —
one batch query, sendFileByFile.cpp:447-498). These are the patterns a
warehouse layer runs on top of the engine: upsert = full-outer join +
coalesce (the relational core of MERGE INTO, which Spark itself only
exposes through table formats like Delta/Iceberg — the join is the
part that matters at 100 TB), and SCD2 = gaps-and-islands over a
change log (lag-compare → running change count → island aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.registry import register


@register(
    "merge_upsert_customers",
    oracle="""
        WITH base AS (
            SELECT c_custkey, c_acctbal, c_mktsegment
            FROM customer WHERE c_acctbal > 0),
        delta AS (
            SELECT o_custkey,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS urgent_total
            FROM orders WHERE o_orderpriority = '1-URGENT'
            GROUP BY o_custkey)
        SELECT coalesce(b.c_custkey, d.o_custkey) AS c_custkey,
               coalesce(b.c_acctbal, 0.0) + coalesce(d.urgent_total, 0.0)
                   AS new_acctbal,
               coalesce(b.c_mktsegment, 'NEW') AS c_mktsegment,
               CASE WHEN b.c_custkey IS NULL THEN 'insert'
                    WHEN d.o_custkey IS NULL THEN 'keep'
                    ELSE 'update' END AS merge_action
        FROM base b FULL OUTER JOIN delta d ON b.c_custkey = d.o_custkey
    """,
    tags=("cdc", "merge", "upsert", "outer-join"),
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as a relational expression: base rows
    matched by the delta are updated (balance += urgent order total),
    unmatched delta keys are inserted with defaults, unmatched base
    rows pass through — one full-outer join + coalesce, with the
    action tagged per row. At 100 TB both sides hash-partition on the
    key (the delta is usually far smaller — AQE picks the broadcast
    side when it fits); the exact-decimal delta sum keeps the updated
    balance engine-stable."""
    base = (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_acctbal") > 0)
            .select("c_custkey", "c_acctbal", "c_mktsegment"))
    delta = (load_table(spark, sf_dir, "orders")
             .filter(F.col("o_orderpriority") == "1-URGENT")
             .groupBy("o_custkey")
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("double").alias("urgent_total")))
    action = (F.when(base.c_custkey.isNull(), "insert")
              .when(delta.o_custkey.isNull(), "keep")
              .otherwise("update"))
    return (
        base.join(delta, base.c_custkey == delta.o_custkey, "full_outer")
        .select(
            F.coalesce(base.c_custkey, delta.o_custkey).alias("c_custkey"),
            (F.coalesce(base.c_acctbal, F.lit(0.0))
             + F.coalesce(delta.urgent_total, F.lit(0.0)))
            .alias("new_acctbal"),
            F.coalesce(base.c_mktsegment, F.lit("NEW")).alias("c_mktsegment"),
            action.alias("merge_action"))
    )


@register(
    "scd2_event_intervals",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id,
                   date_trunc('second', ts) AS ts_s,
                   event_type
            FROM events),
        m AS (
            SELECT *,
                   CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                        THEN 1 ELSE 0 END AS chg
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        i AS (
            SELECT *,
                   CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
            FROM m)
        SELECT user_id, event_type, island,
               epoch_us(min(ts_s)) AS valid_from_us,
               epoch_us(max(ts_s)) AS valid_to_us,
               count(*)  AS n_events
        FROM i
        GROUP BY user_id, event_type, island
    """,
    tags=("cdc", "scd2", "window", "gaps-and-islands"),
)
def scd2_event_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history from a change log: collapse each user's event
    stream into intervals of constant event_type (gaps-and-islands:
    lag-compare flags changes, a running sum numbers the islands, the
    island aggregate yields valid_from/valid_to). Two window passes
    over the same (user_id, ts) sort — Catalyst reuses one sort/one
    exchange for both — then a groupBy that is co-partitioned with it.
    ts truncates to seconds (ns parquet vs µs Spark, FIXTURES.md);
    event_id tiebreaks equal timestamps so island numbering is
    deterministic in both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.date_trunc("second", "ts").alias("ts_s"), "event_type")
    return (
        scd2_islands(ev, "user_id", "ts_s", "event_id", "event_type")
        .select("user_id", "event_type", "island",
                F.unix_micros("valid_from").alias("valid_from_us"),
                F.unix_micros("valid_to").alias("valid_to_us"),
                "n_events")
    )


def scd2_islands(ev, key: str, ts_col: str, tiebreak: str,
                 value_col: str):
    """Library form of the gaps-and-islands collapse (the registered
    query instantiates it on the events table; the hypothesis
    differential in tests/test_hypothesis_graph.py drives it with
    arbitrary change logs, since the DuckDB oracle mirrors this same
    lag + running-sum construction and would share a construction
    bug). Returns one row per (key, value, island) with
    valid_from/valid_to (the min/max ``ts_col`` of the island, both
    typed as the input) and n_events. The ``tiebreak`` column makes
    island numbering deterministic at equal timestamps; NULL values
    compare via null-safe equality (a NULL→NULL step is NOT a
    change)."""
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    chg = F.when(
        ~F.lag(value_col).over(w).eqNullSafe(F.col(value_col)), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("chg", chg)
        .withColumn("island", F.sum("chg").over(run).cast("long"))
        .groupBy(key, value_col, "island")
        .agg(F.min(ts_col).alias("valid_from"),
             F.max(ts_col).alias("valid_to"),
             F.count("*").alias("n_events"))
    )


@register(
    "compact_keep_latest",
    oracle="""
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM (SELECT user_id, event_id, event_type, ts,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
    """,
    tags=("cdc", "compaction", "window"),
)
def compact_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log compaction: latest record per key — the read-side collapse
    of an append-only change log (what Kafka compaction / Delta MERGE
    materialize; here as a pure engine operator). Tie-break on
    event_id so the winner is deterministic even with equal
    timestamps.

    Scale: one shuffle on the key, and the window is a
    ``row_number() = 1`` filter — Spark rewrites that to a per-key
    top-1 (WindowGroupLimit pushes the limit below the sort), so state
    per key is O(1), not O(history). This is THE pattern for 100 TB
    event logs; the anti-pattern it replaces is groupBy(max(ts)) +
    self-join, which shuffles the log twice."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type",
                F.unix_micros("ts").alias("ts_us"))
    )


@register(
    "mv_incremental_refresh",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
               epoch_us(max(ts)) AS latest_ts_us
        FROM events
        GROUP BY event_type
    """,
    tags=("cdc", "materialized-view", "incremental"),
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the stored view keeps
    ALGEBRAIC partial states (count, decimal sum, max), so refreshing
    on a delta batch is partial-agg(delta) ⊎ stored-states → re-agg on
    the group key — the base facts are never rescanned. Here the fixture
    plays both roles (event_id % 10 splits base from delta) and the
    oracle aggregates the whole table, proving merged-states ==
    recomputed-from-scratch. Every aggregate must be algebraic (sum,
    count, min/max, or sum-of-parts forms like avg = Σv/Σn); holistic
    aggregates (exact median/distinct) don't merge — store a sketch
    (HLL/KLL partials union the same way) or pay the full rescan.
    At 100 TB this is THE pattern behind hourly-refresh dashboards:
    refresh cost tracks |delta|, not |history|; the merge shuffles
    |groups| + |delta-groups| rows, nothing more. Decimal sums make the
    merge order-insensitive (float partials would drift per topology)."""
    ev = load_table(spark, sf_dir, "events")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
            F.max("ts").alias("latest_ts"),
        )

    base = partials(ev.filter(F.col("event_id") % 10 != 0))   # stored view
    delta = partials(ev.filter(F.col("event_id") % 10 == 0))  # new batch
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").cast("double").alias("total_value"),
            F.unix_micros(F.max("latest_ts")).alias("latest_ts_us"),
        )
    )


@register(
    "join_pit_versioned_dim",
    oracle="""
        SELECT e.event_id, e.user_id,
               CASE WHEN v.cnt = 0 THEN NULL ELSE v.cnt END AS version_no,
               CASE WHEN v.cnt = 0 THEN NULL
                    WHEN v.cnt = 1 THEN 'bronze'
                    WHEN v.cnt = 2 THEN 'silver'
                    ELSE 'gold' END AS tier,
               (SELECT epoch_us(max(s.ts)) FROM events s
                WHERE s.user_id = e.user_id AND s.event_type = 'signup'
                  AND s.ts <= e.ts) AS since_us
        FROM events e,
             LATERAL (SELECT count(*) AS cnt FROM events s
                      WHERE s.user_id = e.user_id
                        AND s.event_type = 'signup'
                        AND s.ts <= e.ts) v
        WHERE e.event_type = 'purchase'
    """,
    tags=("cdc", "join", "point-in-time", "feature-store"),
)
def join_pit_versioned_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join against a versioned dimension — the
    feature-store primitive that prevents training-label leakage: each
    purchase reads the dimension version (here: a loyalty tier that
    bumps on every signup event) that was valid AT ITS TIMESTAMP,
    never a later one. join_asof carries one timestamp; this carries
    the WHOLE version payload, by forward-filling a STRUCT through
    the union-window: versions and probes union-tag, sort once per
    user, and ``last(struct, ignorenulls)`` carries
    (version_no, tier, since) — still ONE exchange on user_id however
    many versions or probes a key has, where the naive form is a
    per-probe correlated scan (the oracle) or an interval join.
    Probes before any version get NULLs — the honest cold-start
    answer, not a leaked future version."""
    ev = load_table(spark, sf_dir, "events")
    w_ver = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = (
        ev.filter(F.col("event_type") == "signup")
        .withColumn("version_no", F.row_number().over(w_ver))
        .select(
            "user_id", "ts", "event_id", F.lit(0).alias("side"),
            F.struct(
                F.col("version_no"),
                F.when(F.col("version_no") == 1, "bronze")
                .when(F.col("version_no") == 2, "silver")
                .otherwise("gold").alias("tier"),
                F.unix_micros("ts").alias("since_us"),
            ).alias("ver"),
        )
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("side"),
        F.lit(None).cast(versions.schema["ver"].dataType).alias("ver"))
    # side=0 sorts first at equal ts → a version effective exactly at
    # the probe instant is visible (inclusive, matches the oracle's <=)
    w = (Window.partitionBy("user_id").orderBy("ts", "side", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = probes.unionByName(versions).withColumn(
        "cur", F.last(F.when(F.col("side") == 0, F.col("ver")),
                      ignorenulls=True).over(w))
    return (
        carried.filter(F.col("side") == 1)
        .select(
            "event_id", "user_id",
            F.col("cur.version_no").alias("version_no"),
            F.col("cur.tier").alias("tier"),
            F.col("cur.since_us").alias("since_us"),
        )
    )


#: snapshot_diff_audit's deterministic delta spec (shared INPUT
#: construction, like every fixture-derived query — the algorithm
#: under test is the diff itself): B drops key%13==0, bumps acctbal
#: by +100.0 for key%7==0 survivors, and appends key%17==0 rows
#: re-keyed +10M (collision-free at any fixture SF).
_DIFF_DROP_MOD = 13
_DIFF_BUMP_MOD = 7
_DIFF_ADD_MOD = 17
_DIFF_KEY_OFFSET = 10_000_000


@register(
    "snapshot_diff_audit",
    oracle=f"""
        WITH a AS (
            SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
        b AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % {_DIFF_BUMP_MOD} = 0
                        THEN c_acctbal + 100.0 ELSE c_acctbal END
                       AS c_acctbal,
                   c_mktsegment
            FROM customer WHERE c_custkey % {_DIFF_DROP_MOD} <> 0
            UNION ALL
            SELECT c_custkey + {_DIFF_KEY_OFFSET}, c_acctbal, c_mktsegment
            FROM customer WHERE c_custkey % {_DIFF_ADD_MOD} = 0),
        lab AS (
            SELECT coalesce(a.c_mktsegment, b.c_mktsegment)
                       AS c_mktsegment,
                   CASE WHEN a.c_custkey IS NULL THEN 'added'
                        WHEN b.c_custkey IS NULL THEN 'removed'
                        WHEN a.c_acctbal IS DISTINCT FROM b.c_acctbal
                             OR a.c_mktsegment
                                IS DISTINCT FROM b.c_mktsegment
                        THEN 'changed'
                        ELSE 'unchanged' END AS st
            FROM a FULL JOIN b ON a.c_custkey = b.c_custkey)
        SELECT c_mktsegment,
               count(*) FILTER (WHERE st = 'added')     AS n_added,
               count(*) FILTER (WHERE st = 'removed')   AS n_removed,
               count(*) FILTER (WHERE st = 'changed')   AS n_changed,
               count(*) FILTER (WHERE st = 'unchanged') AS n_unchanged
        FROM lab GROUP BY 1
    """,
    tags=("cdc", "diff", "reconciliation", "audit"),
)
def snapshot_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level reconciliation between two table snapshots — the
    audit that backs every "did the nightly rebuild change what we
    expected?" question: per segment, how many rows were added,
    removed, changed (any tracked column differs, null-safely), or
    untouched. Snapshot B is derived deterministically from A (delta
    spec in ``_DIFF_*`` above) so the query is oracle-checkable; in
    production A and B are two table versions and everything from the
    full-outer join down is unchanged.

    Shape: ONE full-outer join on the key + one aggregate — both
    snapshots hash-partition on the key, so at 100 TB this is the
    same two-exchange plan as ``merge_upsert_customers``, and change
    detection stays columnar (no row-Python). The +100.0 double add
    is a single IEEE op, bit-identical in both engines; presence is
    tracked with explicit indicator columns, not NULL-ness of data
    columns (a NULL acctbal in a present row must not read as
    absence)."""
    a = (load_table(spark, sf_dir, "customer")
         .select("c_custkey", "c_acctbal", "c_mktsegment"))
    key = F.col("c_custkey")
    b = (
        a.filter(key % _DIFF_DROP_MOD != 0)
        .select(
            "c_custkey",
            F.when(key % _DIFF_BUMP_MOD == 0, F.col("c_acctbal") + 100.0)
            .otherwise(F.col("c_acctbal")).alias("c_acctbal"),
            "c_mktsegment")
        .unionByName(
            a.filter(key % _DIFF_ADD_MOD == 0)
            .select((key + _DIFF_KEY_OFFSET).alias("c_custkey"),
                    "c_acctbal", "c_mktsegment"))
    )
    left = a.select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("a_bal"),
        F.col("c_mktsegment").alias("a_seg"),
        F.lit(1).alias("in_a"))
    right = b.select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("b_bal"),
        F.col("c_mktsegment").alias("b_seg"),
        F.lit(1).alias("in_b"))
    d = left.join(right, "k", "full_outer")
    st = (
        F.when(F.col("in_a").isNull(), "added")
        .when(F.col("in_b").isNull(), "removed")
        .when(~F.col("a_bal").eqNullSafe(F.col("b_bal"))
              | ~F.col("a_seg").eqNullSafe(F.col("b_seg")), "changed")
        .otherwise("unchanged"))
    return (
        d.select(F.coalesce("a_seg", "b_seg").alias("c_mktsegment"),
                 st.alias("st"))
        .groupBy("c_mktsegment")
        .agg(*[F.count(F.when(F.col("st") == s, 1)).alias(f"n_{s}")
               for s in ("added", "removed", "changed", "unchanged")])
    )
