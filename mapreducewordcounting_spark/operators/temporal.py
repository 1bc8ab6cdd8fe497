"""Temporal join operators: as-of, range, multi-resolution rollup
(SURVEY.md §2.2 "Joins" extension row — the events-table operators a
time-series/feature-store workload needs; none exist in the reference,
which has no temporal type at all, §1.2).

Each operator pairs a *scalable composition* (what runs at 100 TB)
with a declarative oracle that states the semantics:

- **as-of join**: the naive form is a correlated max-subquery (the
  oracle). The scalable form used here is the union-window trick: tag
  both sides, union, one window pass per user carrying the last right-
  side timestamp forward — one shuffle on user_id, no per-row probe.
- **range join**: the naive form is an inequality join (the oracle) —
  O(n·m) per key. The scalable form buckets time into range-sized
  cells and joins on (user, cell ∈ {b-1, b}) before the exact filter —
  fan-out bounded at 2 buckets instead of the whole key history.
- **multi-res rollup**: minute/hour/day aggregates in ONE scan via
  GROUPING SETS (the "hypertable rollup" shape), not three passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.registry import register


@register(
    "join_asof",
    oracle="""
        SELECT e.event_id,
               e.user_id,
               epoch_us(e.ts) AS purchase_us,
               (SELECT epoch_us(max(s.ts)) FROM events s
                WHERE s.user_id = e.user_id
                  AND s.event_type = 'signup'
                  AND s.ts <= e.ts) AS last_signup_us
        FROM events e
        WHERE e.event_type = 'purchase'
    """,
    tags=("temporal", "join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    signup at-or-before it. Implementation = union-window (tag sides,
    sort by (ts, tag) within user, carry last signup ts forward with
    ``last(..., ignorenulls)``): one exchange on user_id total,
    regardless of how many right-side rows each key has. The
    correlated-subquery oracle is the semantics; it would be a
    per-row probe at scale."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("side"))
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.lit(None).cast("long").alias("event_id"), "user_id", "ts",
        F.lit(0).alias("side"))
    # side=0 sorts first at equal ts → signup at the same instant counts
    # (inclusive as-of, matching the oracle's <=)
    tagged = purchases.unionByName(signups)
    w = (Window.partitionBy("user_id").orderBy("ts", "side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = tagged.withColumn(
        "last_signup_ts",
        F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True).over(w))
    return (
        carried.filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("purchase_us"),
            F.unix_micros("last_signup_ts").alias("last_signup_us"),
        )
    )


@register(
    "join_range",
    oracle="""
        SELECT e.event_id,
               count(p.event_id) AS n_prior_5min
        FROM events e
        LEFT JOIN events p
          ON p.user_id = e.user_id
         AND p.ts >= e.ts - INTERVAL 5 MINUTE
         AND p.ts < e.ts
        WHERE e.event_type = 'error'
        GROUP BY e.event_id
    """,
    tags=("temporal", "join", "range"),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per error event, how many of the same user's events
    fell in the preceding 5 minutes. Implementation = bucketed range
    join: both sides keyed by (user, ⌊ts/5min⌋); each error probes its
    own bucket and the previous one, then the exact interval filter
    runs on ≤2 buckets of candidates — never the user's whole history.
    (The oracle's raw inequality join IS the naive plan Spark would
    pick for the same predicate.)"""
    ev = load_table(spark, sf_dir, "events")
    bucket = lambda c: F.floor(F.unix_micros(c) / F.lit(300_000_000))  # noqa: E731

    errors = (ev.filter(F.col("event_type") == "error")
              .select(F.col("event_id").alias("e_id"),
                      F.col("user_id").alias("e_user"),
                      F.col("ts").alias("e_ts")))
    probe = errors.withColumn(
        "bkt", F.explode(F.array(bucket(F.col("e_ts")) - 1,
                                 bucket(F.col("e_ts")))))
    cand = ev.select(F.col("event_id").alias("p_id"),
                     F.col("user_id").alias("p_user"),
                     F.col("ts").alias("p_ts")).withColumn(
        "bkt", bucket(F.col("p_ts")))
    joined = probe.join(
        cand,
        (F.col("e_user") == F.col("p_user")) & (probe.bkt == cand.bkt)
        & (F.col("p_ts") >= F.col("e_ts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("p_ts") < F.col("e_ts")),
        "left",
    )
    return (
        joined.groupBy(F.col("e_id").alias("event_id"))
        .agg(F.count("p_id").alias("n_prior_5min"))
    )


@register(
    "time_rollup_multires",
    oracle="""
        SELECT epoch_us(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS day_us,
               CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                    THEN epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP))
               END AS hour_us,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY GROUPING SETS (
            (date_trunc('day', ts), date_trunc('hour', ts)),
            (date_trunc('day', ts))
        )
    """,
    tags=("temporal", "rollup", "hypertable"),
)
def time_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hourly AND daily rollups
    in one scan + one Expand (GROUPING SETS), instead of one pass per
    resolution. At 100 TB this halves (or better) the scan cost of
    maintaining a rollup ladder; finer→coarser reuse would go through
    a materialized hourly table."""
    ev = load_table(spark, sf_dir, "events")
    ev.select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    ).createOrReplaceTempView("ev_res")
    return spark.sql("""
        SELECT unix_micros(day) AS day_us,
               CASE WHEN GROUPING(hour) = 0 THEN unix_micros(hour) END
                   AS hour_us,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM ev_res
        GROUP BY GROUPING SETS ((day, hour), (day))
    """)


@register(
    "anomaly_zscore",
    oracle="""
        WITH stats AS (
            SELECT event_type,
                   avg(value) AS mu,
                   stddev_samp(value) AS sigma
            FROM events
            GROUP BY event_type
        )
        SELECT e.event_id,
               e.event_type,
               round((e.value - s.mu) / s.sigma, 6) AS zscore
        FROM events e JOIN stats s USING (event_type)
        WHERE abs((e.value - s.mu) / s.sigma) > 2.5
    """,
    tags=("temporal", "anomaly", "stats"),
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical anomaly detection: per-event-type z-score, flag
    |z| > 2.5. Two aggregates over a broadcast stats table — the
    monitoring query that runs after every ingest batch. The stats
    table is |event_type| rows, so the re-join is broadcast and the
    fact table is scanned twice at most (once for stats, once to
    score); at 100 TB the stats come from the previous rollup instead.
    """
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.5)
        .select("event_id", "event_type", F.round(z, 6).alias("zscore"))
    )


@register(
    "time_resample_ffill",
    oracle="""
        WITH daily AS (
            SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                   value,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('day', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events),
        closes AS (SELECT user_id, day, value FROM daily WHERE rn = 1),
        bounds AS (
            SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS mn,
                   CAST(max(date_trunc('day', ts)) AS DATE) AS mx
            FROM events),
        days AS (
            SELECT CAST(unnest(generate_series(mn, mx,
                                               INTERVAL 1 DAY)) AS DATE)
                       AS day
            FROM bounds WHERE mn IS NOT NULL),
        grid AS (
            SELECT u.user_id, d.day
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN days d)
        SELECT g.user_id, g.day,
               last_value(c.value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS close_value,
               (c.value IS NULL) AS was_gap
        FROM grid g
        LEFT JOIN closes c ON g.user_id = c.user_id AND g.day = c.day
    """,
    tags=("temporal", "resample", "ffill", "gapfill"),
)
def time_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's event stream onto a daily grid and
    FORWARD-FILL gaps with the last observed daily close — the
    time-series normalization every downstream join/model expects
    (as-of joins, feature windows, charting). Distinct from
    time_gapfill_weekly (which zero-fills counts): ffill carries the
    last OBSERVATION through gaps, which needs the IGNORE NULLS
    window frame, not coalesce.

    Scale structure: daily closes come from the keep-latest idiom
    (row_number = 1 per (user, day) — WindowGroupLimit map-side
    pruning); the calendar is one 1-row bounds aggregate exploded to
    |days| rows and broadcast against distinct users, so the grid is
    |users|×|days| — a SIZE POLICY, independent of event volume. The
    fill itself is one window pass over the grid with
    ``last(value, ignorenulls=True)`` and a rows-unbounded-preceding
    frame: per-partition streaming state of exactly one value. Days
    before a user's first event stay NULL (nothing to carry)."""
    return _daily_grid_closes(
        load_table(spark, sf_dir, "events")).select(
        "user_id", "day",
        F.last("value", ignorenulls=True).over(
            Window.partitionBy("user_id").orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("close_value"),
        F.col("value").isNull().alias("was_gap"),
    )


def _daily_grid_closes(ev: DataFrame) -> DataFrame:
    """``(user_id, day, value)`` over the dense |users|×|days| daily
    grid, ``value`` = that user's last event value that day (NULL on
    gap days) — the shared resample front half of time_resample_ffill
    and time_interpolate_linear. Daily closes use the keep-latest
    idiom (row_number = 1 per (user, day), WindowGroupLimit map-side
    pruning); the calendar is a 1-row bounds aggregate exploded and
    broadcast against distinct users."""
    ev = ev.select("user_id", "ts", "value", "event_id")
    day = F.date_trunc("day", "ts").cast("date")
    closes = (
        ev.select("user_id", day.alias("day"), "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("user_id", "day")
            .orderBy(F.desc("ts"), F.desc("event_id"))))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "value")
    )
    bounds = ev.agg(F.min(day).alias("mn"), F.max(day).alias("mx"))
    days = bounds.filter(F.col("mn").isNotNull()).select(
        F.explode(F.sequence("mn", "mx")).alias("day"))
    users = ev.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(days))
    return grid.join(closes, ["user_id", "day"], "left")


#: shared DuckDB CTE block producing the same (user_id, day, value)
#: dense grid as _daily_grid_closes (the resample oracles' front half)
_SQL_DAILY_GRID = """
        daily AS (
            SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                   value,
                   row_number() OVER (
                       PARTITION BY user_id, date_trunc('day', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events),
        closes AS (SELECT user_id, day, value FROM daily WHERE rn = 1),
        bounds AS (
            SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS mn,
                   CAST(max(date_trunc('day', ts)) AS DATE) AS mx
            FROM events),
        days AS (
            SELECT CAST(unnest(generate_series(mn, mx,
                                               INTERVAL 1 DAY)) AS DATE)
                       AS day
            FROM bounds WHERE mn IS NOT NULL),
        grid AS (
            SELECT u.user_id, d.day
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN days d),
        dense AS (
            SELECT g.user_id, g.day, c.value
            FROM grid g
            LEFT JOIN closes c ON g.user_id = c.user_id AND g.day = c.day)
"""


@register(
    "time_interpolate_linear",
    oracle=f"""
        WITH {_SQL_DAILY_GRID},
        anchored AS (
            SELECT user_id, day, value,
                   last_value(value IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS prev_val,
                   last_value(CASE WHEN value IS NOT NULL THEN day END
                              IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS prev_day,
                   first_value(value IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS next_val,
                   first_value(CASE WHEN value IS NOT NULL THEN day END
                               IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS next_day
            FROM dense)
        SELECT user_id, day,
               round(CASE
                   WHEN value IS NOT NULL THEN value
                   WHEN prev_val IS NOT NULL AND next_val IS NOT NULL
                   THEN prev_val + (next_val - prev_val)
                        * (CAST(day - prev_day AS DOUBLE)
                           / CAST(next_day - prev_day AS DOUBLE))
                   END, 6) AS value_interp,
               CASE WHEN value IS NOT NULL THEN 'obs'
                    WHEN prev_val IS NOT NULL AND next_val IS NOT NULL
                    THEN 'interp'
                    ELSE 'edge' END AS fill_kind
        FROM anchored
    """,
    tags=("temporal", "resample", "interpolate"),
)
def time_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's event stream onto the daily grid and
    LINEARLY INTERPOLATE interior gaps between the surrounding daily
    closes (pandas ``interpolate('linear')`` semantics on a
    distributed grid) — the fill you want for continuous quantities
    (sensor readings, balances, rates) where ffill's step function
    biases everything downstream toward the stale side. Leading /
    trailing gaps have only one anchor and stay NULL, tagged 'edge'
    (no extrapolation); observed days pass through as 'obs'.

    Interpolation weight = (day − prev_day) / (next_day − prev_day)
    on integer day distances; the value is rounded at 6 per the
    engine-boundary float discipline (the arithmetic is a fixed
    4-op IEEE tree, but rounding keeps the contract uniform with the
    rest of the temporal family).

    Scale structure: _daily_grid_closes' keep-latest + broadcast
    calendar (a SIZE POLICY — |users|×|days| regardless of event
    volume), then exactly TWO window passes over the grid sharing one
    (user_id) exchange and sort: the backward pass carries
    (prev_val, prev_day), the forward pass (next_val, next_day) —
    constant per-partition streaming state, no self-join against the
    observation table. Spark evaluates both frame directions over the
    same Sort + Exchange (plan-asserted in tests/test_plans.py)."""
    w_prev = (Window.partitionBy("user_id").orderBy("day")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_next = (Window.partitionBy("user_id").orderBy("day")
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    obs_day = F.when(F.col("value").isNotNull(), F.col("day"))
    anchored = _daily_grid_closes(
        load_table(spark, sf_dir, "events")).select(
        "user_id", "day", "value",
        F.last("value", ignorenulls=True).over(w_prev).alias("prev_val"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("prev_day"),
        F.first("value", ignorenulls=True).over(w_next).alias("next_val"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("next_day"),
    )
    interior = F.col("prev_val").isNotNull() & F.col("next_val").isNotNull()
    interp = (
        F.when(F.col("value").isNotNull(), F.col("value"))
        .when(interior,
              F.col("prev_val") + (F.col("next_val") - F.col("prev_val"))
              * (F.datediff("day", "prev_day").cast("double")
                 / F.datediff("next_day", "prev_day").cast("double")))
    )
    fill_kind = (
        F.when(F.col("value").isNotNull(), F.lit("obs"))
        .when(interior, F.lit("interp"))
        .otherwise(F.lit("edge"))
    )
    return anchored.select(
        "user_id", "day",
        F.round(interp, 6).alias("value_interp"),
        fill_kind.alias("fill_kind"),
    )


@register(
    "join_asof_tolerance",
    oracle="""
        SELECT e.event_id,
               e.user_id,
               epoch_us(e.ts) AS purchase_us,
               (SELECT epoch_us(max(s.ts)) FROM events s
                WHERE s.user_id = e.user_id
                  AND s.event_type = 'signup'
                  AND s.ts <= e.ts
                  AND s.ts > e.ts - INTERVAL 24 HOUR) AS signup_within_24h_us
        FROM events e
        WHERE e.event_type = 'purchase'
    """,
    tags=("temporal", "join", "asof", "tolerance"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS BOUND — the production variant of
    join_asof: a match older than the tolerance (24 h here) is no
    match at all (``merge_asof(tolerance=...)`` semantics). Joining
    sensor readings, quotes, or feature snapshots without a bound
    silently propagates arbitrarily stale state; with the bound, the
    staleness policy is part of the operator, and the NULLs it emits
    are the monitoring signal.

    Same union-window single-exchange structure as join_asof — the
    tolerance is ONE additional codegen'd comparison on the carried
    timestamp, not a different join: still one shuffle on user_id,
    per-key state still O(1)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("side"))
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.lit(None).cast("long").alias("event_id"), "user_id", "ts",
        F.lit(0).alias("side"))
    tagged = purchases.unionByName(signups)
    w = (Window.partitionBy("user_id").orderBy("ts", "side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = tagged.withColumn(
        "last_signup_ts",
        F.last(F.when(F.col("side") == 0, F.col("ts")),
               ignorenulls=True).over(w))
    within = (F.col("last_signup_ts")
              > F.col("ts") - F.expr("INTERVAL 24 HOURS"))
    return (
        carried.filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("purchase_us"),
            F.when(within, F.unix_micros("last_signup_ts"))
            .alias("signup_within_24h_us"),
        )
    )


@register(
    "window_rolling_zscore",
    oracle="""
        WITH framed AS (
            SELECT event_id, user_id, value,
                   row_number() OVER w AS rn,
                   avg(value) OVER (w ROWS BETWEEN 20 PRECEDING
                                    AND 1 PRECEDING) AS mu,
                   stddev_samp(value) OVER (w ROWS BETWEEN 20 PRECEDING
                                            AND 1 PRECEDING) AS sigma
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT event_id, user_id,
               round((value - mu) / sigma, 6) AS zscore
        FROM framed
        WHERE rn > 20 AND sigma > 0
          AND abs(round((value - mu) / sigma, 6)) > 2.0
    """,
    tags=("temporal", "anomaly", "window", "rolling"),
)
def window_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING anomaly detection: each event scored against its own
    user's trailing 20 observations (exclusive of itself — the frame
    ends at 1 PRECEDING, so the tested value never contaminates its
    baseline). The global-stats variant (anomaly_zscore) misses
    level-shifted users and regime changes; the rolling frame adapts
    per key and is the streaming-adjacent form (the same frame becomes
    bounded state in a stateful stream).

    One shuffle on user_id; mean and std are frame-bounded window
    aggregates (O(frame) state per key). Warm-up rows (rn ≤ 20) and
    zero-variance frames emit nothing — a cold-start policy stated in
    the operator, not left to NaN propagation. The >2σ cut applies to
    the ROUNDED score (engine-boundary discipline: frame sums may
    differ in the last ulp between engines' accumulation orders)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-20, -1)
    scored = ev.select(
        "event_id", "user_id",
        F.row_number().over(w).alias("rn"),
        ((F.col("value") - F.avg("value").over(frame))
         / F.stddev_samp("value").over(frame)).alias("z"),
        F.stddev_samp("value").over(frame).alias("sigma"),
    )
    return (
        scored.filter((F.col("rn") > 20) & (F.col("sigma") > 0)
                      & (F.abs(F.round("z", 6)) > 2.0))
        .select("event_id", "user_id", F.round("z", 6).alias("zscore"))
    )


#: deterministic synthetic transit time (days) for shipment intervals:
#: the fixture lineitem has no receipt date, so the interval end is a
#: pure function of the row (1 + quantity mod 14), reproducible on any
#: engine — which is what keeps the interval operators oracle-checkable.
_TRANSIT_SQL = "(1 + CAST(l_quantity AS INT) % 14)"


def _intervals_sql(key: str) -> str:
    return f"""
        SELECT {key},
               l_orderkey, l_linenumber,
               CAST(l_shipdate AS DATE) AS s,
               CAST(l_shipdate AS DATE) + to_days({_TRANSIT_SQL}) AS e
        FROM lineitem
    """


def _intervals_spark(li, key: str):
    dur = (F.lit(1) + F.col("l_quantity").cast("int") % 14)
    s = F.col("l_shipdate").cast("date")
    return li.select(
        key, "l_orderkey", "l_linenumber",
        s.alias("s"), F.date_add(s, dur).alias("e"))


#: time-cell width for the interval join's sub-bucketing. Must be ≥
#: the max synthesized transit (14 days, _intervals_spark) only for
#: the ≤2-cells-per-interval replication bound — correctness holds for
#: any width (``sequence(start_cell, end_cell)`` covers every cell the
#: interval touches).
INTERVAL_CELL_DAYS = 16
#: cell-grid anchor; any date ≤ min(s) works (floor handles negatives
#: anyway) — pinned for deterministic cell ids across engines/reruns.
_INTERVAL_EPOCH = "1992-01-01"


def interval_overlap_pairs(iv: DataFrame, key: str, order_cols,
                           cell_days: int = INTERVAL_CELL_DAYS,
                           epoch: str = _INTERVAL_EPOCH) -> DataFrame:
    """Library form of the interval-overlap join (the registered query
    is one instantiation; the hypothesis differential in
    tests/test_hypothesis_temporal.py drives it with arbitrary
    intervals, including spans wider than a cell).

    ``iv`` must carry ``key``, the ``order_cols`` (a lexicographic
    row identity), and DATE columns ``s``/``e`` (inclusive interval).
    Returns one row per unordered overlapping pair within the same
    key: the two identities (prefixed ``a_``/``b_``) + overlap_days.

    Plan: explode each interval to the ⌈span/cell⌉+1 coarse time cells
    it touches, equi-join on (key, cell) with the overlap test as a
    residual, and claim each pair exactly once — lexicographic
    ``order_cols`` orientation kills mirror duplicates, and the
    later-start-cell rule (``a.cell == cell(greatest(a.s, b.s))``)
    picks ONE of the shared cells: the later start lies inside both
    intervals iff they overlap, so exactly one claiming cell exists.
    Candidate volume is Σ per-(key,cell) rows², never Σ per-key rows²
    over the whole history."""
    d0 = F.lit(epoch).cast("date")
    cell_of = lambda c: F.floor(F.datediff(c, d0) / cell_days)  # noqa: E731
    ex = iv.withColumn(
        "cell", F.explode(F.sequence(cell_of(F.col("s")),
                                     cell_of(F.col("e")))))
    a, b = ex.alias("a"), ex.alias("b")
    lex = (F.struct(*[F.col(f"a.{c}") for c in order_cols])
           < F.struct(*[F.col(f"b.{c}") for c in order_cols]))
    later_start = F.greatest(F.col("a.s"), F.col("b.s"))
    pairs = a.join(
        b,
        (F.col(f"a.{key}") == F.col(f"b.{key}"))
        & (F.col("a.cell") == F.col("b.cell")) & lex
        & (F.col("a.s") <= F.col("b.e")) & (F.col("b.s") <= F.col("a.e"))
        & (F.col("a.cell") == cell_of(later_start)))
    overlap = F.datediff(
        F.least(F.col("a.e"), F.col("b.e")),
        F.greatest(F.col("a.s"), F.col("b.s"))) + 1
    return pairs.select(
        F.col(f"a.{key}").alias(key),
        *[F.col(f"a.{c}").alias(f"a_{c}") for c in order_cols],
        *[F.col(f"b.{c}").alias(f"b_{c}") for c in order_cols],
        overlap.alias("overlap_days"))


def interval_max_concurrency_sweep(iv: DataFrame, key: str) -> DataFrame:
    """Library form of the +1/−1 boundary sweep: peak number of
    simultaneously-active inclusive [s, e] DATE intervals per key.
    Two events per interval — +1 at s, −1 at e+1 (the first day the
    interval no longer occupies) — one window pass ordered by
    (date, delta ASC), max of the running sum. O(n log n) per key
    where the naive form is the O(n²) self-join.

    Tie order matters and must be ASC (ends before starts at the same
    date): the e+1 end marker already encodes inclusive occupancy, so
    an interval ending at day e and one starting at day e+1 share no
    day — processing the +1 first would momentarily count them both
    and report peak 2 for adjacent, non-overlapping intervals. That
    exact off-by-one shipped in r4 (both engines shared it, so the
    oracle stayed green) and was caught by the r5 hypothesis
    differential against a day-occupancy brute force
    (tests/test_hypothesis_temporal.py, counterexample
    [0,0],[1,1]). Within a run of equal (date, delta) events the
    running sum is monotonic, so group order cannot change the peak."""
    ev = (iv.select(key, F.col("s").alias("d"), F.lit(1).alias("delta"))
          .unionAll(iv.select(key, F.date_add("e", 1).alias("d"),
                              F.lit(-1).alias("delta"))))
    w = (Window.partitionBy(key)
         .orderBy(F.col("d"), F.col("delta"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = ev.select(key, F.sum("delta").over(w).alias("inflight"))
    return run.groupBy(key).agg(
        F.max("inflight").cast("bigint").alias("max_inflight"))


@register(
    "join_interval_overlap",
    oracle=f"""
        WITH iv AS ({_intervals_sql('l_partkey')}),
        pairs AS (
            SELECT a.l_partkey,
                   date_diff('day',
                             greatest(a.s, b.s), least(a.e, b.e)) + 1
                       AS overlap_days
            FROM iv a JOIN iv b
              ON a.l_partkey = b.l_partkey
             AND (a.l_orderkey < b.l_orderkey
                  OR (a.l_orderkey = b.l_orderkey
                      AND a.l_linenumber < b.l_linenumber))
             AND a.s <= b.e AND b.s <= a.e)
        SELECT l_partkey % 100 AS part_bucket,
               count(*) AS n_pairs,
               CAST(sum(overlap_days) AS BIGINT) AS total_overlap_days,
               CAST(max(overlap_days) AS BIGINT) AS max_overlap_days
        FROM pairs
        GROUP BY 1
    """,
    tags=("join", "interval", "temporal"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join — the join shape Spark has no native
    operator for: find shipment windows of the SAME part that were
    in flight simultaneously (inclusive overlap: a.s <= b.e AND
    b.s <= a.e), the competing-shipments / double-booking query.

    Scalable form: equi-join on **(l_partkey, time-cell)** with the
    overlap test as a RESIDUAL predicate. Each interval explodes to
    the ≤2 coarse cells it touches (cell = 16 d ≥ max span 14 d), so
    the candidate space is Σ per-(key,cell) rows² — intervals of the
    same part that are far apart IN TIME never meet, which is what
    the plain per-key form (r4) could not avoid: its pair space was
    Σ per-key rows² across the whole 7-year history. Measured at
    sf0.1/local[32]: 1.87 s vs 4.14 s for the per-key form, identical
    output — and the gap widens with history length, since per-key
    candidates grow quadratically with rows-per-key while per-cell
    candidates stay bounded by rows-per-(key,cell)².

    Exactly-once emission needs two tie-breaks: the lexicographic
    (orderkey, linenumber) order (each unordered pair once), and —
    because a pair can co-occur in both of its cells — the pair is
    claimed only by the cell containing the LATER start
    (``a.cell == cell(greatest(a.s, b.s))``): if the intervals
    overlap, the later start lies inside both, so exactly one claimed
    cell exists. No distinct pass anywhere.

    Interval ends are synthesized (ship date + quantity-derived
    transit days) because the fixture carries no receipt date —
    deterministic, so the whole join is oracle-checked (the oracle
    stays the direct per-key formulation: same semantics, simplest
    correct SQL)."""
    li = load_table(spark, sf_dir, "lineitem")
    iv = _intervals_spark(li, "l_partkey")
    pairs = interval_overlap_pairs(
        iv, "l_partkey", ("l_orderkey", "l_linenumber"))
    return (pairs
            .select((F.col("l_partkey") % 100).alias("part_bucket"),
                    "overlap_days")
            .groupBy("part_bucket")
            .agg(F.count("*").alias("n_pairs"),
                 F.sum("overlap_days").cast("bigint")
                 .alias("total_overlap_days"),
                 F.max("overlap_days").cast("bigint")
                 .alias("max_overlap_days")))


@register(
    "interval_max_concurrency",
    oracle=f"""
        WITH iv AS ({_intervals_sql('l_suppkey')}),
        ev AS (
            SELECT l_suppkey, s AS d, 1 AS delta FROM iv
            UNION ALL
            SELECT l_suppkey, e + to_days(1), -1 FROM iv),
        run AS (
            SELECT l_suppkey,
                   sum(delta) OVER (
                       PARTITION BY l_suppkey
                       ORDER BY d, delta
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS inflight
            FROM ev),
        mx AS (
            SELECT l_suppkey, CAST(max(inflight) AS BIGINT) AS max_inflight
            FROM run GROUP BY 1),
        n AS (SELECT l_suppkey, count(*) AS n_shipments FROM iv GROUP BY 1)
        SELECT n.l_suppkey AS suppkey, n.n_shipments, mx.max_inflight
        FROM n JOIN mx USING (l_suppkey)
    """,
    tags=("interval", "temporal", "window"),
)
def interval_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum concurrent intervals per supplier (peak shipments in
    flight) via the +1/−1 boundary sweep — the O(n log n) answer to a
    question whose naive form is an interval self-join (O(n²) per
    key). Each interval contributes two boundary events (+1 at s, −1
    at e+1); a per-key running sum ordered by (date, delta ASC — ends
    before starts at the same date, see
    :func:`interval_max_concurrency_sweep` for why the r4 DESC order
    over-counted adjacent intervals) traces the occupancy curve, and
    its max is the answer. Within equal (date, delta) runs the sum is
    monotonic, so group order cannot change the peak.

    One shuffle on l_suppkey (events are 2 rows per shipment, window
    state is O(1)); the supplier-grain rollup and the count table
    reuse the same exchange. At 100 TB this is the occupancy /
    capacity-planning query (peak concurrent sessions, warehouse
    load, GPU-job overlap) — same sweep, any interval source."""
    li = load_table(spark, sf_dir, "lineitem")
    iv = _intervals_spark(li, "l_suppkey")
    mx = interval_max_concurrency_sweep(iv, "l_suppkey")
    n = iv.groupBy("l_suppkey").agg(F.count("*").alias("n_shipments"))
    return (n.join(mx, "l_suppkey")
            .select(F.col("l_suppkey").alias("suppkey"),
                    "n_shipments", "max_inflight"))


#: staleness bound for the nearest-direction as-of join (15 min in µs)
ASOF_NEAREST_TOL_US = 900_000_000


@register(
    "join_asof_nearest",
    oracle=f"""
        WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events WHERE event_type = 'error'),
        p AS (SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'purchase')
        SELECT e.event_id, e.user_id, t.p_id, t.delta_us,
               CASE WHEN t.p_id IS NULL THEN NULL
                    WHEN t.delta_us <= 0 THEN 'backward'
                    ELSE 'forward' END AS direction
        FROM e LEFT JOIN LATERAL (
            SELECT p.p_id,
                   epoch_us(p.ts) - epoch_us(e.ts) AS delta_us
            FROM p
            WHERE p.user_id = e.user_id
              AND abs(epoch_us(p.ts) - epoch_us(e.ts))
                  <= {ASOF_NEAREST_TOL_US}
            ORDER BY abs(epoch_us(p.ts) - epoch_us(e.ts)),
                     CASE WHEN epoch_us(p.ts) <= epoch_us(e.ts)
                          THEN 0 ELSE 1 END,
                     CASE WHEN epoch_us(p.ts) <= epoch_us(e.ts)
                          THEN -p.p_id ELSE p.p_id END
            LIMIT 1) t ON true
    """,
    tags=("temporal", "join", "asof", "nearest"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction (``merge_asof(direction=
    'nearest')``): each error matched to the same user's closest-in-
    time purchase within ±15 min, whichever side of the event it
    falls on — the lookup for 'what was this user doing around the
    failure'. Deterministic tie policy: equal distances prefer the
    BACKWARD match; among same-timestamp purchases the backward
    representative is the max p_id (the last the sort sees) and the
    forward one the min p_id — stated in the oracle's ORDER BY so
    both engines agree even on degenerate data. Unmatched errors
    surface with NULLs (the staleness-policy signal, as in
    join_asof_tolerance).

    Scale shape: the nearest purchase is necessarily the immediately
    PRECEDING or FOLLOWING one, so this is the union-window as-of
    idiom run in both frame directions over ONE (user_id) sort (the
    two frames batch into a single Window node, the
    time_interpolate_linear lesson): tag sides, carry
    struct(ts, id) with last-ignorenulls backward and
    first-ignorenulls forward, pick per row in a codegen'd CASE. One
    exchange total regardless of per-user history length; the
    oracle's per-row LATERAL probe is the semantics, not the plan."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", F.lit(1).alias("side"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(0).alias("side"))
    tagged = errors.unionByName(purchases)
    order = [F.col("ts"), F.col("side"), F.col("event_id")]
    w_back = (Window.partitionBy("user_id").orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_fwd = (Window.partitionBy("user_id").orderBy(*order)
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    p_struct = F.when(F.col("side") == 0,
                      F.struct(F.unix_micros("ts").alias("us"),
                               F.col("event_id").alias("p_id")))
    anchored = tagged.select(
        "event_id", "user_id", "ts", "side",
        F.last(p_struct, ignorenulls=True).over(w_back).alias("prev"),
        F.first(p_struct, ignorenulls=True).over(w_fwd).alias("next"),
    ).filter(F.col("side") == 1)
    e_us = F.unix_micros("ts")
    d_prev = e_us - F.col("prev.us")
    d_next = F.col("next.us") - e_us
    ok_prev = F.col("prev").isNotNull() & (d_prev <= ASOF_NEAREST_TOL_US)
    ok_next = F.col("next").isNotNull() & (d_next <= ASOF_NEAREST_TOL_US)
    use_prev = ok_prev & (~ok_next | (d_prev <= d_next))
    return anchored.select(
        "event_id", "user_id",
        F.when(use_prev, F.col("prev.p_id"))
        .when(ok_next, F.col("next.p_id")).alias("p_id"),
        F.when(use_prev, -d_prev)
        .when(ok_next, d_next).alias("delta_us"),
        F.when(use_prev, F.lit("backward"))
        .when(ok_next, F.lit("forward")).alias("direction"),
    )


@register(
    "fn_gaps_islands",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', ts) AS DATE) AS day
            FROM events),
        grp AS (
            SELECT user_id, day,
                   day - CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY day) AS INT)
                       AS anchor
            FROM days)
        SELECT user_id,
               min(day) AS island_start,
               max(day) AS island_end,
               count(*) AS n_days
        FROM grp
        GROUP BY user_id, anchor
    """,
    tags=("temporal", "gaps-islands", "window"),
)
def fn_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's maximal runs of CONSECUTIVE
    active days (streaks — the engagement metric product analytics
    reports, and the canonical SQL idiom for it): distinct active
    days, then the row_number subtraction trick — ``day − rank`` is
    constant exactly within a consecutive run — grouped to
    (start, end, length). Dates subtract to integer day counts on
    both engines, so the anchor is engine-exact.

    Scale shape: one exchange on user_id; the distinct, the ranking
    window, and the island aggregate all share that partitioning
    (AQE reuses the exchange), per-partition window state O(1). The
    anchor column never leaves the plan — the output is
    |islands|-grain."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.select(
        "user_id", "day",
        F.date_sub("day", F.row_number().over(w)).alias("anchor"))
    return (
        grp.groupBy("user_id", "anchor")
        .agg(F.min("day").alias("island_start"),
             F.max("day").alias("island_end"),
             F.count("*").alias("n_days"))
        .drop("anchor")
    )


@register(
    "time_ohlc_bars",
    oracle="""
        SELECT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n_events,
               round((min({'t': ts, 'e': event_id, 'v': value})).v, 6)
                   AS open,
               round(max(value), 6) AS high,
               round(min(value), 6) AS low,
               round((max({'t': ts, 'e': event_id, 'v': value})).v, 6)
                   AS close
        FROM events
        GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
    """,
    tags=("temporal", "ohlc", "resample", "aggregation"),
)
def time_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars per (user, day) — the canonical
    time-series downsample (open/high/low/close + volume proxy) every
    market-data / metrics engine ships. Open and close ride the
    min/max of a ``struct(ts, event_id, value)`` — lexicographic
    struct ordering IS the argmin/argmax with the (ts, event_id)
    tie-break built in, one ordinary map-side-combinable aggregate,
    no ranking window and no second pass (the keep-latest idiom's
    cheaper cousin when ONLY the extreme row's value is needed).

    Scale: one exchange on (user, day) with partial aggregation —
    OHLC state is four scalars + two small structs per group, so
    map-side combine collapses each partition to |groups| rows before
    the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    mark = F.struct(F.col("ts").alias("t"),
                    F.col("event_id").alias("e"),
                    F.col("value").alias("v"))
    return (
        ev.groupBy("user_id",
                   F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.min(mark)["v"], 6).alias("open"),
             F.round(F.max("value"), 6).alias("high"),
             F.round(F.min("value"), 6).alias("low"),
             F.round(F.max(mark)["v"], 6).alias("close"))
    )


@register(
    "time_seasonal_decompose",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, count(*) AS n
            FROM events GROUP BY 1),
        tr AS (
            SELECT day, n,
                   CASE WHEN count(*) OVER w7 = 7
                        THEN CAST(sum(n) OVER w7 AS DOUBLE) / 7
                   END AS trend
            FROM daily
            WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                                               AND 3 FOLLOWING)),
        det AS (
            SELECT day, n, trend, dayofweek(day) AS dow,
                   n - trend AS detrended
            FROM tr),
        seas AS (
            SELECT dow, avg(detrended) AS seasonal
            FROM det WHERE trend IS NOT NULL GROUP BY dow)
        SELECT d.day, CAST(d.n AS BIGINT) AS n,
               round(d.trend, 6) AS trend,
               round(s.seasonal, 6) AS seasonal,
               round(d.detrended - s.seasonal, 6) AS remainder
        FROM det d LEFT JOIN seas s USING (dow)
    """,
    tags=("temporal", "seasonal", "decomposition", "window"),
)
def time_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily event
    series — observed = trend + weekly seasonal + remainder (the
    moving-average construction of Macaulay 1931 / the 'decompose'
    step every anomaly monitor runs before alerting, so a Monday
    surge isn't flagged as drift): trend is the CENTERED 7-day moving
    average (NULL at the edges — never extrapolated, the
    time_interpolate_linear edge policy), weekly seasonality is the
    mean detrended value per day-of-week over interior days, and the
    remainder is what drift_psi_value / time_cusum_changepoint should
    actually be watching.

    Plan shape: one fact-scale aggregate to the DAY grain, then every
    window runs on the calendar-bounded grid (|days| rows — the
    dq_benford single-partition-window argument: a 100 TB year is
    still 365 rows here); the seasonal means are a ≤7-row aggregate
    broadcast back onto the grid. Determinism: trend = exact BIGINT
    frame sum / 7 (one division, no running float state); day-of-week
    labels differ across engines (Spark 1=Sun, DuckDB 0=Sun) but are
    internal grouping keys only — a bijection over the same partition
    of days (the profile_mutual_information precedent); the seasonal
    mean is a ≤|interior days|/7-term double sum rounded at 6."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy(F.to_date("ts").alias("day"))
             .agg(F.count("*").alias("n")))
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day", "n",
        F.when(F.count("*").over(w7) == 7,
               F.sum("n").over(w7).cast("double") / 7).alias("trend"))
    det = tr.select(
        "day", "n", "trend", F.dayofweek("day").alias("dow"),
        (F.col("n") - F.col("trend")).alias("detrended"))
    seas = (det.filter(F.col("trend").isNotNull())
            .groupBy("dow").agg(F.avg("detrended").alias("seasonal")))
    return (
        det.join(F.broadcast(seas), "dow", "left")
        .select("day", F.col("n").cast("bigint").alias("n"),
                F.round("trend", 6).alias("trend"),
                F.round("seasonal", 6).alias("seasonal"),
                F.round(F.col("detrended") - F.col("seasonal"), 6)
                .alias("remainder"))
    )


@register(
    "time_downsample_m4",
    oracle="""
        WITH ev AS (
            SELECT event_type,
                   date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS t,
                   event_id, value
            FROM events),
        pts AS (
            SELECT event_type, bucket,
                   min(value) AS v_min,
                   max(value) AS v_max,
                   count(*) AS n_points,
                   (min(struct_pack(a := t, b := event_id,
                                    c := value))).c AS v_first,
                   (max(struct_pack(a := t, b := event_id,
                                    c := value))).c AS v_last
            FROM ev GROUP BY 1, 2)
        SELECT event_type,
               CAST(extract(epoch FROM bucket) AS BIGINT) AS bucket_s,
               CAST(n_points AS BIGINT) AS n_points,
               v_first, v_min, v_max, v_last
        FROM pts
    """,
    tags=("temporal", "downsampling", "m4", "timeseries"),
)
def time_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014 — the
    width-aware reduction every monitoring dashboard runs before
    plotting): per (series, pixel-bucket) keep exactly the FOUR
    points that determine the rendered line — first, min, max, last —
    so a million-point series draws pixel-identically from a few
    hundred rows. Buckets here are hours per event_type; first/last
    ride the (t, event_id) arrival order via lexicographic struct
    min/max (the agg_argminmax idiom — no window, no sort), so the
    whole operator is ONE map-side-combinable aggregate.

    Determinism: values pass through untouched (no float arithmetic
    anywhere — min/max/first/last are selections, the probe_type
    double contract), counts are exact, and the struct tie-break on
    (t, event_id) is total. At 100 TB this is the canonical
    pre-aggregation shape: grid size = |series|·|buckets|, independent
    of point volume."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        F.unix_micros("ts").alias("t"),
        "event_id", "value")
    return (
        ev.groupBy("event_type", "bucket")
        .agg(F.count("*").cast("bigint").alias("n_points"),
             F.min(F.struct("t", "event_id", "value")).alias("fst"),
             F.max(F.struct("t", "event_id", "value")).alias("lst"),
             F.min("value").alias("v_min"),
             F.max("value").alias("v_max"))
        .select("event_type",
                # epoch seconds, not a raw TIMESTAMP: the portable
                # output-type contract (test_output_type_contract)
                F.unix_timestamp("bucket").cast("bigint")
                .alias("bucket_s"),
                "n_points",
                F.col("fst.value").alias("v_first"),
                "v_min", "v_max",
                F.col("lst.value").alias("v_last"))
    )
