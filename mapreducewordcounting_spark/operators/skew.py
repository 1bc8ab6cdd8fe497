"""Skew mitigation: salted join (SURVEY.md §4.2 — the systematic fix
for the reference's measured reducer skew, where the hand-rolled
``hv*3*c*11 mod 4`` hash sent ~69% of uniform keys to one reducer,
sendFileByFile.cpp:314-319).

Spark's first line of defense is AQE skew-join splitting (on in
session.py). ``salted_join`` is the *manual* technique for when a key
is so hot that even AQE's split partitions overwhelm single tasks:
explode the small side S ways, salt the big side uniformly, join on
(key, salt) — the hot key's rows spread across S tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.functions.numeric import dsum, net_price
from mapreducewordcounting_spark.registry import register


def salted_join(big: DataFrame, small: DataFrame, big_key: str,
                small_key: str, salt: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join with an S-way salt: ``big`` rows get a uniform salt in
    [0, S); ``small`` rows replicate S times (one per salt value). The
    join key becomes (key, salt), so one hot key occupies S shuffle
    partitions instead of one. Cost: small side inflates S× — use only
    when small really is small (it is about to be shuffled S times).

    The salt is derived deterministically (hash of the big side's whole
    row via xxhash64 of the key + a per-row uniform from ``rand`` would
    be nondeterministic across retries — a correctness hazard under
    task re-execution; monotonically_increasing_id has the same issue,
    so we hash the key and a secondary column when provided).
    """
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(big_key),
                                   F.spark_partition_id()), F.lit(salt)))
    small_exploded = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    joined = big_salted.join(
        small_exploded,
        (big_salted[big_key] == small_exploded[small_key])
        & (big_salted["_salt"] == small_exploded["_salt"]),
        how,
    )
    return joined.drop("_salt")


@register(
    "join_salted",
    oracle="""
        SELECT n.n_name,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                        (CAST('1.00' AS DECIMAL(3,2)) -
                         CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS revenue,
               count(*) AS n_items
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    tags=("skew", "join", "salted"),
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join — identical semantics to the plain join
    (the oracle is the plain SQL), different physical distribution:
    the supplier key space spreads over 8 salt buckets. On this
    uniform fixture it's pure overhead; on a skewed 100 TB key it is
    the difference between one straggler task and S even ones."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    salted = salted_join(li, s, "l_suppkey", "s_suppkey", salt=8)
    return (
        salted.join(F.broadcast(n), salted.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            dsum(net_price()).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "skew_key_histogram",
    oracle="""
        WITH freq AS (
            SELECT l_partkey, count(*) AS cnt
            FROM lineitem GROUP BY l_partkey
        )
        SELECT length(printf('%b', cnt)) - 1 AS freq_bucket,
               count(*) AS n_keys,
               min(cnt) AS min_freq,
               max(cnt) AS max_freq,
               CAST(sum(cnt) AS BIGINT) AS rows_covered
        FROM freq
        GROUP BY freq_bucket
    """,
    tags=("skew", "diagnostics", "histogram"),
)
def skew_key_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostic: the log2 frequency histogram of a join/
    aggregation key (here lineitem.l_partkey). Bucket b holds keys with
    2^b ≤ freq < 2^(b+1); ``rows_covered`` shows where the shuffle
    volume concentrates. This is the query you run BEFORE choosing
    between a plain shuffle join, AQE skew splitting, and manual
    salting (:func:`join_salted`): a heavy tail (rows concentrated in
    the top buckets) means salt; a flat histogram means don't pay the
    salting overhead.

    Scale: two map-side-combinable aggregations — the first keyed by
    the diagnosed key (same shuffle the real query would do, so its
    cost predicts the real cost), the second on ≤64 buckets. The log2
    bucket is computed with exact integer ops (binary-string length,
    not float log2) so the result is engine-portable bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    bucket = (F.length(F.conv(F.col("cnt").cast("string"), 10, 2)) - 1)
    return (
        freq.groupBy(bucket.cast("long").alias("freq_bucket"))
        .agg(F.count("*").alias("n_keys"),
             F.min("cnt").alias("min_freq"),
             F.max("cnt").alias("max_freq"),
             F.sum("cnt").alias("rows_covered"))
    )
