"""Statistical aggregate coverage: second-moment aggregates
(stddev/variance/covariance/correlation), linear regression
aggregates, and explicit higher-moment (skewness/kurtosis) queries.

No reference counterpart — the reference's only aggregate is integer
sum (sendFileByFile.cpp:174-180); these are the built-in JVM-side
aggregates an analytics engine needs for data profiling, all
single-pass partial/final hash aggregates (one shuffle, map-side
combined, same plan shape as the reference's O8/O11 pipeline).

Oracle-parity notes: stddev_samp / var_samp / corr / covar_samp /
regr_* have identical definitions in Spark and DuckDB. skewness and
kurtosis do NOT (Spark returns population moments, DuckDB
bias-corrected sample moments), so the higher-moment query computes
the moments explicitly from sums — the same arithmetic both engines,
over small-magnitude columns (quantity/discount) so the 6-dp rounded
compare is far above double summation noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.registry import register


@register(
    "agg_stats_moments",
    oracle="""
        SELECT l_returnflag,
               stddev_samp(l_quantity)  AS sd_qty,
               var_samp(l_quantity)     AS var_qty,
               corr(l_quantity, l_discount)       AS corr_qty_disc,
               covar_samp(l_quantity, l_discount) AS covar_qty_disc,
               covar_pop(l_quantity, l_discount)  AS covar_pop_qty_disc,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment profile of lineitem per return flag — stddev,
    variance, correlation, covariance in one hash-aggregate pass.
    All are algebraic aggregates (finite sufficient statistics), so
    they partial-aggregate map-side and shuffle only 3-group states;
    at 100 TB the shuffle is O(groups), not O(rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.stddev_samp("l_quantity").alias("sd_qty"),
             F.var_samp("l_quantity").alias("var_qty"),
             F.corr("l_quantity", "l_discount").alias("corr_qty_disc"),
             F.covar_samp("l_quantity", "l_discount").alias("covar_qty_disc"),
             F.covar_pop("l_quantity", "l_discount").alias("covar_pop_qty_disc"),
             F.count("*").alias("n"))
    )


@register(
    "agg_regression",
    oracle="""
        SELECT l_returnflag,
               regr_slope(l_discount, l_quantity)     AS slope,
               regr_intercept(l_discount, l_quantity) AS intercept,
               regr_r2(l_discount, l_quantity)        AS r2,
               regr_count(l_discount, l_quantity)     AS n_pairs
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "stats", "regression"),
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit of discount on quantity via
    the SQL-standard regr_* aggregates — algebraic (sums of x, y, xy,
    x², y²), so the same one-shuffle partial/final plan as any sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.regr_slope("l_discount", "l_quantity").alias("slope"),
             F.regr_intercept("l_discount", "l_quantity").alias("intercept"),
             F.regr_r2("l_discount", "l_quantity").alias("r2"),
             F.regr_count("l_discount", "l_quantity").alias("n_pairs"))
    )


@register(
    "agg_higher_moments",
    oracle="""
        WITH m AS (
            SELECT l_returnflag,
                   avg(l_quantity) AS mu,
                   count(*)        AS n
            FROM lineitem GROUP BY l_returnflag)
        SELECT l.l_returnflag,
               avg(pow(l.l_quantity - m.mu, 2)) AS m2,
               avg(pow(l.l_quantity - m.mu, 3))
                   / pow(avg(pow(l.l_quantity - m.mu, 2)), 1.5) AS skew_pop,
               avg(pow(l.l_quantity - m.mu, 4))
                   / pow(avg(pow(l.l_quantity - m.mu, 2)), 2) - 3 AS kurt_excess
        FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
        GROUP BY l.l_returnflag
    """,
    tags=("agg", "stats", "moments"),
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of quantity per return
    flag, computed explicitly from central moments (two passes: mean,
    then powered deviations). Spark's built-in skewness/kurtosis and
    DuckDB's disagree on bias correction, so the engine-portable form
    IS the explicit moment arithmetic — identical expressions both
    sides. The mean side is 3 rows and broadcasts; both aggregations
    are map-side combined."""
    li = load_table(spark, sf_dir, "lineitem")
    m = (li.groupBy(F.col("l_returnflag").alias("mk"))
         .agg(F.avg("l_quantity").alias("mu")))
    d = F.col("l_quantity") - F.col("mu")
    return (
        li.join(F.broadcast(m), li.l_returnflag == F.col("mk"))
        .groupBy("l_returnflag")
        .agg(F.avg(F.pow(d, 2)).alias("m2"),
             (F.avg(F.pow(d, 3)) / F.pow(F.avg(F.pow(d, 2)), 1.5))
             .alias("skew_pop"),
             (F.avg(F.pow(d, 4)) / F.pow(F.avg(F.pow(d, 2)), 2) - 3)
             .alias("kurt_excess"))
    )


@register(
    "agg_winsorized_mean",
    oracle="""
        WITH q AS (
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.01) AS p01,
                   quantile_cont(l_extendedprice, 0.99) AS p99
            FROM lineitem GROUP BY l_returnflag)
        SELECT l.l_returnflag,
               count(*) AS n_lines,
               sum(CASE WHEN l.l_extendedprice < q.p01 THEN 1 ELSE 0 END)
                   AS n_clipped_low,
               sum(CASE WHEN l.l_extendedprice > q.p99 THEN 1 ELSE 0 END)
                   AS n_clipped_high,
               avg(least(greatest(l.l_extendedprice, q.p01), q.p99))
                   AS winsorized_mean
        FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
        GROUP BY l.l_returnflag
    """,
    tags=("stats", "percentile", "outliers"),
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean: clip each group's values to its own [p1, p99]
    band, then average — the outlier-robust location estimate a
    data-quality gate uses where a raw mean would follow one corrupt
    row. Two aggregates over the group key: the quantile pass produces
    a |groups|-row table broadcast back onto the fact scan, so the
    fact data shuffles once per pass and never self-joins. At 100 TB
    the quantile pass swaps to percentile_approx (same join shape,
    bounded memory)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = (
        li.groupBy("l_returnflag")
        .agg(F.percentile("l_extendedprice",
                          F.array(F.lit(0.01), F.lit(0.99))).alias("p"))
        .select("l_returnflag", F.col("p")[0].alias("p01"),
                F.col("p")[1].alias("p99"))
    )
    clipped = F.least(F.greatest(F.col("l_extendedprice"), F.col("p01")),
                      F.col("p99"))
    return (
        li.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_lines"),
             F.sum(F.when(F.col("l_extendedprice") < F.col("p01"), 1)
                   .otherwise(0)).alias("n_clipped_low"),
             F.sum(F.when(F.col("l_extendedprice") > F.col("p99"), 1)
                   .otherwise(0)).alias("n_clipped_high"),
             F.avg(clipped).alias("winsorized_mean"))
    )


@register(
    "agg_weighted_stats",
    oracle="""
        WITH s AS (
            SELECT p.p_brand,
                   sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS w,
                   sum(CAST(l.l_quantity AS DECIMAL(12,2))
                       * CAST(l.l_extendedprice AS DECIMAL(18,2))) AS wx,
                   sum(CAST(l.l_quantity AS DECIMAL(12,2))
                       * CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * CAST(l.l_extendedprice AS DECIMAL(18,2))) AS wx2
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand)
        SELECT p_brand,
               CAST(w AS DOUBLE) AS total_weight,
               round(CAST(wx AS DOUBLE) / CAST(w AS DOUBLE), 6)
                   AS weighted_mean,
               round(sqrt(CAST(wx2 AS DOUBLE) / CAST(w AS DOUBLE)
                     - (CAST(wx AS DOUBLE) / CAST(w AS DOUBLE))
                       * (CAST(wx AS DOUBLE) / CAST(w AS DOUBLE))), 6)
                   AS weighted_std
        FROM s
    """,
    tags=("stats", "weighted", "aggregation"),
)
def agg_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted mean and variance of price per brand — the
    weighted moments every sampling-corrected or exposure-weighted
    metric needs (plain avg() answers a different question when rows
    carry unequal weight). The sufficient statistics (Σw, Σwx, Σwx²)
    are EXACT DECIMAL sums — algebraic, order-independent, map-side
    combined — so the whole aggregate is one shuffle of three decimals
    per group and the only float ops are the final divisions and sqrt; the output is
    the weighted STDDEV (price-scaled) because the raw variance's
    ~1e9 magnitude exposes decimal-to-double conversion ulps at the
    6-digit rounding contract, while the stddev's ~1e4 scale does not (the functions/numeric.py discipline applied to
    second moments)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    w = F.col("l_quantity").cast("decimal(12,2)")
    x = F.col("l_extendedprice").cast("decimal(18,2)")
    s = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
         .groupBy("p_brand")
         .agg(F.sum(w).alias("w"),
              F.sum(w * x).alias("wx"),
              F.sum(w * x * x).alias("wx2")))
    dw = F.col("w").cast("double")
    mean = F.col("wx").cast("double") / dw
    return s.select(
        "p_brand",
        dw.alias("total_weight"),
        F.round(mean, 6).alias("weighted_mean"),
        F.round(F.sqrt(F.col("wx2").cast("double") / dw - mean * mean), 6)
        .alias("weighted_std"),
    )
