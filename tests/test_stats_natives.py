"""Structure-independent differentials for the closed-form stats
aggregates (ADVICE r5 medium item).

operators/stats.py generates BOTH the Spark plan and the DuckDB oracle
from the same formula strings (_SUFF_STATS/_MOMENT_EXPRS/_REGR_EXPRS/
_POWER_SUMS/_HIGHER_EXPRS), so the oracle gate is circular for this
family: a transcription error in the shared algebra would pass both
engines identically. This module breaks the circle two independent
ways, mirroring tests/test_hypothesis_graph.py's rationale:

1. Spark's NATIVE aggregates (stddev_samp/var_samp/corr/covar_samp/
   covar_pop/regr_*/skewness/kurtosis) — a wholly separate codepath
   (JVM Imperative/DeclarativeAggregate implementations) that shares
   no text with the closed forms. Compared at rel 1e-9: the natives
   accumulate doubles in partition order (the reason stats.py avoids
   them for the exact gate), so last-bit equality is not expected,
   but any algebra error is far above 1e-9.
2. A NumPy brute force over the collected fixture rows — no SQL, no
   shared formula strings, textbook moment/OLS definitions.

Definition map checked here (so a silent definition drift also
fails): sd/var/covar are SAMPLE (n-1); covar_pop is population;
corr is Pearson; slope/intercept/r2 are OLS of y=discount on
x=quantity; skew_pop = m3/m2^1.5 and kurt_excess = m4/m2^2 - 3 are
population central-moment forms, which is exactly what Spark's
skewness()/kurtosis() natives compute.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapreducewordcounting_spark.operators.stats import (
    agg_higher_moments,
    agg_regression,
    agg_stats_moments,
)

REL = 1e-9


def _rows_by_flag(df):
    return {r["l_returnflag"]: r.asDict() for r in df.collect()}


def _close(a: float, b: float, rel: float = REL) -> bool:
    return math.isclose(a, b, rel_tol=rel, abs_tol=1e-12)


@pytest.fixture(scope="module")
def fixture_xy(spark, sf_dir):
    """(flag -> (x=quantity, y=discount) numpy arrays) straight off
    the parquet, bypassing every aggregate under test."""
    rows = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select("l_returnflag", "l_quantity", "l_discount").collect())
    by_flag: dict[str, list[tuple[float, float]]] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (float(r["l_quantity"]), float(r["l_discount"])))
    return {k: (np.array([p[0] for p in v], dtype=np.float64),
                np.array([p[1] for p in v], dtype=np.float64))
            for k, v in by_flag.items()}


def test_moments_match_spark_natives(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    native = _rows_by_flag(
        li.groupBy("l_returnflag").agg(
            F.stddev_samp("l_quantity").alias("sd_qty"),
            F.var_samp("l_quantity").alias("var_qty"),
            F.corr("l_quantity", "l_discount").alias("corr_qty_disc"),
            F.covar_samp("l_quantity", "l_discount").alias("covar_qty_disc"),
            F.covar_pop("l_quantity", "l_discount")
             .alias("covar_pop_qty_disc")))
    closed = _rows_by_flag(agg_stats_moments(spark, sf_dir))
    assert set(native) == set(closed)
    for flag, nat in native.items():
        for col in ("sd_qty", "var_qty", "corr_qty_disc",
                    "covar_qty_disc", "covar_pop_qty_disc"):
            assert _close(closed[flag][col], nat[col]), (flag, col)


def test_regression_match_spark_natives(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    native = _rows_by_flag(
        li.groupBy("l_returnflag").agg(
            F.expr("regr_slope(l_discount, l_quantity)").alias("slope"),
            F.expr("regr_intercept(l_discount, l_quantity)")
             .alias("intercept"),
            F.expr("regr_r2(l_discount, l_quantity)").alias("r2"),
            F.expr("regr_count(l_discount, l_quantity)").alias("n_pairs")))
    closed = _rows_by_flag(agg_regression(spark, sf_dir))
    assert set(native) == set(closed)
    for flag, nat in native.items():
        for col in ("slope", "intercept", "r2"):
            assert _close(closed[flag][col], nat[col]), (flag, col)
        assert closed[flag]["n_pairs"] == nat["n_pairs"], flag


def test_higher_moments_match_spark_natives(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    native = _rows_by_flag(
        li.groupBy("l_returnflag").agg(
            F.var_pop("l_quantity").alias("m2"),
            F.skewness("l_quantity").alias("skew_pop"),
            F.kurtosis("l_quantity").alias("kurt_excess")))
    closed = _rows_by_flag(agg_higher_moments(spark, sf_dir))
    assert set(native) == set(closed)
    for flag, nat in native.items():
        for col in ("m2", "skew_pop", "kurt_excess"):
            assert _close(closed[flag][col], nat[col]), (flag, col)


def test_stats_family_match_numpy_bruteforce(spark, sf_dir, fixture_xy):
    """Textbook NumPy recomputation — no SQL anywhere in the check."""
    moments = _rows_by_flag(agg_stats_moments(spark, sf_dir))
    regr = _rows_by_flag(agg_regression(spark, sf_dir))
    higher = _rows_by_flag(agg_higher_moments(spark, sf_dir))
    assert set(moments) == set(fixture_xy)
    for flag, (x, y) in fixture_xy.items():
        n = len(x)
        mx, my = x.mean(), y.mean()
        dx, dy = x - mx, y - my
        var_s = float((dx @ dx) / (n - 1))
        cov_s = float((dx @ dy) / (n - 1))
        cov_p = float((dx @ dy) / n)
        corr = cov_s / math.sqrt(var_s * float((dy @ dy) / (n - 1)))
        m = moments[flag]
        assert _close(m["var_qty"], var_s, 1e-8)
        assert _close(m["sd_qty"], math.sqrt(var_s), 1e-8)
        assert _close(m["covar_qty_disc"], cov_s, 1e-8)
        assert _close(m["covar_pop_qty_disc"], cov_p, 1e-8)
        assert _close(m["corr_qty_disc"], corr, 1e-8)
        # OLS y on x
        slope = float((dx @ dy) / (dx @ dx))
        intercept = my - slope * mx
        r2 = corr * corr
        g = regr[flag]
        assert _close(g["slope"], slope, 1e-8)
        assert _close(g["intercept"], intercept, 1e-8)
        assert _close(g["r2"], r2, 1e-8)
        assert g["n_pairs"] == n
        # population central moments
        m2 = float((dx ** 2).mean())
        m3 = float((dx ** 3).mean())
        m4 = float((dx ** 4).mean())
        h = higher[flag]
        assert _close(h["m2"], m2, 1e-8)
        assert _close(h["skew_pop"], m3 / m2 ** 1.5, 1e-8)
        assert _close(h["kurt_excess"], m4 / (m2 * m2) - 3.0, 1e-8)
