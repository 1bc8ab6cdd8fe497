"""Sketch error bounds vs exact answers — the meaningful correctness
check for approximate structures (binary sketch blobs are not
comparable across engines)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.functions.text import tokenize_canonical
from mapreducewordcounting_spark.operators.sketches import (
    sketch_count_min,
    sketch_hll_union,
)


def _exact_word_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokenize_canonical("text")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word").agg(F.count("*").alias("cnt"))
    )


def test_hll_estimates_within_5pct(spark, sf_dir):
    exact_all = _exact_word_counts(spark, sf_dir).count()
    ests = {r.lang: r.est_vocab for r in sketch_hll_union(spark, sf_dir).collect()}
    assert "__all__" in ests
    assert abs(ests["__all__"] - exact_all) / exact_all <= 0.05


def test_count_min_never_undercounts_and_is_close(spark, sf_dir):
    exact = {r.word: r.cnt for r in _exact_word_counts(spark, sf_dir).collect()}
    est = {r.word: r.est_count for r in sketch_count_min(spark, sf_dir).collect()}
    # probe set = top-100 words (bounded driver state), all known exactly
    assert set(est) <= set(exact) and len(est) == min(100, len(exact))
    n_total = sum(exact.values())
    for w, c in est.items():
        assert c >= exact[w], f"CMS undercounted {w}"  # one-sided error
        assert c - exact[w] <= 0.001 * n_total * 3, f"CMS overshoot on {w}"


def test_approx_count_distinct_error_bounds(spark, sf_dir):
    """agg_approx_distinct (rsd=2%) and text_vocab_approx (rsd=1%) must
    sit within ~3 standard errors of their exact twins."""
    from mapreducewordcounting_spark.operators.relational import (
        agg_approx_distinct, agg_distinct)
    from mapreducewordcounting_spark.operators.text_analysis import (
        text_vocab_approx, text_vocab_per_lang)

    exact = {r.o_orderstatus: r.n_customers
             for r in agg_distinct(spark, sf_dir).collect()}
    approx = {r.o_orderstatus: r.approx_customers
              for r in agg_approx_distinct(spark, sf_dir).collect()}
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(3, 0.06 * v), (k, v, approx[k])

    exact_v = {r.lang: r.vocab_size
               for r in text_vocab_per_lang(spark, sf_dir).collect()}
    approx_v = {r.lang: r.approx_vocab
                for r in text_vocab_approx(spark, sf_dir).collect()}
    for k, v in exact_v.items():
        assert abs(approx_v[k] - v) <= max(2, 0.03 * v), (k, v, approx_v[k])


def test_percentile_approx_close_to_exact(spark, sf_dir):
    from mapreducewordcounting_spark.operators.udfs import (
        agg_percentile_approx, agg_percentiles)

    exact = {r.l_returnflag: r.p50
             for r in agg_percentiles(spark, sf_dir).collect()}
    approx = {r.l_returnflag: r.p50_approx
              for r in agg_percentile_approx(spark, sf_dir).collect()}
    for k, v in exact.items():
        assert abs(approx[k] - v) / v <= 0.01, (k, v, approx[k])


def test_count_min_det_one_sided_and_plan_safe(spark, sf_dir):
    """The deterministic CMS twin: (a) never undercounts any probe
    (one-sided error is structural: collisions only add); (b) the
    top-1 word is estimated exactly at fixture scale (w=8192 >> heavy
    hitters); (c) the plan contains no cartesian/broadcast-nested-loop
    join — the probe lookup must be an equi-join on (row, bucket)."""
    from mapreducewordcounting_spark.operators.sketches import (
        sketch_count_min_det,
    )

    df = sketch_count_min_det(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    assert len(rows) == min(100, _exact_word_counts(spark, sf_dir).count())
    assert all(r.est_count >= r.exact_count for r in rows)
    top = max(rows, key=lambda r: r.exact_count)
    assert top.est_count == top.exact_count


def test_hll_det_error_bound_and_union_consistency(spark, sf_dir):
    """Deterministic HLL: every estimate within 4× the theoretical
    standard error (1.04/√m ≈ 3.2% at m=1024) of the exact distinct
    count, and the '__all__' union row estimates the union cardinality
    (not the sum of the groups)."""
    from pyspark.sql import functions as F

    from mapreducewordcounting_spark.catalog import load_table
    from mapreducewordcounting_spark.operators.sketches import (
        _HLL_M,
        sketch_hll_det,
    )

    est = {r.grp: r.est_customers
           for r in sketch_hll_det(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    exact = {r.o_orderpriority: r.n for r in
             o.groupBy("o_orderpriority")
             .agg(F.countDistinct("o_custkey").alias("n")).collect()}
    exact["__all__"] = o.select("o_custkey").distinct().count()
    tol = 4 * 1.04 / (_HLL_M ** 0.5)
    assert set(est) == set(exact)
    for g, n in exact.items():
        assert abs(est[g] - n) / n <= tol, (g, est[g], n)
    # union estimates the distinct-union, which is far below the sum
    assert est["__all__"] < sum(v for g, v in est.items() if g != "__all__")


def test_quantile_hist_est_within_one_bin_of_exact(spark, sf_dir):
    """Histogram-interpolated percentiles land within one bin width of
    the exact discrete percentile — the estimator's structural error
    bound."""
    from pyspark.sql import functions as F

    from mapreducewordcounting_spark.catalog import load_table
    from mapreducewordcounting_spark.operators.profiling import (
        _QH_NB,
        agg_quantile_hist_est,
    )

    est = {(r.flag, r.p): r.est_price
           for r in agg_quantile_hist_est(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    stats = {r.l_returnflag: (r.lo, r.hi) for r in li.groupBy("l_returnflag")
             .agg(F.min("l_extendedprice").alias("lo"),
                  F.max("l_extendedprice").alias("hi")).collect()}
    for p in (0.5, 0.9, 0.99):
        exact = {r.l_returnflag: r.q for r in li.groupBy("l_returnflag").agg(
            F.expr(f"percentile_disc({p}) WITHIN GROUP "
                   f"(ORDER BY l_extendedprice)").alias("q")).collect()}
        for flag, q in exact.items():
            lo, hi = stats[flag]
            bin_w = (hi - lo) / _QH_NB
            assert abs(est[(flag, p)] - q) <= bin_w + 1e-9, (flag, p)


def test_fingerprint_is_partition_order_independent(spark, sf_dir):
    """The operator's whole claim: the checksum must not depend on
    physical layout. Re-run over an adversarially repartitioned copy
    of lineitem and compare exactly."""
    from mapreducewordcounting_spark.catalog import load_table
    from mapreducewordcounting_spark.operators.profiling import (
        validate_table_fingerprint,
    )

    base = sorted(
        map(tuple, validate_table_fingerprint(spark, sf_dir).collect()))
    li = load_table(spark, sf_dir, "lineitem").repartition(13)
    li.createOrReplaceTempView("_fp_repart")
    # same pipeline over the shuffled layout
    from pyspark.sql import functions as F
    row_str = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        "l_returnflag", "l_linestatus",
        F.col("l_quantity").cast("decimal(12,2)").cast("string"),
        F.col("l_shipdate").cast("date").cast("string"),
    )
    h = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("long")
    other = sorted(map(tuple, (
        li.select("l_returnflag", h.alias("h"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_rows"),
             F.sum(F.col("h").cast("decimal(38,0)")).cast("string")
             .alias("checksum"))
    ).collect()))
    assert base == other


def test_minhash_estimator_quality(spark, sf_dir):
    """E[agreement fraction] = Jaccard: on the candidate pairs, the
    8-component estimate must track the exact value within the
    theoretical sampling noise (SD <= sqrt(J(1-J)/8) ~ 0.18; the mean
    absolute error bound is set loose above it)."""
    from mapreducewordcounting_spark.operators.dedup import (
        dedup_minhash_estimate,
    )

    rows = dedup_minhash_estimate(spark, sf_dir).collect()
    assert rows, "no candidate pairs at this SF"
    mae = sum(abs(r.est_jaccard - r.jaccard) for r in rows) / len(rows)
    assert mae <= 0.25, f"estimator MAE {mae:.3f}"
