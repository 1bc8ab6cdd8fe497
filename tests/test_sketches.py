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
    assert set(est) == set(exact)
    n_total = sum(exact.values())
    for w, c in exact.items():
        assert est[w] >= c, f"CMS undercounted {w}"  # one-sided error
        assert est[w] - c <= 0.001 * n_total * 3, f"CMS overshoot on {w}"
