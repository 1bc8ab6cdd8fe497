"""Seeded sampling: reproducible, unbiased-ish rate."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.operators.relational import sample_seeded


def test_sample_deterministic_with_seed(spark, sf_dir):
    a = sorted(map(tuple, sample_seeded(spark, sf_dir).collect()))
    b = sorted(map(tuple, sample_seeded(spark, sf_dir).collect()))
    assert a == b


def test_sample_rate_in_bounds(spark, sf_dir):
    total = load_table(spark, sf_dir, "lineitem").count()
    sampled = sum(r.n_sampled for r in sample_seeded(spark, sf_dir).collect())
    assert 0.05 * total <= sampled <= 0.15 * total
