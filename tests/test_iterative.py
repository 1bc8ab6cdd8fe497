"""k-means invariants: inertia is non-increasing, every vector is
assigned, determinism across runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.operators.iterative import (
    K_DEFAULT,
    kmeans_embeddings,
    kmeans_fit,
)


def test_inertia_monotone_nonincreasing(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    _, hist = kmeans_fit(emb, iters=3)
    assert len(hist) == 4
    for a, b in zip(hist, hist[1:]):
        assert b <= a * (1 + 1e-9), f"inertia rose: {hist}"
    assert hist[-1] < hist[0]  # strictly improved over init


def test_full_coverage_and_determinism(spark, sf_dir):
    n = load_table(spark, sf_dir, "embeddings").count()
    prof1 = {r.cluster: r.n_members
             for r in kmeans_embeddings(spark, sf_dir).collect()}
    prof2 = {r.cluster: r.n_members
             for r in kmeans_embeddings(spark, sf_dir).collect()}
    assert prof1 == prof2
    assert sum(prof1.values()) == n
    assert len(prof1) <= K_DEFAULT
