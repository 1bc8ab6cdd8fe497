"""Iterative algorithms on DataFrames (SURVEY.md §5.2 — the genuinely
non-SQL-expressible class, checked by internal invariants).

Demonstrated with k-means over the embeddings table. The iteration
pattern is the one that scales:

- **assignment is a pure map stage** — centroids (k·dim floats, tiny by
  definition) are collected to the driver once per iteration and
  inlined as literal arrays, so assigning 10⁹ vectors is shuffle-free
  scan + expression; no join, no window. Collecting *control state*
  (centroids) is not the anti-pattern; collecting *data* is.
- **update is one exchange** — posexplode dimensions, groupBy
  (cluster, dim) average, reassemble. Shuffle volume is rows×dim
  scalars, once per iteration.

The same loop shape serves PageRank/label propagation/connected
components (driver-side loop over a bounded iteration count with one
shuffle per step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.registry import register

K_DEFAULT = 10
ITERS_DEFAULT = 3


def _assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Nearest-centroid assignment as a single expression over literal
    centroid arrays (shuffle-free)."""
    dists = F.array(*[
        F.aggregate(
            F.zip_with("embedding", F.array(*[F.lit(x) for x in c]),
                       lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
            F.lit(0.0), lambda acc, v: acc + v)
        for c in centroids
    ])
    return emb.select(
        "vec_id", "embedding",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        .alias("cluster"),
        F.array_min(dists).alias("sq_dist"),
    )


def kmeans_fit(emb: DataFrame, k: int = K_DEFAULT,
               iters: int = ITERS_DEFAULT) -> tuple[DataFrame, list[float]]:
    """Deterministic k-means (init = every ⌈n/k⌉-th vector by vec_id).
    Returns (final assignment DataFrame, per-iteration inertia)."""
    n = emb.count()
    step = max(n // k, 1)
    centroids = [
        list(r.embedding)
        for r in emb.filter(F.col("vec_id") % step == 0)
        .orderBy("vec_id").limit(k).collect()
    ]
    inertia_history: list[float] = []
    assigned = _assign(emb, centroids)
    for _ in range(iters):
        inertia_history.append(
            assigned.agg(F.sum("sq_dist")).collect()[0][0])
        new_cents = (
            assigned.select("cluster", F.posexplode("embedding")
                            .alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("mean"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "mean")))
                 .alias("dims"))
            .select("cluster", F.col("dims.mean").alias("centroid"))
            .orderBy("cluster")
            .collect()
        )
        for r in new_cents:  # clusters that lost all members keep old position
            centroids[r.cluster] = list(r.centroid)
        assigned = _assign(emb, centroids)
    inertia_history.append(assigned.agg(F.sum("sq_dist")).collect()[0][0])
    return assigned, inertia_history


@register(
    "kmeans_embeddings",
    oracle=None,  # iterative, not SQL-expressible; invariants
    # (monotone inertia, full coverage) in tests/test_iterative.py.
    tags=("iterative", "clustering", "similarity"),
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster profile after 3 deterministic k-means iterations."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_fit(emb)
    return assigned.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.round(F.sum("sq_dist"), 6).alias("cluster_inertia"),
    )
