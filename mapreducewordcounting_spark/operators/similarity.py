"""Similarity search over embeddings (SURVEY.md §2.3 — M5).

Top-k nearest neighbors over an ``array<float>`` column:

- **Brute force** (``similarity_topk_bruteforce``): broadcast the
  query set, scan candidates once, cosine in pure JVM expressions
  (functions/vectors.py), per-query top-k window. Exact; the oracle.
  At 100 TB this is one pass over the candidate table per query batch
  — linear, embarrassingly parallel, no index needed.
- **LSH** (``similarity_ann_lsh``): BucketedRandomProjectionLSH —
  sublinear candidate generation for when even one pass is too much.
- **IVF** (``similarity_ann_ivf``): coarse quantization — assign every
  vector to its nearest centroid (broadcast centroid table), search
  only the query's top-``nprobe`` cells. The classic recall/cost dial.

The fixture embeddings are near-random (max pairwise cosine ≈ 0.51,
verified), so ANN recall tests compare against brute-force top-k, not
labels, and use loose bars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.functions.vectors import cosine_similarity
from mapreducewordcounting_spark.registry import register

K = 5
N_QUERIES = 10  # query set = vec_id < 10


@register(
    "similarity_topk_bruteforce",
    oracle=f"""
        WITH q AS (SELECT vec_id, embedding FROM embeddings
                   WHERE vec_id < {N_QUERIES}),
        pairs AS (
            SELECT q.vec_id AS query_id,
                   c.vec_id AS neighbor_id,
                   list_sum(list_transform(range(1, len(q.embedding) + 1),
                        i -> CAST(q.embedding[i] AS DOUBLE)
                             * CAST(c.embedding[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(q.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(c.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                       AS cos
            FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine
        FROM (SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS rank
              FROM pairs)
        WHERE rank <= {K}
    """,
    tags=("similarity", "topk", "bruteforce"),
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast-NL join (queries × candidates),
    JVM-side dot/norm via zip_with+aggregate (no Python), ranking
    window partitioned by query. Ranked on the unrounded score with
    neighbor_id tie-break; score surfaced rounded to 6 (the two
    engines' 64-term float sums may differ in the last ulp)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_similarity("q_emb", "c_emb").alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "neighbor_id", "rank",
                F.round("cos", 6).alias("cosine"))
    )


@register(
    "similarity_ann_lsh",
    oracle=None,  # hash-seeded buckets; tests/test_similarity.py
    # checks recall against brute-force top-k instead.
    tags=("similarity", "ann", "lsh", "approx"),
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH (BucketedRandomProjectionLSH):
    candidates = bucket collisions only, then exact re-rank of the
    candidate set. Sublinear in candidates at 100 TB; recall is tuned
    by bucketLength / numHashTables."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>"))
        .alias("vec"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="hashes", bucketLength=2.0,
        numHashTables=8, seed=42)
    model = lsh.fit(emb)
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    pairs = model.approxSimilarityJoin(q, emb, 3.0, distCol="euclid")
    scored = (
        pairs.filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            F.col("euclid"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("euclid"),
                                               F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "neighbor_id", "rank",
                F.round("euclid", 6).alias("euclid"))
    )


@register(
    "similarity_ann_ivf",
    oracle=None,  # approximate by construction; recall-vs-bruteforce
    # pinned in tests/test_similarity.py.
    tags=("similarity", "ann", "ivf", "approx"),
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN with deterministic coarse centroids (every 50th
    vector): (1) broadcast the centroid table and assign each vector to
    its nearest centroid — one scan; (2) route each query to its
    nprobe=2 closest cells; (3) exact cosine re-rank within those cells
    only. At 100 TB the partition-by-cell layout makes step 3 a pruned
    scan (cell = partition key), not a shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_emb"))

    def assign(df: DataFrame, id_col: str, emb_col: str, n: int) -> DataFrame:
        """Top-n nearest centroids per row (broadcast NL + window)."""
        scored = df.crossJoin(F.broadcast(cents)).select(
            id_col, emb_col, "cent_id",
            cosine_similarity(emb_col, "cent_emb").alias("cent_cos"))
        w = Window.partitionBy(id_col).orderBy(F.desc("cent_cos"),
                                               F.asc("cent_id"))
        return (scored.withColumn("crank", F.row_number().over(w))
                .filter(F.col("crank") <= n).drop("cent_cos", "crank"))

    cells = assign(
        emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("c_emb")),
        "neighbor_id", "c_emb", 1)
    q_cells = assign(
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("q_emb")),
        "query_id", "q_emb", 2)  # nprobe=2

    cand = q_cells.join(cells, "cent_id").filter(
        F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id",
                    cosine_similarity("q_emb", "c_emb").alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "neighbor_id", "rank",
                F.round("cos", 6).alias("cosine"))
    )


@register(
    "embedding_quantize_int8",
    oracle="""
        WITH e AS (
            SELECT vec_id, embedding,
                   CAST(list_min(embedding) AS DOUBLE) AS mn,
                   CAST(list_max(embedding) AS DOUBLE) AS mx
            FROM embeddings),
        s AS (SELECT vec_id, embedding, mn,
                     (mx - mn) / 255.0 AS scale FROM e),
        q AS (
            SELECT vec_id,
                   len(embedding) AS n_dims,
                   CASE WHEN scale = 0
                        THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                        ELSE list_transform(embedding,
                             x -> CAST(floor((CAST(x AS DOUBLE) - mn) / scale)
                                       AS BIGINT)) END AS codes
            FROM s)
        SELECT vec_id, n_dims,
               CAST(list_sum(codes) AS BIGINT) AS sum_codes,
               CAST(list_min(codes) AS BIGINT) AS min_code,
               CAST(list_max(codes) AS BIGINT) AS max_code
        FROM q
    """,
    tags=("similarity", "quantization", "training"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization (min/max affine, 256 codes)
    — the 4× storage/bandwidth cut applied before ANN indexing at
    scale (IVF/PQ pipelines start exactly here). Pure array HOFs: a
    map stage with no shuffle at all; codes live as an array<int>
    beside the float vector.

    The oracle recomputes the identical IEEE-double affine in DuckDB
    (float→double widening is exact in both engines, so the code
    assignment — including the boundary dim where x = max — is
    bit-identical); checked on code sums/extrema per vector. Zero-range
    vectors (max = min) quantize to all-zero codes via an explicit
    guard rather than a 0/0 NaN."""
    emb = load_table(spark, sf_dir, "embeddings")
    mn = F.array_min("embedding").cast("double")
    mx = F.array_max("embedding").cast("double")
    base = emb.select(
        "vec_id", "embedding", mn.alias("mn"),
        ((mx - mn) / F.lit(255.0)).alias("scale"))
    codes = F.when(F.col("scale") == 0, F.transform(
        "embedding", lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform(
            "embedding",
            lambda x: F.floor((x.cast("double") - F.col("mn"))
                              / F.col("scale"))))
    q = base.select(
        "vec_id", F.size("embedding").alias("n_dims"),
        codes.alias("codes"))
    return q.select(
        "vec_id", "n_dims",
        F.aggregate("codes", F.lit(0).cast("long"),
                    lambda acc, v: acc + v).alias("sum_codes"),
        F.array_min("codes").alias("min_code"),
        F.array_max("codes").alias("max_code"),
    )
