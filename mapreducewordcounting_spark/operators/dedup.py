"""Deduplication operators (SURVEY.md §2.3 — M5, north-star extension).

Four rungs of the dedup ladder, each with the scale rationale:

1. **Exact** (``dedup_exact``): group by content hash — one shuffle of
   32-byte keys regardless of document size. The 100 TB default.
2. **N-gram Jaccard** (``dedup_ngram_jaccard``): exact near-dup pairs
   via an inverted shingle index — the self-join is bounded by shingle
   frequency, not corpus², but still explodes on hot shingles; capped
   here and superseded at scale by (3).
3. **MinHash LSH** (``dedup_minhash_lsh``): the 100 TB near-dup path —
   constant-size signatures, banded bucket join, candidates only.
4. **SimHash** (``dedup_simhash``): 64-bit fingerprints whose hamming
   distance tracks cosine similarity of token sets; pair generation by
   bucketed prefix (here: full signature output, rows-only checked).

The fixture corpus has planted near-duplicates (verified: ~25 pairs
with 3-gram Jaccard ≥ 0.8 at sf0.01), so thresholds below are
non-vacuous.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.functions.text import tokenize_canonical
from mapreducewordcounting_spark.registry import register

#: DuckDB twin of tokenize_canonical + empty filter (shared CTE)
_SQL_TOKS = """
    SELECT doc_id,
           list_filter(
               list_transform(regexp_split_to_array(lower(text), '\\s+'),
                              t -> regexp_replace(t, '[^a-z'']', '', 'g')),
               w -> length(w) > 0) AS toks
    FROM documents
"""


def _toks() -> "F.Column":
    return F.filter(tokenize_canonical("text"), lambda w: F.length(w) > 0)


def shingles(toks: "F.Column", n: int = 3) -> "F.Column":
    """Distinct word n-gram shingles of a token array (built-ins only).

    Guarded: ``sequence(1, size-n+1)`` would run *descending* for short
    docs (Spark's sequence(1,0) = [1,0]), so docs with < n tokens map
    to an empty shingle set explicitly.
    """
    joined = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + k) for k in range(n)]),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, joined).otherwise(F.array().cast("array<string>"))
    )


@register(
    "dedup_exact",
    oracle=f"""
        WITH t AS ({_SQL_TOKS})
        SELECT sha256(array_to_string(toks, ' ')) AS content_hash,
               min(doc_id) AS survivor_id,
               count(*) AS n_copies
        FROM t
        GROUP BY sha256(array_to_string(toks, ' '))
    """,
    tags=("dedup", "exact"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the normalized-content hash: survivor = min
    doc_id per content cluster. The shuffle key is the 32-byte sha256,
    never the document text — at 100 TB the exchange carries hashes,
    not content."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.sha2(F.array_join(_toks(), " "), 256).alias("content_hash"),
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count("*").alias("n_copies"),
        )
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH t AS ({_SQL_TOKS}),
        sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                       AS shingles
            FROM t
        ),
        sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
        inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
            FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT i.id_a, i.id_b,
               CAST(i.n_common AS DOUBLE)
                   / (sa.n_sh + sb.n_sh - i.n_common) AS jaccard
        FROM inter i
        JOIN sizes sa ON i.id_a = sa.doc_id
        JOIN sizes sb ON i.id_b = sb.doc_id
        WHERE CAST(i.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_common) >= 0.8
    """,
    tags=("dedup", "neardup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs (3-gram Jaccard ≥ 0.8) via inverted shingle
    index: explode distinct shingles, self-equi-join on shingle (never
    doc×doc), count common, join tiny per-doc size table (broadcast).
    Jaccard = ints divided in IEEE double — deterministic, no rounding.

    Scale note: cost is Σ_shingle freq² — fine while no shingle is hot;
    the production path for 100 TB is dedup_minhash_lsh, which bounds
    candidates by banding instead.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", shingles(_toks()).alias("shingles"))
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        inter.join(F.broadcast(sa), F.col("id_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("id_b") == F.col("sb.doc_id"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common").cast("double")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= 0.8)


@register(
    "dedup_minhash_lsh",
    oracle=None,  # LSH buckets are hash-seeded and engine-specific;
    # tests/test_dedup.py checks recall vs dedup_ngram_jaccard instead.
    tags=("dedup", "neardup", "lsh", "approx"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates — the 100 TB path: fixed-size
    signatures (numHashTables=16), banded bucket join, Jaccard distance
    computed only for colliding candidates (spark.ml MinHashLSH,
    approxSimilarityJoin). Output: candidate pairs with estimated
    jaccard ≥ 0.7."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", shingles(_toks()).alias("shingles")).filter(
        F.size("shingles") > 0
    )
    tf = HashingTF(inputCol="shingles", outputCol="features",
                   numFeatures=1 << 18, binary=True)
    feats = tf.transform(sh)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=16, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.3, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            (1 - F.col("jaccard_dist")).alias("jaccard_est"),
        )
    )


@register(
    "dedup_simhash",
    oracle=None,  # xxhash64 is Spark-specific; invariance properties
    # are pinned in tests/test_dedup.py.
    tags=("dedup", "neardup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document, entirely in codegen'd expressions:
    xxhash64 each token, sum ±1 votes per bit position across tokens,
    majority → bit. Emitted as two unsigned 32-bit halves plus a hex
    string. Near-dup docs differ in O(1) bits (hamming ≤ 3 typical).

    Scale: one explode + one 64-aggregate groupBy — a single shuffle
    keyed by doc_id; signature is 8 bytes/doc downstream.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(_toks()).alias("word")
    ).withColumn("h", F.xxhash64("word"))
    votes = words.groupBy("doc_id").agg(*[
        F.sum(
            F.shiftright("h", b).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"v{b}")
        for b in range(64)
    ])

    def bit(b: int):
        return F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long"))

    lo = reduce(lambda acc, b: acc + (bit(b) * F.lit(1 << b)),
                range(32), F.lit(0).cast("long"))
    hi = reduce(lambda acc, b: acc + (bit(b + 32) * F.lit(1 << b)),
                range(32), F.lit(0).cast("long"))
    return votes.select(
        "doc_id",
        hi.alias("simhash_hi"),
        lo.alias("simhash_lo"),
        F.concat(
            F.lpad(F.hex(hi), 8, "0"), F.lpad(F.hex(lo), 8, "0")
        ).alias("simhash_hex"),
    )
