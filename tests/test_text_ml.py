"""spark.ml tf-idf vs first-principles tf-idf: hashed weights must
rank documents' dominant terms consistently (2^18 features → no
collisions on a 31-word vocabulary, so values agree up to the idf
smoothing-constant difference)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcounting_spark.operators.text_analysis import (
    text_tfidf_ml,
)


def test_tfidf_ml_shape_and_determinism(spark, sf_dir):
    a = {r.doc_id: (r.max_weight, r.n_terms)
         for r in text_tfidf_ml(spark, sf_dir).collect()}
    b = {r.doc_id: (r.max_weight, r.n_terms)
         for r in text_tfidf_ml(spark, sf_dir).collect()}
    assert a == b
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(a) == n_docs
    assert all(w >= 0 and 0 < n for w, n in a.values())


def test_tfidf_ml_nterms_equals_distinct_tokens(spark, sf_dir):
    """With 2^18 hash buckets and a ~31-word vocabulary there are no
    collisions, so n_terms == per-doc distinct token count."""
    from mapreducewordcounting_spark.operators.text_analysis import (
        text_doc_stats,
    )

    ml = {r.doc_id: r.n_terms for r in text_tfidf_ml(spark, sf_dir).collect()}
    exact = {r.doc_id: r.n_distinct
             for r in text_doc_stats(spark, sf_dir).collect()}
    assert ml == exact
