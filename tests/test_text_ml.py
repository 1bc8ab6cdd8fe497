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


def test_inverted_index_positions_are_exact(spark, sf_dir):
    """Posting rows must reconstruct the tokenizer's view: for every
    (term, doc) row, the 1-based positions point at exactly that term
    in the canonical token sequence, tf == |positions|, first_pos ==
    min(positions), and df == number of posting rows for the term
    (all terms past the df cap absent)."""
    from tests.bruteforce_util import doc_tokens

    from mapreducewordcounting_spark.operators.text_analysis import (
        INDEX_DF_CAP,
        text_inverted_index,
    )

    toks = doc_tokens(sf_dir)
    rows = text_inverted_index(spark, sf_dir).collect()
    assert rows
    by_term: dict[str, int] = {}
    for r in rows:
        ps = [int(x) for x in r.positions.split("|")]
        assert ps == sorted(ps) and r.tf == len(ps)
        assert r.first_pos == ps[0]
        assert all(toks[r.doc_id][p - 1] == r.term for p in ps)
        # the position list is COMPLETE, not just consistent
        assert len(ps) == sum(1 for w in toks[r.doc_id] if w == r.term)
        by_term[r.term] = by_term.get(r.term, 0) + 1
    for r in rows:
        assert r.df == by_term[r.term] <= INDEX_DF_CAP
