"""Invariants for the training-data pipeline operators beyond the
registry oracle (which covers chunk_documents / pii_redact /
contamination_5gram / sample_stratified_hash / pack_sequences_offset
differentially): chunk reassembly, greedy-pack budget respect, and
sampler determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.operators.training_ops import (
    CHUNK_LEN,
    CHUNK_STRIDE,
    PACK_BUDGET,
    chunk_documents,
    pack_sequences_greedy,
    pack_sequences_offset,
    sample_stratified_hash,
)


def test_chunks_reassemble_to_original(spark, sf_dir):
    """Concatenating each doc's chunks with the overlap removed must
    reproduce the original text exactly (no bytes lost at cut points)."""
    docs = {r["doc_id"]: r["text"]
            for r in load_table(spark, sf_dir, "documents").collect()}
    chunks = chunk_documents(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_start"])
        rebuilt = rows[0]["chunk_text"]
        for r in rows[1:]:
            # drop the part of this chunk already covered by the
            # rebuilt prefix (the overlap), then append the rest
            rebuilt += r["chunk_text"][len(rebuilt) - r["chunk_start"]:]
        assert rebuilt == docs[doc_id], doc_id
        # every chunk respects the geometry
        assert all(len(r["chunk_text"]) <= CHUNK_LEN for r in rows)
        assert all(r["chunk_start"] % CHUNK_STRIDE == 0 for r in rows)


def test_greedy_pack_respects_budget(spark, sf_dir):
    """No pack exceeds the budget unless it is a single oversized doc,
    packs are consecutive per lang, and greedy never beats the offset
    variant's density (offset binning lets docs straddle boundaries,
    so its pack count is the lower bound)."""
    out = pack_sequences_greedy(spark, sf_dir).collect()
    per_pack: dict[tuple, list[int]] = {}
    for r in out:
        per_pack.setdefault((r["lang"], r["pack_id"]), []).append(r["n_tokens"])
    for (lang, pid), toks in per_pack.items():
        assert sum(toks) <= PACK_BUDGET or len(toks) == 1, (lang, pid)
    for lang in {r["lang"] for r in out}:
        pids = sorted({pid for (l, pid) in per_pack if l == lang})
        assert pids == list(range(len(pids))), lang
    off = pack_sequences_offset(spark, sf_dir).collect()
    n_off = len({(r["lang"], r["pack_id"]) for r in off})
    assert n_off <= len(per_pack)


def test_stratified_sample_deterministic_and_rated(spark, sf_dir):
    """Same rows on a rerun (hash, not RNG), and the en keep-rate is
    roughly its configured 80% (md5 buckets are uniform)."""
    a = {r["doc_id"] for r in sample_stratified_hash(spark, sf_dir).collect()}
    b = {r["doc_id"] for r in sample_stratified_hash(spark, sf_dir).collect()}
    assert a == b and a
    docs = load_table(spark, sf_dir, "documents")
    n_en = docs.filter(F.col("lang") == "en").count()
    kept_en = (sample_stratified_hash(spark, sf_dir)
               .filter(F.col("lang") == "en").count())
    assert 0.6 * n_en <= kept_en / 0.8 <= 1.4 * n_en


def test_cogroup_asof_count_equals_collect(spark, sf_dir):
    """Regression: under a count()-only plan, Catalyst prunes the
    cogroup's input columns down to the grouping key (it knows only the
    UDF's cardinality is consumed), so the pandas function receives
    key-only frames. The UDF must tolerate that — cardinality here is
    len(left) by construction — and both plans must agree."""
    from mapreducewordcounting_spark.operators.udfs import cogroup_asof_pandas

    n_count = cogroup_asof_pandas(spark, sf_dir).count()
    n_collect = len(cogroup_asof_pandas(spark, sf_dir).collect())
    assert n_count == n_collect > 0
