"""Multimodal plumbing tests: the decode stub is deterministic and the
Arrow/mapInPandas path agrees with JVM-side byte lengths."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordcounting_spark.operators.multimodal import (
    assets,
    decode_asset_features,
    mm_decode_features,
)


def test_decode_deterministic(spark, sf_dir):
    a = {r.asset_id: (r.n_bytes, r.digest)
         for r in decode_asset_features(assets(spark, sf_dir)).collect()}
    b = {r.asset_id: (r.n_bytes, r.digest)
         for r in decode_asset_features(assets(spark, sf_dir)).collect()}
    assert a == b and len(a) > 0


def test_decode_nbytes_matches_jvm_octet_length(spark, sf_dir):
    """The Python-side len(payload) must equal JVM octet_length — i.e.
    the Arrow binary transfer is byte-faithful."""
    jvm = {r.asset_id: r.n_bytes
           for r in assets(spark, sf_dir)
           .select("asset_id", F.col("meta.n_bytes").alias("n_bytes"))
           .collect()}
    py = {r.asset_id: r.n_bytes
          for r in decode_asset_features(assets(spark, sf_dir)).collect()}
    assert jvm == py


def test_decode_features_aggregate(spark, sf_dir):
    rows = mm_decode_features(spark, sf_dir).collect()
    kinds = {r.kind for r in rows}
    assert kinds == {"image", "audio", "video"}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_assets for r in rows) == n_docs


def test_phash_neardup_finds_planted_pairs(spark, sf_dir):
    """The perceptual-hash near-dup operator must (a) report every
    pair symmetric-free (id_a < id_b) within hamming <= 3, (b) find
    the fixture's planted tail-edit near-dups whose edit flips <= 3
    gradient bits, and (c) report exact-payload duplicates at
    hamming 0."""
    from mapreducewordcounting_spark.operators.multimodal import (
        mm_phash_neardup,
    )
    from tests.bruteforce_util import load_documents

    pairs = {(r.id_a, r.id_b): r.hamming
             for r in mm_phash_neardup(spark, sf_dir).collect()}
    assert pairs, "fixture must keep the threshold non-vacuous"
    assert all(a < b for a, b in pairs)
    assert all(0 <= h <= 3 for h in pairs.values())

    docs = {d["doc_id"]: d["text"] for d in load_documents(sf_dir)}
    # exact-payload duplicates (present at sf0.1) must land at 0
    for (a, b), h in pairs.items():
        if docs[a] == docs[b]:
            assert h == 0
    # planted near-dups: prefix-identical, tail edit INSIDE the
    # 130-char receptive field, edit confined to one block boundary
    # region -> must be reported (edits past char 130 give hamming 0;
    # edits flipping 4 bits are excluded by the verify threshold,
    # which the brute-force differential pins exactly)
    found_planted = sum(
        1 for (a, b) in pairs
        if docs[a] != docs[b] and docs[a][:60] == docs[b][:60])
    assert found_planted > 0
