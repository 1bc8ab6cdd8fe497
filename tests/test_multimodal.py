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
