"""ANN recall-vs-bruteforce at any sf dir (VERDICT r12 item 3).

    python tools/ann_recall.py [sf_dir ...]

The r12 nlist decouple fixed ANN *speed* at 10x data (fixed
ANN_NLIST=40 anchors whatever the corpus size); the unverified half of
that claim was *quality*: with 40 cells over 20k vectors the nprobe=2
probe covers 5% of the corpus vs 50% at sf0.1. This tool measures
recall@K against the exact brute-force top-K for every engine-native
ANN form at each given sf dir (default: the driver's sf0.1 AND the
derived scale_scratch/sf1) and prints one JSON line per dir — the
numbers BASELINE.md's "ANN recall at scale" table records, and the
floors tests/test_similarity.py::test_sf1_recall_floors pins.

The fixture embeddings are near-random (max pairwise cosine ~0.5), so
absolute recall is a STRUCTURAL property of probe coverage, not an
embedding-quality claim — random geometry is the worst case for
locality-based pruning: real embedding corpora cluster, so cell-local
probes recall better there, never worse.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def topk_sets(df):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def recall_at(spark, sf_dir: str) -> dict:
    from mapreducewordcounting_spark.operators.similarity import (
        K,
        similarity_ann_anchor_graph,
        similarity_ann_greedy_route,
        similarity_ann_ivf,
        similarity_ann_ivf_pruned,
        similarity_ann_rp_det,
        similarity_binary_quant,
        similarity_topk_bruteforce,
    )

    exact = topk_sets(similarity_topk_bruteforce(spark, sf_dir))
    denom = len(exact) * K
    out = {"sf_dir": sf_dir, "n_queries": len(exact), "k": K}
    for fn in (similarity_ann_ivf, similarity_ann_ivf_pruned,
               similarity_ann_anchor_graph,
               similarity_ann_greedy_route, similarity_binary_quant,
               similarity_ann_rp_det):
        approx = topk_sets(fn(spark, sf_dir))
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        out[fn.__name__] = round(hits / denom, 3)
    return out


def main() -> int:
    from mapreducewordcounting_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/testdata/sf0.1",
                            os.path.join(REPO, "scale_scratch", "sf1")]
    spark = get_spark(app_name="mrwc-ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        print(json.dumps(recall_at(spark, d)))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
