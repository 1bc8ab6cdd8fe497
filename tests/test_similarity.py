"""Recall tests for the approximate similarity paths vs brute force
(the fixture embeddings are near-random — max pairwise cosine ≈ 0.51 —
so bars are structural, not quality claims)."""

from __future__ import annotations

from mapreducewordcounting_spark.operators.similarity import (
    K,
    N_QUERIES,
    similarity_ann_ivf,
    similarity_ann_lsh,
    similarity_topk_bruteforce,
)


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_bruteforce_shape(spark, sf_dir):
    got = _topk_sets(similarity_topk_bruteforce(spark, sf_dir))
    assert len(got) == N_QUERIES
    assert all(len(v) == K for v in got.values())


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    """8 hash tables + generous radius ⇒ decent recall even on random
    vectors; the bar is deliberately loose (ANN on noise)."""
    exact = _topk_sets(similarity_topk_bruteforce(spark, sf_dir))
    approx = _topk_sets(similarity_ann_lsh(spark, sf_dir))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / (len(exact) * K)
    assert recall >= 0.5, f"LSH recall {recall:.2f}"


def test_ivf_recall_positive(spark, sf_dir):
    """nprobe=2 of 10 random cells on random data: structural sanity
    (non-empty, some overlap with the exact answer), not quality."""
    exact = _topk_sets(similarity_topk_bruteforce(spark, sf_dir))
    approx = _topk_sets(similarity_ann_ivf(spark, sf_dir))
    assert len(approx) == N_QUERIES
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / (len(exact) * K)
    assert recall >= 0.05, f"IVF recall {recall:.2f}"


def test_anchor_graph_recall_and_ivf_comparison(spark, sf_dir):
    """Graph-routed ANN: probing 1+3 graph-linked cells must (a) cover
    every query, (b) beat-or-match the plain IVF nprobe=2 probe's
    recall floor (it probes strictly more cells, chosen by the anchor
    adjacency), and (c) be rerun-deterministic — no seed, no RNG."""
    from mapreducewordcounting_spark.operators.similarity import (
        similarity_ann_anchor_graph,
    )

    exact = _topk_sets(similarity_topk_bruteforce(spark, sf_dir))
    approx = _topk_sets(similarity_ann_anchor_graph(spark, sf_dir))
    assert len(approx) == N_QUERIES
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / (len(exact) * K)
    assert recall >= 0.05, f"anchor-graph recall {recall:.2f}"

    ivf = _topk_sets(similarity_ann_ivf(spark, sf_dir))
    ivf_hits = sum(len(exact[q] & ivf.get(q, set())) for q in exact)
    assert hits >= ivf_hits * 0.8, (
        f"graph routing {hits} hits vs IVF {ivf_hits}")

    r1 = sorted(map(tuple,
                    similarity_ann_anchor_graph(spark, sf_dir).collect()))
    r2 = sorted(map(tuple,
                    similarity_ann_anchor_graph(spark, sf_dir).collect()))
    assert r1 == r2


def test_rp_det_recall_and_determinism(spark, sf_dir):
    """The md5-hyperplane ANN: (a) bucket collisions give usable recall
    even on near-random vectors (25% expected pair rate at 4x4-bit
    bands); (b) two runs are bit-identical — no seed, no RNG, the whole
    point of the deterministic family."""
    from mapreducewordcounting_spark.operators.similarity import (
        similarity_ann_rp_det,
    )

    exact = _topk_sets(similarity_topk_bruteforce(spark, sf_dir))
    approx = _topk_sets(similarity_ann_rp_det(spark, sf_dir))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / (len(exact) * K)
    assert recall >= 0.3, f"rp-det recall {recall:.2f}"

    r1 = sorted(map(tuple, similarity_ann_rp_det(spark, sf_dir).collect()))
    r2 = sorted(map(tuple, similarity_ann_rp_det(spark, sf_dir).collect()))
    assert r1 == r2


def test_greedy_route_recall_matches_single_hop(spark, sf_dir):
    """similarity_ann_greedy_route (VERDICT r10 item 3): at the SAME
    <= 4-probed-cell budget, the multi-hop greedy walk must recall at
    least what the single-hop form does — on the fixture the walk
    routes every query to its true nearest anchor (verified in the
    prototype at sf0.01 AND sf0.1), so the probed cell sets are
    identical and recall is equal. The walk's 100 TB win is the
    routing COST: <= 81 anchor comparisons per query vs the
    single-hop form's full |anchors| assignment scan per query."""
    from mapreducewordcounting_spark.operators.similarity import (
        similarity_ann_anchor_graph,
        similarity_ann_greedy_route,
    )

    exact = _topk_sets(similarity_topk_bruteforce(spark, sf_dir))
    greedy = _topk_sets(similarity_ann_greedy_route(spark, sf_dir))
    single = _topk_sets(similarity_ann_anchor_graph(spark, sf_dir))
    assert len(greedy) == N_QUERIES
    g_hits = sum(len(exact[q] & greedy.get(q, set())) for q in exact)
    s_hits = sum(len(exact[q] & single.get(q, set())) for q in exact)
    assert g_hits >= s_hits, (
        f"greedy routing {g_hits} hits < single-hop {s_hits} at equal "
        f"probe budget")

    # rerun-deterministic — no seed, no RNG anywhere in the walk
    r1 = sorted(map(tuple,
                    similarity_ann_greedy_route(spark, sf_dir).collect()))
    r2 = sorted(map(tuple,
                    similarity_ann_greedy_route(spark, sf_dir).collect()))
    assert r1 == r2


def test_binary_quant_recall_and_determinism(spark, sf_dir):
    """similarity_binary_quant: the 1-bit Hamming prefilter (20 of n
    candidates) must surface usable overlap with the exact answer
    even on near-random vectors, and be rerun-deterministic (sign
    threshold + integer tie-breaks, no RNG)."""
    from mapreducewordcounting_spark.operators.similarity import (
        similarity_binary_quant,
    )

    exact = _topk_sets(similarity_topk_bruteforce(spark, sf_dir))
    approx = _topk_sets(similarity_binary_quant(spark, sf_dir))
    assert len(approx) == N_QUERIES
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / (len(exact) * K)
    assert recall >= 0.1, f"binary-quant recall {recall:.2f}"

    r1 = sorted(map(tuple, similarity_binary_quant(spark, sf_dir)
                    .collect()))
    r2 = sorted(map(tuple, similarity_binary_quant(spark, sf_dir)
                    .collect()))
    assert r1 == r2


def test_sf1_recall_floors(spark):
    """VERDICT r12 item 3 — quality at scale, the unverified half of
    the r12 nlist decouple: at the derived sf1 (20k vectors, fixed
    ANN_NLIST=40 so nprobe=2 covers 5% of the corpus vs 50% at
    sf0.1), every engine-native ANN form must hold a recall floor vs
    the exact brute force. Measured r13 (tools/ann_recall.py): ivf
    and ivf_pruned 0.92, anchor-graph 0.96, greedy-route 0.56,
    binary-quant 1.00, rp-det 1.00 — the derived corpus's per-replica
    perturbed twins are near-identical true neighbors, which is
    exactly the locality a cell probe exploits (and real embedding
    corpora cluster far more than this near-random fixture). Floors
    sit well under the measured points so host-independent noise
    can't flake, but far above collapse (the pre-decouple failure
    mode this guards: a probe whose coverage shrinks with corpus
    growth until recall hits zero). Runs only where the bench-only
    sf1 scratch exists."""
    import os

    import pytest

    sf1 = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scale_scratch", "sf1")
    if not os.path.isdir(sf1):
        pytest.skip("derived sf1 scratch not built (tools/make_sf1.py)")

    from mapreducewordcounting_spark.operators.similarity import (
        similarity_ann_anchor_graph,
        similarity_ann_greedy_route,
        similarity_ann_ivf,
        similarity_ann_ivf_pruned,
        similarity_ann_rp_det,
        similarity_binary_quant,
    )

    exact = _topk_sets(similarity_topk_bruteforce(spark, sf1))
    denom = len(exact) * K
    floors = {
        similarity_ann_ivf: 0.6,
        similarity_ann_ivf_pruned: 0.6,
        similarity_ann_anchor_graph: 0.6,
        similarity_ann_greedy_route: 0.35,
        similarity_binary_quant: 0.6,
        similarity_ann_rp_det: 0.6,
    }
    for fn, floor in floors.items():
        approx = _topk_sets(fn(spark, sf1))
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        recall = hits / denom
        assert recall >= floor, (
            f"{fn.__name__} sf1 recall {recall:.2f} < floor {floor}")
