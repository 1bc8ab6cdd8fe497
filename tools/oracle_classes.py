"""Mirrored-oracle inventory (VERDICT r5 item 4).

Classifies EVERY oracled registry query by how independent its DuckDB
oracle is from the Spark implementation:

* ``independent`` — the oracle is declarative ANSI SQL a third party
  would write from the query's spec, evaluated by DuckDB's own
  operators (joins, aggregates, windows, native functions). A bug in
  the Spark construction and a bug in the oracle would have to be made
  twice, independently, to stay green.
* ``mirrored`` — the oracle re-states the Spark construction: it is
  generated from shared Python format strings, or both sides implement
  the same custom multi-step algorithm (md5 banding, bit interleave,
  bucket grids, unrolled iteration, shared formula constants). A
  transcription error in the shared construction would pass the oracle
  gate on both sides — so every mirrored oracle carries a
  STRUCTURE-FREE differential: a plain-Python/numpy brute force of the
  documented semantics (tests/test_bruteforce_*.py,
  tests/test_hypothesis_*.py, tests/test_stats_natives.py).
* ``probe`` — diagnostics whose oracle is self-referential BY DESIGN
  (operators/probes.py): the mirroring is the measurement.

`python tools/oracle_classes.py` regenerates the inventory table in
TESTDATA.md; tests/test_oracle_inventory.py asserts the classification
is total (no unclassified oracles) and that every mirrored entry's
differential test exists.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: mirrored oracles -> (construction, structure-free differential)
MIRRORED: dict[str, tuple[str, str]] = {
    # --- md5 minhash / simhash banding
    "dedup_minhash_det": (
        "md5 hash family + 4x2 banding generated on both sides",
        "test_bruteforce_dedup_text.py::test_minhash_det_matches_python"),
    "dedup_minhash_estimate": (
        "same banding + signature-agreement estimator",
        "test_bruteforce_dedup_text.py::test_minhash_estimate_matches_python"),
    "dedup_simhash_det": (
        "64 generated vote sums / bit assembly / 16-bit band predicates",
        "test_bruteforce_dedup_text.py::test_simhash_det_matches_python"),
    "mm_phash_neardup": (
        "md5-fold block intensities / dHash gradient bits / "
        "eligibility-gated 16-bit bands on both sides",
        "test_bruteforce_dedup_text.py::test_phash_neardup_matches_python"
        " (+ test_hypothesis_dedup.py::test_phash_core_matches_python)"),
    "dedup_url_canonical": (
        "shared synthetic-URL construction + canonicalization regex "
        "chain on both sides",
        "test_bruteforce_dedup_text.py::test_url_canonical_matches_python"),
    "text_keyphrases_rake": (
        "shared stopword list + gaps-islands segmentation + degree/"
        "freq formula on both sides",
        "test_bruteforce_dedup_text.py::"
        "test_rake_keyphrases_match_python"),
    "text_boilerplate_lines": (
        "shared synthetic line construction (8-token slices + "
        "header/footer injection) and df-threshold rule on both sides",
        "test_bruteforce_dedup_text.py::"
        "test_boilerplate_lines_match_python"),
    "dedup_paragraph_exact": (
        "shared 16-token paragraph slicing; keep-first is declarative "
        "on both sides but the grain construction is mirrored",
        "test_bruteforce_dedup_text.py::"
        "test_paragraph_exact_matches_python"),
    "pii_luhn_validate": (
        "shared synthetic card construction + the same textbook Luhn "
        "fold on both sides",
        "test_bruteforce_formulas.py::test_luhn_validate_matches_python"),
    "quality_lm_buckets": (
        "embeds the text_bigram_logprob oracle verbatim as a CTE + "
        "shared bucket cut points",
        "test_bruteforce_formulas.py::test_lm_buckets_match_python"),
    "dq_benford_distribution": (
        "shared Benford expectation ln(1+1/d)/ln(10) + chi-square "
        "term formula on both sides",
        "test_bruteforce_formulas.py::"
        "test_benford_distribution_matches_python"),
    "profile_mutual_information": (
        "shared MI formula over the contingency table",
        "test_bruteforce_formulas.py::"
        "test_mutual_information_matches_python"),
    "dq_anomaly_iqr": (
        "shared Tukey 1.5-IQR fence rule on round-6 quartiles",
        "test_bruteforce_formulas.py::test_anomaly_iqr_matches_python"),
    "text_bigram_logprob": (
        "shared interpolated bigram-LM formula (lambda=0.8)",
        "test_bruteforce_formulas.py::test_bigram_logprob_matches_python"),
    "agg_gini_lorenz": (
        "shared sorted-rank Gini identity + bottom-half share formula",
        "test_bruteforce_formulas.py::test_gini_lorenz_matches_python"),
    "mm_video_scene_cuts": (
        "md5-fold frame signatures over shot-windowed payload slices "
        "+ lag/popcount on both sides",
        "test_bruteforce_dedup_text.py::test_scene_cuts_match_python"),
    "mm_audio_vad_segments": (
        "md5-fold window energies over shared payload slices + "
        "gaps-islands merge on both sides",
        "test_bruteforce_dedup_text.py::test_audio_vad_matches_python"),
    "dedup_incremental_bloom": (
        "md5 position math (4 x mod 65536) over sha256 content hashes "
        "on both sides",
        "test_bruteforce_sketch_sample.py::"
        "test_incremental_bloom_matches_python"),
    "similarity_ann_anchor_graph": (
        "shared fixed-nlist anchor seeding + degree-3 adjacency + one-hop "
        "cell-expansion construction on both sides",
        "test_bruteforce_formulas.py::"
        "test_ann_anchor_graph_matches_python"),
    "similarity_ann_greedy_route": (
        "shared fixed-nlist anchor seeding + degree-8 routing adjacency + "
        "unrolled 3-hop beam-3 walk CTEs on both sides",
        "test_bruteforce_formulas.py::"
        "test_ann_greedy_route_matches_python"),
    "kmeans_embeddings_det": (
        "shared floor(n/k)-th seeding + unrolled 3-iteration Lloyd "
        "CTEs + DECIMAL(38,15) exact means on both sides",
        "test_bruteforce_formulas.py::test_kmeans_det_matches_python"),
    "text_bpe_learn_merges": (
        "shared tokenize + unrolled 8-merge CTEs; greedy fusion is "
        "F.aggregate fold vs list_reduce fold with the same "
        "consumed-lookbehind encoding",
        "test_bruteforce_formulas.py::test_bpe_merges_match_python"),
    "similarity_binary_quant": (
        "shared sign-bit packing (32 dims/word) + XOR popcount "
        "Hamming prefilter construction on both sides",
        "test_bruteforce_formulas.py::test_binary_quant_matches_python"),
    "pack_sequences_greedy": (
        "per-lang greedy fold: applyInPandas loop vs list_reduce "
        "accumulator encoding over the same doc_id order",
        "test_bruteforce_formulas.py::test_pack_greedy_matches_python"),
    "similarity_ann_rp_det": (
        "md5-derived hyperplanes inlined into both sides; 4-bit bands",
        "test_bruteforce_formulas.py::test_ann_rp_det_matches_python"),
    # --- shingle constructions
    "dedup_ngram_jaccard": (
        "3-shingle inverted index + threshold on both sides",
        "test_bruteforce_dedup_text.py::test_ngram_jaccard_values_match_python"
        " (+ test_hypothesis_dedup.py::test_prefix_filter_join_is_exact)"),
    "dedup_containment_pairs": (
        "3-shingle inverted index + containment ratio",
        "test_bruteforce_dedup_text.py::test_containment_pairs_match_python"),
    "contamination_span_coverage": (
        "5-gram window flag vs benchmark set + per-doc interval-union "
        "sweep written in both window-function dialects",
        "test_bruteforce_dedup_text.py::"
        "test_contamination_spans_match_python"),
    "dedup_incremental_neardup": (
        "md5 minhash banding + candidates-only exact-Jaccard verify "
        "generated on both sides",
        "test_bruteforce_dedup_text.py::"
        "test_incremental_neardup_matches_python"),
    "time_interpolate_linear": (
        "shared dense-grid CTE + anchor-window directions + the "
        "(day-prev)/(next-prev) weight formula on both sides",
        "test_bruteforce_formulas.py::"
        "test_interpolate_linear_matches_python"),
    "similarity_hybrid_rrf": (
        "shared shingle-overlap construction + round-6 cosine ordering "
        "+ the RRF 1/(k+rank) formula on both sides",
        "test_bruteforce_formulas.py::test_hybrid_rrf_matches_python"),
    "sample_split_leakage_safe": (
        "shared jaccard CTEs + md5 %100 bucket of the component label "
        "on both sides (components themselves differ: min-label loop "
        "vs recursive CTE)",
        "test_bruteforce_sketch_sample.py::"
        "test_split_leakage_safe_matches_python"),
    "dedup_repeated_spans": (
        "8-gram window df + per-doc interval-union sweep written in "
        "both window-function dialects",
        "test_bruteforce_dedup_text.py::test_repeated_spans_matches_python"),
    "text_dup_ngram_coverage": (
        "3-shingle document-frequency construction",
        "test_bruteforce_dedup_text.py::test_dup_ngram_coverage_matches_python"),
    "text_repetition_signals": (
        "bigram-dup + top-token-fraction construction",
        "test_bruteforce_dedup_text.py::test_repetition_signals_match_python"),
    "contamination_5gram": (
        "5-gram benchmark-set semi-join construction",
        "test_bruteforce_dedup_text.py::test_contamination_5gram_matches_python"),
    "text_fingerprint": (
        "sha256 of space-joined canonical tokens",
        "test_bruteforce_dedup_text.py::test_text_fingerprint_matches_python"),
    "text_lang_id": (
        "marker-word score table shared by both sides",
        "test_bruteforce_dedup_text.py::test_lang_id_matches_python"),
    "udtf_explode_bigrams": (
        "bigram construction on both sides",
        "test_bruteforce_dedup_text.py::test_explode_bigrams_matches_python"),
    "sql_table_udf_trigrams": (
        "char-trigram construction on both sides",
        "test_bruteforce_dedup_text.py::test_table_udf_trigrams_matches_python"),
    # --- deterministic sketches
    "sketch_bloom_det": (
        "md5 position math (4 x mod 2048) on both sides",
        "test_bruteforce_sketch_sample.py::test_bloom_det_matches_python"),
    "sketch_count_min_det": (
        "md5 bucket math (4 x mod 8192) on both sides",
        "test_bruteforce_sketch_sample.py::test_count_min_det_matches_python"),
    "sketch_hll_det": (
        "md5 register/rho math + alpha constant on both sides",
        "test_bruteforce_sketch_sample.py::test_hll_det_matches_python"),
    "agg_quantile_hist_est": (
        "64-bin grid + interpolation formula on both sides",
        "test_bruteforce_sketch_sample.py::test_quantile_hist_est_matches_python"),
    # --- md5 sampling / splits
    "sample_split_3way": (
        "md5 %100 bucket split on both sides",
        "test_bruteforce_sketch_sample.py::test_split_3way_matches_python"),
    "sample_stratified_hash": (
        "md5 %100 bucket + per-lang rate table",
        "test_bruteforce_sketch_sample.py::test_stratified_hash_matches_python"),
    "sample_per_group": (
        "md5-ordered row_number construction",
        "test_bruteforce_sketch_sample.py::test_per_group_matches_python"),
    "sample_weighted_priority": (
        "md5-uniform priority-sampling transform",
        "test_bruteforce_sketch_sample.py::test_weighted_priority_matches_python"),
    "shard_mix_entropy": (
        "md5 %16 shard assignment + entropy formula",
        "test_bruteforce_sketch_sample.py::test_shard_mix_entropy_matches_python"),
    # --- fingerprints / layout
    "validate_table_fingerprint": (
        "md5 row-hash rendering + integer checksum on both sides",
        "test_bruteforce_sketch_sample.py::test_table_fingerprint_matches_python"),
    "fn_surrogate_keys": (
        "md5 UUID-format key minting on both sides",
        "test_bruteforce_sketch_sample.py::test_surrogate_keys_match_python"),
    "layout_zorder": (
        "8+8-bit Morton interleave on both sides",
        "test_bruteforce_sketch_sample.py::test_zorder_matches_python"),
    # --- multimodal
    "mm_decode_features": (
        "md5 payload digests + byte accounting",
        "test_bruteforce_sketch_sample.py::test_mm_decode_features_matches_python"),
    "mm_decode_arrow": (
        "same semantics via the Arrow decode path",
        "test_bruteforce_sketch_sample.py::test_mm_decode_features_matches_python"),
    "mm_chunk_dedup_ratio": (
        "64-char chunk md5 digests on both sides",
        "test_bruteforce_sketch_sample.py::test_mm_chunk_dedup_matches_python"),
    "mm_resize_stub": (
        "shared synthetic-dimension arithmetic",
        "test_bruteforce_sketch_sample.py::test_mm_resize_stub_matches_python"),
    # --- text / training formulas
    "text_token_entropy": (
        "shared tokenizer + entropy decimal convention",
        "test_bruteforce_formulas.py::test_token_entropy_matches_python"),
    "text_unigram_logprob": (
        "shared unigram-LM formula",
        "test_bruteforce_formulas.py::test_unigram_logprob_matches_python"),
    "text_tfidf": (
        "shared idf smoothing constants",
        "test_bruteforce_formulas.py::test_tfidf_matches_python"),
    "text_bm25": (
        "shared BM25 constants (k1, b) and formula",
        "test_bruteforce_formulas.py::test_bm25_matches_python"),
    "similarity_tfidf_pairs": (
        "shared shingle weighting + df cap + cosine threshold",
        "test_bruteforce_formulas.py::test_tfidf_pair_cosine_matches_python"),
    "pipeline_training_data": (
        "shared thresholds + md5 content-hash dedup",
        "test_bruteforce_formulas.py::test_pipeline_training_data_matches_python"),
    "quality_filter_report": (
        "shared waterfall thresholds/order",
        "test_bruteforce_formulas.py::test_quality_filter_report_matches_python"),
    "lang_temperature_sampling": (
        "shared temperature formula (alpha=0.3)",
        "test_bruteforce_formulas.py::test_lang_temperature_matches_python"),
    "text_token_ids": (
        "shared vocab-ranking + id-mapping construction",
        "test_bruteforce_formulas.py::test_token_ids_match_python"),
    "pack_sequences_offset": (
        "shared cumulative-offset packing arithmetic",
        "test_bruteforce_formulas.py::test_pack_sequences_offset_matches_python"),
    "drift_psi_value": (
        "shared 10-bucket grid + 0.5-smoothing PSI formula",
        "test_bruteforce_formulas.py::test_psi_matches_python"),
    "pagerank_nation_trade": (
        "oracle unrolled from the same update formula",
        "test_bruteforce_formulas.py::test_pagerank_matches_numpy_power_iteration"),
    "stream_sliding_batch_twin": (
        "window-offset enumeration shared by both sides",
        "test_bruteforce_formulas.py::test_sliding_window_matches_python"),
    "time_resample_ffill": (
        "shared day-grid + forward-fill construction",
        "test_bruteforce_formulas.py::test_resample_ffill_matches_python"),
    # --- temporal / spatial / graph (r5 hypothesis differentials)
    "join_interval_overlap": (
        "(key, time-cell) bucketing on both sides",
        "test_hypothesis_temporal.py::test_overlap_pairs_match_bruteforce"),
    "interval_max_concurrency": (
        "+1/-1 boundary-sweep construction on both sides",
        "test_hypothesis_temporal.py::test_max_concurrency_matches_bruteforce"),
    "join_spatial_neighbors": (
        "grid-snap bucketing on both sides",
        "test_hypothesis_graph.py::test_spatial_pairs_match_bruteforce"),
    "scd2_event_intervals": (
        "gaps-and-islands construction on both sides",
        "test_hypothesis_graph.py::test_scd2_islands_match_linear_walk"),
    "graph_triangle_count": (
        "oriented-edge 2-path closure on both sides",
        "test_hypothesis_graph.py::test_triangle_counts_match_bruteforce"),
    "embedding_quantize_int8": (
        "shared quantization grid",
        "test_hypothesis_dedup.py::test_quantize_codes_in_range"),
    # --- closed-form stats (shared formula strings; ADVICE r5)
    "agg_stats_moments": (
        "oracle generated from the same _SUFF/_MOMENT strings",
        "test_stats_natives.py::test_moments_match_spark_natives"
        " (+ numpy brute force)"),
    "agg_regression": (
        "oracle generated from the same _REGR strings",
        "test_stats_natives.py::test_regression_match_spark_natives"
        " (+ numpy brute force)"),
    "agg_higher_moments": (
        "oracle generated from the same power-sum strings",
        "test_stats_natives.py::test_higher_moments_match_spark_natives"
        " (+ numpy brute force)"),
    # --- round-6 additions
    "shard_assign_balanced": (
        "(rank-1) % N_SHARDS dealing arithmetic on both sides",
        "test_bruteforce_sketch_sample.py::"
        "test_shard_assign_balanced_matches_python"),
    # --- round-9 continuation batch
    "similarity_ann_ivf": (
        "shared fixed-nlist stride centroid seeding + two-stage probe "
        "construction on both sides",
        "test_bruteforce_formulas.py::test_ann_ivf_matches_python"),
    "similarity_ann_ivf_pruned": (
        "same shared IVF construction, index materialized partitioned "
        "by cell (identical output contract to similarity_ann_ivf)",
        "test_bruteforce_formulas.py::test_ann_ivf_matches_python"),
    "similarity_ann_recall_report": (
        "composes the shared IVF probe construction with the "
        "brute-force top-K; the recall intersection join is stated "
        "identically on both sides",
        "test_bruteforce_formulas.py::"
        "test_ann_recall_report_matches_python"),
    "privacy_dp_laplace_det": (
        "shared md5-uniform seed + Laplace inverse-CDF formula on "
        "both sides",
        "test_bruteforce_formulas.py::test_dp_laplace_matches_python"),
    "time_cusum_changepoint": (
        "shared CUSUM running-sum + arg-max-|S| rule on both sides",
        "test_bruteforce_formulas.py::"
        "test_cusum_changepoint_matches_python"),
    "text_zipf_slope": (
        "shared OLS sufficient-statistics formula over the shared "
        "rank construction",
        "test_bruteforce_formulas.py::test_zipf_slope_matches_python"),
    "embedding_pq_codes": (
        "shared %100 codebook seeding + per-subspace distance fold "
        "on both sides",
        "test_bruteforce_formulas.py::test_pq_codes_match_python"),
    "graph_jaccard_link_pred": (
        "symmetric-adjacency wedge-join construction on both sides",
        "test_hypothesis_graph.py::"
        "test_jaccard_link_pred_matches_bruteforce"),
    "window_ewma_smooth": (
        "shared frame-list + positional pow weighting on both sides",
        "test_bruteforce_formulas.py::test_ewma_smooth_matches_python"),
    "time_seasonal_decompose": (
        "shared centered-MA trend + per-dow seasonal-mean "
        "construction on both sides",
        "test_bruteforce_formulas.py::"
        "test_seasonal_decompose_matches_python"),
    "dq_wilson_ci": (
        "shared Wilson closed-form expression tree on both sides",
        "test_bruteforce_formulas.py::test_wilson_ci_matches_python"),
    "sample_stratified_neyman": (
        "shared Neyman weight construction + largest-remainder "
        "top-up rule on both sides",
        "test_bruteforce_formulas.py::"
        "test_stratified_neyman_matches_python"),
    "graph_degree_assortativity": (
        "shared symmetric-adjacency + sufficient-statistics "
        "construction on both sides",
        "test_hypothesis_graph.py::"
        "test_degree_assortativity_matches_bruteforce"),
    "agg_theil_index": (
        "shared (x/mu)·ln(x/mu) formula over the shared cents "
        "construction",
        "test_bruteforce_formulas.py::test_theil_index_matches_python"),
    "dedup_cdc_chunking": (
        "shared rolling-md5 window + cut-mask construction on both "
        "sides",
        "test_bruteforce_formulas.py::"
        "test_cdc_chunking_matches_python"),
    "sample_poisson_det": (
        "shared md5 seed + generated inverse-CDF CASE ladder on both "
        "sides",
        "test_bruteforce_formulas.py::test_poisson_det_matches_python"),
    "text_ngram_novelty_curve": (
        "shared 8-shingle + first-occurrence construction on both "
        "sides",
        "test_bruteforce_formulas.py::"
        "test_ngram_novelty_matches_python"),
    "dq_ks_two_sample": (
        "shared time-midpoint split + ECDF-step construction and the "
        "1.358 critical constant on both sides",
        "test_bruteforce_formulas.py::test_ks_two_sample_matches_python"),
    "graph_label_propagation": (
        "oracle unrolled from the same synchronous mode-update rule "
        "(generated CTE chain, the pagerank precedent)",
        "test_hypothesis_graph.py::"
        "test_label_propagation_matches_bruteforce"),
    "text_lang_id_eval": (
        "embeds text_lang_id's marker-score construction verbatim "
        "(the quality_lm_buckets composition rule)",
        "test_bruteforce_dedup_text.py::test_lang_id_matches_python "
        "(the classifier) + "
        "test_bruteforce_formulas.py::test_lang_id_eval_matches_python",),
    "text_hashing_trick_det": (
        "shared md5-mod-bucket construction on both sides",
        "test_bruteforce_formulas.py::"
        "test_hashing_trick_matches_python"),
    "graph_modularity_score": (
        "embeds the generated LPA CTE chain verbatim + shared "
        "modularity identity",
        "test_bruteforce_formulas.py::test_modularity_matches_python"),
    "agg_hhi_concentration": (
        "shared 10000*sum(share^2) formula over the shared cents "
        "construction",
        "test_bruteforce_formulas.py::test_hhi_matches_python"),
    "time_autocorr_lag": (
        "shared Pearson sufficient-statistics closed form over the "
        "shared lag-pair construction",
        "test_bruteforce_formulas.py::test_autocorr_lag_matches_python"),
    "text_sttr_diversity": (
        "shared 50-token chunk slicing + TTR fold on both sides",
        "test_bruteforce_formulas.py::test_sttr_matches_python"),
}

#: notable independent-formulation rationales (everything oracled and
#: not in MIRRORED or probe-prefixed is independent; these rows carry
#: a more specific reason than the default)
INDEPENDENT_NOTES: dict[str, str] = {
    "dedup_clusters": "min-label propagation loop vs recursive-CTE "
                      "reachability — different algorithms",
    "dedup_clusters_sharded": "min-label propagation loop vs "
                              "recursive-CTE reachability (different "
                              "algorithms), per (source, ingest-"
                              "batch) shard",
    "sql_recursive_hierarchy": "native recursion on both engines",
    "stream_tumbling_batch_twin": "Spark window() vs DuckDB "
                                  "time_bucket() — native on each side",
    "stream_session_batch_twin": "Spark session_window() vs SQL "
                                 "gaps-and-islands — different "
                                 "formulations",
    "dedup_fuzzy_edit_distance": "native levenshtein on both engines",
    "dedup_embedding_cosine": "block-matrix BLAS vs SQL list cosine — "
                              "different formulations",
    "similarity_topk_bruteforce": "expression-tree dot product vs SQL "
                                  "list ops",
    "contamination_embedding": "broadcast argmax vs SQL list ops",
    "embedding_centroid_summary": "posexplode aggregate vs SQL list ops",
    "dedup_exact": "sha2 content hash is a public standard; grouping "
                   "is declarative on both sides",
    "fn_hash_digests": "md5/sha256 are public standards with "
                       "independent engine implementations",
    "graph_bfs_hops": "iterative keyed-min relaxation vs recursive-CTE "
                      "set-semantics closure — different algorithms "
                      "(plus a queue-BFS hypothesis differential in "
                      "test_hypothesis_graph.py)",
    "sql_recursive_cte_bfs": "UNION ALL walk enumeration with "
                             "simple-path pruning vs DuckDB's "
                             "set-semantics UNION closure — different "
                             "recursion semantics reaching the same "
                             "min; also pinned row-for-row to the "
                             "loop form (test_iterative.py) whose "
                             "queue-BFS hypothesis differential "
                             "covers the shared edge construction",
    "snapshot_diff_audit": "full-outer diff is declarative on both "
                           "sides; the delta spec is shared INPUT "
                           "construction, not algorithm",
    "part_skyline_dominance": "window frontier (the O(n log n) 2-D "
                              "rewrite) vs NOT EXISTS dominance "
                              "self-join — different algorithms "
                              "(plus a pairwise brute force in "
                              "test_bruteforce_formulas.py)",
    "attribution_linear_multi_touch": "declarative join/window "
                                      "restatement on both sides "
                                      "(plus a pure-Python credit "
                                      "split in "
                                      "test_bruteforce_formulas.py)",
    "source_binary_files": "oracle recomputes length + md5 straight "
                           "from the source table; the binary "
                           "sink/scan path under test exists only on "
                           "the Spark side",
    "events_time_to_convert": "declarative first-signup/first-purchase "
                              "join restatement on both sides (plus a "
                              "pure-Python walk in "
                              "test_bruteforce_formulas.py)",
    "dq_late_arrival_audit": "declarative running-max window "
                             "restatement on both sides (plus a "
                             "pure-Python replay in "
                             "test_bruteforce_formulas.py)",
    "window_anchored_vwap": "declarative cumulative-window "
                            "restatement; sums are exact decimal on "
                            "both sides (plus a pure-Python walk in "
                            "test_bruteforce_formulas.py)",
    "time_downsample_m4": "min/max/first/last are pure selections, "
                          "declarative on both sides (plus a "
                          "pure-Python walk in "
                          "test_bruteforce_formulas.py)",
    "window_max_drawdown": "running max is a selection window, "
                           "declarative on both sides (plus a "
                           "pure-Python walk in "
                           "test_bruteforce_formulas.py)",
    "events_stickiness": "declarative distinct/count restatement on "
                         "both sides (plus a pure-Python walk in "
                         "test_bruteforce_formulas.py)",
}

DEFAULT_INDEPENDENT = ("declarative ANSI twin; engines plan and "
                       "evaluate independently")


def classify() -> dict[str, tuple[str, str]]:
    """name -> (class, note/differential) for every ORACLED query."""
    from mapreducewordcounting_spark.registry import all_queries

    out: dict[str, tuple[str, str]] = {}
    for name, spec in all_queries().items():
        if spec.oracle is None:
            continue
        if name in MIRRORED:
            cons, diff = MIRRORED[name]
            out[name] = ("mirrored", f"{cons} -> {diff}")
        elif name.startswith("probe_"):
            out[name] = ("probe", "self-referential by design — the "
                                  "mirroring IS the measurement "
                                  "(operators/probes.py)")
        else:
            out[name] = ("independent",
                         INDEPENDENT_NOTES.get(name, DEFAULT_INDEPENDENT))
    return out


MARK_BEGIN = "<!-- ORACLE-INVENTORY:BEGIN (generated by tools/oracle_classes.py) -->"
MARK_END = "<!-- ORACLE-INVENTORY:END -->"


def render_table() -> str:
    cls = classify()
    n_mir = sum(1 for c, _ in cls.values() if c == "mirrored")
    n_ind = sum(1 for c, _ in cls.values() if c == "independent")
    n_prb = sum(1 for c, _ in cls.values() if c == "probe")
    lines = [
        MARK_BEGIN,
        "",
        "## Oracle-independence inventory (VERDICT r5 item 4)",
        "",
        f"All {len(cls)} oracled queries classified: {n_ind} independent "
        f"formulations, {n_mir} construction-mirroring (each with a "
        f"structure-free brute-force differential), {n_prb} by-design "
        f"self-referential probes. Regenerate with "
        f"`python tools/oracle_classes.py`; completeness is asserted by "
        f"`tests/test_oracle_inventory.py`.",
        "",
        "| query | class | mirrored construction → differential / note |",
        "|---|---|---|",
    ]
    for name in sorted(cls):
        c, note = cls[name]
        lines.append(f"| {name} | {c} | {note} |")
    lines += ["", MARK_END]
    return "\n".join(lines)


def main() -> int:
    path = os.path.join(REPO, "TESTDATA.md")
    with open(path) as f:
        doc = f.read()
    table = render_table()
    if MARK_BEGIN in doc:
        doc = re.sub(re.escape(MARK_BEGIN) + r".*?" + re.escape(MARK_END),
                     table, doc, flags=re.S)
    else:
        doc = doc.rstrip() + "\n\n" + table + "\n"
    with open(path, "w") as f:
        f.write(doc)
    print(f"wrote inventory ({len(classify())} oracles) into {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
