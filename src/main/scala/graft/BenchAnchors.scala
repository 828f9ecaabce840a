package graft

/** Per-query regression anchors for [[Bench]]: seconds at sf0.1 on
  * local[32], taken as the per-query max of the round-6 driver run and a
  * round-7 quiet-box run (conservative against load jitter — the bench
  * box documents 30-100% run-to-run variance). A query slower than
  * [[Bench.RegressionFactor]] x its anchor prints in a WARN table and
  * its ratio lands in the bench JSON under "regressions", so each round
  * self-adjudicates instead of deferring spikes to the next judge pass.
  * Queries without an anchor (newly registered) are skipped; refresh an
  * anchor only from an isolated warm median (see BASELINE.md round-5
  * adjudication protocol).
  */
object BenchAnchors {
  // base ++ r14DataShift overlap is INTENTIONAL (the documented re-anchor
  // class: the data-shift value wins); duplicates WITHIN a literal are not.
  val seconds: Map[String, Double] =
    checked("base", base) ++ checked("r14DataShift", r14DataShift) ++
      checked("r16Refresh", r16Refresh)

  /** Round-16 optimization-round refresh (r14DataShift protocol: loaded
    * anchor ≈ 1.45× the 5-rep solo quiet-box median, median itself in
    * [[r16IsolatedRefresh]]). Two classes: (a) the round-boundary DATA
    * REGENERATION moved the gate's volume (vec_ingest_assignment read
    * 2.2× and graph_bfs_khop 2.1× against old-data anchors on a quiet
    * box — pure data shift, adjudicated solo per the SKILL protocol);
    * (b) this round's optimizations made the old anchor so loose it
    * would hide a real regression (kcore 9.83→6.63 s, triangles
    * 7.80→5.88 s, textrank 5.81→4.15 s — OPTIMIZATION_r16.md). */
  private def r16Refresh: Seq[(String, Double)] = Seq(
    "vec_ingest_assignment" -> 0.87,   // iso 0.603 (data regen)
    "graph_bfs_khop" -> 8.56,          // iso 5.901 (data regen)
    "graph_eccentricity" -> 13.06,     // iso 9.008 (data regen, net of early-exit)
    "graph_kcore" -> 9.61,             // iso 6.631 (tightened after optimization)
    "graph_triangles" -> 8.52,         // iso 5.875 (tightened after optimization)
    "text_textrank_keywords" -> 6.01,  // iso 4.145 (tightened after optimization)
    // solo 5-rep reps 5.63-6.99 on the regenerated data (old-data anchor
    // 4.772); its in-bench regime additionally runs ~1.6-2.4x the solo
    // median (the load class the best-of-3 remeasure prices), so the
    // old anchor false-flagged at 3.04x on a box whose controls read 1.02
    "graph_hits" -> 8.86               // iso 6.108 (data regen)
  )

  private def base: Seq[(String, Double)] = Seq(
    // round-16 statistical-test wave: anchors = 2x the 5-rep quiet-box
    // probe medians (0.33/0.53/0.39/1.16/0.20/0.42 s) — the loaded-
    // regime headroom every fresh gate gets until its first in-bench
    // distribution is recorded
    // wave-2/3 gates: anchors = 2x the quiet-box 5-rep medians
    // (0.92/0.69/0.25/0.66 and 1.19/0.45 s; control dedup_exact 0.83x)
    "rel_anova_f" -> 1.85,
    "rel_friedman_test" -> 1.40,
    "rel_chi2_gof" -> 0.50,
    "rel_tukey_fences" -> 1.35,
    // k_truss first priced in-bench at 4.71 s (vs 1.19 isolated) — root
    // cause was round-2 RE-RUNNING round-1's whole support join through
    // un-checkpointed lineage, fixed by the per-round localCheckpoint
    // (the standing iterative-loop rule); anchor at 2x the post-fix
    // isolated median
    "graph_k_truss" -> 2.20,
    "rel_pareto_days" -> 0.90,
    "rel_holt_linear" -> 0.60,
    "rel_page_hinkley" -> 0.50,
    // r17 wave (tar roundtrip + model-eval gates): anchors = 2x the
    // 5-rep quiet-box medians (1.03/0.31/0.31/0.21/0.31 s)
    "multimodal_tar_roundtrip" -> 2.05,
    "rel_calibration_bins" -> 0.62,
    "rel_fdr_bh" -> 0.62,
    "rel_roc_auc" -> 0.43,
    "rel_lift_deciles" -> 0.63,
    "rel_ks_test" -> 0.70,
    "rel_kendall_tau" -> 1.05,
    "rel_spearman_rho" -> 0.80,
    "rel_cramers_v" -> 2.30,
    "rel_mcnemar" -> 0.45,
    "rel_runs_test" -> 0.85,
    "ann_ivf_cosine" -> 1.009,
    "dedup_clusters" -> 3.819,
    "dedup_cosine_exact" -> 0.52, // round-8 isolated median (box drift)
    // re-anchored round 8 (isolated warm medians): the salted
    // bandCandidates path adds a bucket-size aggregation + broadcast —
    // ~0.4 s at sf0.1, the deliberate price of hot-band skew-safety
    // (round 7 anchor 1.29 priced the round-6 identical-content guard)
    "dedup_cosine_lsh" -> 1.68,
    "dedup_exact" -> 1.0, // tightened round 8 (isolated median)
    "dedup_minhash" -> 1.679,
    // re-anchored round 10: 3-rep isolated median 1.90 (was 1.299; the
    // 1.87x quiet-bench ratio adjudicated as box/data drift, not a code
    // regression — no simhash-path change this round)
    "dedup_simhash" -> 1.90,
    "multimodal_decode" -> 0.222,
    "multimodal_frames" -> 0.47,
    // round-8 additions: real-codec decode gate (isolated warm median
    // 1.005 s at sf0.1) and the production-shape dim-768 seal+query row
    // (warm in-JVM reps 14.3-24.8 s cold-first; SF-independent
    // generated corpus)
    "multimodal_decode_real" -> 1.0,
    "vec_heavy_seal_query" -> 16.0,
    "pipeline_decontaminate" -> 0.83,
    "pipeline_embed_quantize" -> 0.30,
    "pipeline_mixture_rebalance" -> 0.256,
    "pipeline_pack_sequences" -> 0.203,
    "pipeline_split_assignment" -> 0.263,
    "rel_agg_distinct" -> 0.155,
    "rel_asof_attribution" -> 0.223,
    "rel_cube_flag_year" -> 0.6,
    "rel_events_hourly" -> 0.619,
    "rel_json_extract" -> 0.179,
    "rel_percentiles" -> 0.253,
    "rel_pivot_events" -> 0.281,
    "rel_q13_cust_distribution" -> 0.571,
    "rel_q17_small_quantity" -> 0.534,
    "rel_q18_large_orders" -> 0.721,
    "rel_q1_pricing_summary" -> 0.309,
    "rel_q3_shipping_priority" -> 0.666,
    "rel_q4_order_priority" -> 0.728,
    // tightened round 8 from isolated warm medians: these anchors were
    // taken on older/denser data or pre-optimization code and sat >2x
    // above current medians, masking real regressions
    "rel_q5_region_volume" -> 1.05,
    "rel_range_join" -> 0.54,
    "rel_rollup_flags" -> 1.295,
    "rel_scalar_functions" -> 0.48,
    "rel_sessionize" -> 0.619,
    "rel_setop_except" -> 0.426,
    "rel_setop_intersect" -> 0.311,
    "rel_unpivot_part" -> 0.16,
    "rel_window_running_qty" -> 0.168,
    "rel_window_topk_parts" -> 0.322,
    "stream_dedup_survivors" -> 1.713, // r12 one-job batch staging
    "stream_events_hourly" -> 1.516,
    "stream_sessionize" -> 1.863,
    // refreshed round 8 from a 5-rep isolated warm median (0.235; the
    // 6.6x flag in the loaded 157-query run was box jitter — adjudicated)
    "text_fingerprint_sketch" -> 0.235,
    "text_langid" -> 0.17,
    "text_repetition" -> 0.131,
    "text_stats" -> 0.231,
    "text_vocab_topk" -> 0.471,
    "vec_compaction_scoring" -> 0.544,
    "vec_gid_resolve" -> 0.226,
    "vec_ingest_assignment" -> 0.272,
    // round-7 additions, from isolated warm medians (3 reps, quiet box)
    "vec_knn_sealed_pruned" -> 0.98,
    // re-anchored round 7 (second half): six isolated reps on 2026-08-13
    // cluster between 0.97-1.5 s (median ~1.2) vs the original 0.71 —
    // persistent box-level drift, not a plan change (protocol:
    // BASELINE.md round-5 adjudication; anchor = isolated-rep max)
    "vec_knn_during_compaction" -> 1.50,
    "vec_knn_brute_cosine" -> 0.379,
    "vec_knn_brute_l2" -> 0.273,
    "vec_knn_post_vacuum" -> 1.122,
    "vec_knn_sealed" -> 0.678,
    "vec_knn_sealed_alpha1" -> 0.578,
    "vec_knn_sealed_beam" -> 0.723,
    "vec_knn_sealed_deleted" -> 0.572,
    "vec_knn_sealed_pivots" -> 0.598,
    "vec_knn_writing_invisible" -> 0.533,
    "vec_medoid" -> 0.548,
    "vec_norm_stats" -> 0.145,
    "vec_seal_build" -> 1.949,
    "vec_segment_counters" -> 0.241,
    "vec_vacuum_policy" -> 0.279,
    // round-7 additions (quiet-box sf0.1 run, 2026-08-12)
    "embed_label_centroids" -> 0.28,
    "pipeline_end_to_end" -> 1.24,
    "pipeline_stratified_sample" -> 0.28,
    "rel_bucketed_join" -> 1.45,
    "text_pii_scan" -> 0.11,
    "text_tfidf_topk" -> 0.95,
    "embed_dispersion_outliers" -> 0.66,
    "pipeline_jsonl_roundtrip" -> 0.56,
    "sql_graft_functions" -> 0.28,
    "stream_sliding_windows" -> 1.30,
    "pipeline_leakage_safe_split" -> 0.37,
    // re-anchored round 9: 5-rep isolated median 0.32 (was 0.11 from a
    // round-7 quieter box; code path unchanged — sub-second fixed-cost
    // drift, the same class as the round-8 dedup_cosine_exact re-anchor)
    "text_bpe_regex_count" -> 0.321,
    // round-7 fourth wave, anchored from isolated warm runs (2 reps):
    // the graph queries are honest big-shuffle workloads (1M-edge
    // 3-round PageRank; 30M-wedge triangle join) — anchored at their
    // measured medians, not padded
    "graph_pagerank" -> 5.3,
    // re-anchored 2026-08-13 on the round-7 REGENERATED testdata (20k
    // parts, 1.2M-edge co-purchase graph — denser than the old data's;
    // the old-data anchor was 10.95 and the old kernel measured 22.7 s
    // on the new graph). Median with the sorted-merge intersect kernel
    // + size-aware adjacency broadcast (GraphAlgos.wedgeClose).
    "graph_triangles" -> 9.923,
    "text_chunk_windows" -> 0.57,
    "text_bpe_pair_counts" -> 1.6,
    // tightened round 8: the batched trainer (11 rounds, not 20) probes
    // at 2.73 s isolated — the old 6.6 anchor would let a 5x regression
    // of the batching pass silently
    "text_bpe_learn_merges" -> 2.73,
    "ann_maxsim_multivector" -> 0.75,
    "rel_zorder_layout" -> 0.35,
    // round-7 late additions (max of 3 isolated quiet-box reps at sf0.1,
    // 2026-08-13; stream_interval_join anchored at its 8-state-partition
    // config — see the gate's sizing comment)
    "ann_ivfpq_cosine" -> 1.41,
    "dedup_ngram_spans" -> 2.13,
    "embed_matryoshka_topk" -> 1.40,
    "stream_interval_join" -> 2.98,
    "rel_q6_forecast_revenue" -> 0.20,
    "rel_q7_volume_shipping" -> 0.88,
    "rel_q8_market_share" -> 0.90,
    "rel_q10_returned_items" -> 0.74,
    "rel_q14_promo_effect" -> 0.33,
    "rel_q15_top_supplier" -> 0.63,
    "rel_q19_disjunctive_revenue" -> 0.41,
    "rel_q22_idle_customers" -> 0.52,
    "text_unigram_nll" -> 0.84,
    "cluster_kmeans" -> 0.60,
    "ann_ivf_distributed" -> 1.27,
    "dedup_incremental" -> 0.90,
    "rel_salted_join" -> 2.23,
    "rel_q21_blame_supplier" -> 1.35,
    "stream_outer_join" -> 3.61,
    "rel_stats_aggregates" -> 0.37,
    "ann_ivf_filtered" -> 0.61,
    "rel_bloom_prejoin" -> 0.77,
    "rel_window_range_frame" -> 0.18,
    "rel_array_functions" -> 0.18,
    "rel_funnel_conversion" -> 0.64,
    "dedup_segments" -> 0.75,
    // refreshed round 7 from an isolated warm median (was 1.44; the op
    // is unchanged — quiet-box medians moved with ambient load)
    "text_bpe_encode" -> 0.445, // r11 Zipf-memo encode killed the dual regime
    "dedup_semantic" -> 1.40,
    "pipeline_weighted_sample" -> 0.29,
    "text_quality_filter" -> 1.06,
    "embed_centroid_classify" -> 0.58,
    // round-7 additions, isolated warm medians (3 reps, quiet box)
    "text_bigram_nll" -> 1.404,
    "text_oov_rate" -> 0.530,
    "text_bm25_topk" -> 1.400,
    "ann_hybrid_rrf" -> 2.562,
    "embed_random_projection" -> 0.905,
    "ann_sq8_cosine" -> 1.111,
    "stream_static_enrich" -> 2.175,
    "embed_hard_negatives" -> 0.634,
    "pipeline_snapshot_merge" -> 0.781,
    "rel_fuzzy_join" -> 0.711,
    "pipeline_token_budget" -> 1.718,
    "embed_drift" -> 1.102,
    "dedup_source_overlap" -> 1.638,
    "stream_vec_ingest" -> 2.171, // r12 one-job batch staging
    "embed_pca_power" -> 1.612,
    "vec_knn_federated" -> 2.774,
    "rel_retention_cohorts" -> 0.793,
    "pipeline_mixture_temperature" -> 0.683,
    "pipeline_data_cards" -> 0.966,
    "vec_pack_roundtrip" -> 0.729,
    "vec_range_search" -> 0.475,
    "dedup_incremental_minhash" -> 2.28,
    // round-7 second-wave additions (isolated warm medians, quiet box)
    "rel_q2_min_cost_supplier" -> 1.873,
    "rel_q9_product_profit" -> 1.275,
    // q11/pmi re-anchored round 8: the leak-free materialization (eager
    // localCheckpoint + unpersist of the cached intermediate, advisor
    // fix) costs a ~0.3 s CONSTANT per invocation at sf0.1 — scheduling
    // + storage of the checkpoint job, not scaling work; the cache no
    // longer outlives the call (isolated warm medians 0.912 / 1.068)
    "rel_q11_important_stock" -> 0.92,
    "rel_q12_late_lines" -> 1.069,
    "rel_q16_supplier_counts" -> 1.538,
    "rel_q20_excess_suppliers" -> 1.242,
    "text_cms_heavy_hitters" -> 1.213,
    "text_hll_distinct" -> 0.494,
    "text_pmi_bigrams" -> 1.07,
    "text_hll_by_source" -> 0.912,
    "pipeline_schema_evolution" -> 0.798,
    // round-8 continuation additions (isolated warm medians, this box)
    "text_classifier_score" -> 0.315,
    "pipeline_shuffle_shards" -> 0.44,
    "ann_ivf_append" -> 1.305,
    "rel_decay_engagement" -> 0.524,
    "pipeline_corpus_diff" -> 0.665,
    "text_length_histogram" -> 0.655,
    "pipeline_padding_stats" -> 0.584,
    "multimodal_audio_wav" -> 0.331,
    "multimodal_resize_real" -> 0.362,
    "stream_decay_engagement" -> 1.671,
    "rel_hilbert_layout" -> 0.399,
    "text_wordpiece_encode" -> 1.023,
    "text_unigram_viterbi" -> 0.774,
    "graph_ppr" -> 3.678,
    // round-8 continuation additions (isolated warm medians, this box):
    // kcore is co-purchase-graph-build-bound like graph_triangles
    "graph_kcore" -> 7.449,
    "graph_lpa" -> 4.519,
    "graph_hits" -> 4.772,
    "ann_hamming_cosine" -> 0.676,
    "ann_ivfpq_residual" -> 1.269,
    "pipeline_cdc_chunks" -> 0.54,
    "dedup_cdc_chunks" -> 1.905,
    "graph_bfs_khop" -> 4.226,
    "graph_link_predict" -> 2.089,
    "graph_link_ra" -> 2.102,
    "multimodal_frames_real" -> 2.347,
    "ann_pcapq_cosine" -> 1.303,
    "stream_cms_merge" -> 4.407, // r12 one-job batch staging
    "graph_pagerank_weighted" -> 5.051,
    "rel_gapfill_resample" -> 0.40,
    "rel_partitioned_scan" -> 0.866,
    "graph_semantic_communities" -> 8.365,
    "rel_gapfill_lerp" -> 0.556,
    "text_llr_bigrams" -> 1.239,
    // round-9 additions (isolated warm medians, this box): textrank is
    // PR-round-bound like graph_pagerank; stream_hdr is staging+stream-
    // startup-bound like stream_cms_merge
    "rel_hdr_quantiles" -> 0.944,
    "text_textrank_keywords" -> 5.248,
    "rel_orc_roundtrip" -> 0.828,
    "rel_csv_roundtrip" -> 1.055,
    "pipeline_chat_format" -> 0.555,
    "rel_file_compaction" -> 1.872,
    // re-anchored round 11: the r10 3.1x flag adjudicated via 5-rep
    // isolated median 1.493 (bench-context pressure, not a regression);
    // the round-11 tf2-persist fix (one tokenize pass instead of four)
    // adds a ~0.3 s constant persist+checkpoint cost at sf0.1 that buys
    // flat scaling of the ctx/cont/totals legs at 100 TB
    "text_kn_nll" -> 1.493,
    "rel_column_stats" -> 0.361,
    "text_phrase_search" -> 1.569,
    "stream_hdr_quantiles" -> 3.301, // r12 one-job batch staging
    "multimodal_audio_decimate" -> 0.711,
    "pipeline_dataset_digest" -> 0.429,
    "pipeline_curriculum_order" -> 1.629,
    "rel_skew_stats" -> 0.497,
    "rel_data_quality" -> 0.291,
    "dedup_bottomk_overlap" -> 1.754,
    "stream_cdc_apply" -> 2.305, // r12 adjudicated: one-job staging + AQE-style state coalesce
    "rel_winsorize" -> 0.408,
    "text_cooccur_pairs" -> 1.417,
    "rel_event_paths" -> 0.608,
    "pipeline_span_corruption" -> 0.612,
    "rel_grouping_sets" -> 0.668,
    "embed_knn_classify" -> 0.654,
    "stream_late_drop" -> 4.881, // 4-batch staging + stream startup, like stream_cms_merge
    // round-10 additions (isolated warm medians, this box); the stream_*
    // rows price file staging + stream startup on top of the query
    "rel_mv_incremental" -> 0.538,
    "stream_mv_incremental" -> 2.299,
    "stream_session_window" -> 2.883, // r12 one-job batch staging
    "text_readability" -> 0.455,
    "text_normalize" -> 0.242,
    "text_zipf_slope" -> 0.514,
    "text_heaps_vocab" -> 0.423, // r12 new gate, 5-rep isolated quiet-box median
    "cluster_silhouette" -> 0.633, // r12 new gate, 5-rep isolated quiet-box median
    "cluster_dbscan_core" -> 0.624, // r13 new gate, 5-rep isolated quiet-box median
    "text_blocklist_aho" -> 0.314, // r13 new gate, 5-rep isolated quiet-box median
    "multimodal_audio_pitch" -> 0.467, // r13 new gate, 5-rep isolated quiet-box median
    // CC-round dominated (star-rewriting over the 1441-core eps-graph).
    // Dual-regime: isolated 5-rep median 3.828, but 4.8-6.8 inside the
    // full 266-query bench session (round-scheduling pressure, the
    // kcore/lpa cost class) — loaded anchor set to the in-bench
    // representative; the tight isolated tripwire lives in
    // isolatedSeconds below.
    "cluster_dbscan_labels" -> 6.0, // r13 gate, in-bench representative
    "graph_path_counts" -> 3.561, // r13 new gate, 5-rep isolated quiet-box median
    "graph_connected_components" -> 3.238, // r13 new gate, 5-rep isolated quiet-box median
    "multimodal_image_hist_eq" -> 0.714, // r13 new gate, 5-rep isolated quiet-box median
    // r14 new gates, 5-rep isolated quiet-box medians (Probe protocol)
    "rel_interval_coverage" -> 0.437,
    "graph_katz_centrality" -> 5.711,
    "graph_stress_paths" -> 10.773,
    "dedup_substring_runs" -> 6.667,
    "pipeline_bradley_terry" -> 3.638,
    "multimodal_box_filter" -> 0.775,
    "rel_kmv_intersect" -> 2.381,
    "rel_markov_transitions" -> 0.531,
    "graph_hash_walks" -> 3.094,
    "rel_cusum_changepoint" -> 0.334,
    "stream_cusum_changepoint" -> 4.762,
    "embed_mutual_knn" -> 2.839,
    "multimodal_audio_flux" -> 0.303,
    "pipeline_group_advantages" -> 0.277,
    "rel_ab_ztest" -> 0.168,
    "rel_gini_revenue" -> 0.514,
    "text_burstiness" -> 0.769,
    "embed_isotropy" -> 0.352,
    "rel_ewma_dyadic" -> 0.874,
    "pipeline_pass_at_k" -> 0.469,
    "graph_betweenness" -> 12.062,
    "dedup_substring_survivors" -> 6.645,
    "graph_harmonic_scaled" -> 4.766,
    "text_ngram_novelty" -> 1.799,
    "text_mattr" -> 0.215,
    "rel_mann_whitney" -> 0.391,
    "rel_association_rules" -> 2.177,
    "multimodal_image_quantize" -> 0.607,
    "rel_welch_ttest" -> 0.343,
    "rel_survival_km" -> 0.813,
    "graph_bipartite_projection" -> 2.806,
    "graph_degree_histogram" -> 2.619,
    "rel_abc_pareto" -> 0.486,
    "rel_acf_seasonality" -> 0.670,
    "rel_chi_square" -> 0.565,
    "text_hapax_ratio" -> 0.376,
    "graph_jaccard_node_sim" -> 2.995,
    "rel_new_vs_returning" -> 0.437,
    "text_simpson_diversity" -> 0.433,
    "graph_rich_club" -> 6.465,
    "multimodal_audio_zcr" -> 0.204,
    "pipeline_dpo_pairs" -> 0.789,
    "multimodal_ahash" -> 0.637,
    // dual-regime query (adjudicated at round-10 close, twice): 5-rep
    // ISOLATED median 1.952, but 4.0-4.4 inside the full 235-query
    // bench — code-cache/JIT pressure on the generated 20-merge BPE
    // chain (same mechanism as text_bpe_encode's in-bench gap; no code
    // change between probes). Anchored at the in-bench regime, the
    // stream_late_drop precedent: the anchor prices the context the
    // driver actually measures, and a real regression still trips at
    // >8.8 s. Re-adjudicate from isolation if it ever flags again.
    "pipeline_tokenizer_fertility" -> 0.714, // r11 Zipf-memo encode killed the dual regime
    "dedup_containment" -> 1.854,
    "dedup_ahash_pairs" -> 1.002,
    "graph_closeness" -> 2.947,
    "rel_scd2_dimension" -> 0.381,
    "rel_window_ntile" -> 0.290,
    "pipeline_interleave_order" -> 0.440,
    "multimodal_scene_cuts" -> 1.954,
    "rel_mad_outliers" -> 0.947,
    "stream_knn_serve" -> 1.120, // r12 one-job batch staging
    "graph_sssp_weighted" -> 2.949,
    "stream_windowed_topk" -> 1.925,
    "multimodal_audio_vad" -> 0.436,
    "rel_partition_overwrite" -> 1.021,
    "stream_transform_with_state" -> 2.130, // r12 one-job batch staging
    "cluster_spherical_kmeans" -> 1.920,
    "multimodal_patch_grid" -> 0.579,
    "text_mixed_language" -> 0.364,
    "text_caps_spans" -> 0.621,
    "multimodal_audio_gain" -> 0.343,
    "stream_scd2" -> 2.401,
    "rel_sequence_gaps" -> 0.541,
    "text_topic_segments" -> 0.635,
    // round-11 additions (isolated warm medians, this box)
    "vec_knn_partitioned" -> 0.724,
    "dedup_edit_verify" -> 2.138, // banded levenshtein + lossless ±1 bucket probe
    "pipeline_epoch_shuffle" -> 0.811,
    // in-bench measurement (the row only ever runs inside the full
    // bench): SIMD pass of the 50k x dim-768 distributed brute top-k;
    // the same run's scalar cross-check pass was 2.89 s (2.0x)
    "vec_simd_l2_topk" -> 1.45,
    // round-11 second wave (5-rep isolated medians, this box)
    "text_char_entropy" -> 0.222,
    "dedup_line_boilerplate" -> 0.436,
    // (the r16 statistical/graph-wave quiet-box MEDIANS that used to sit
    // here were duplicate keys of the 2x-headroom anchors at the top of
    // this literal — Scala Map literals silently keep the LAST entry, so
    // the documented loaded anchors were dead code. Advisor round 15.
    // The medians now live where they were meant to: as isolated Probe
    // tripwires in r14IsolatedTripwires. A duplicate-key guard at the
    // bottom of this file now fails loudly on any recurrence.)
    "pipeline_kappa_agreement" -> 0.230,
    "rel_psi_drift" -> 0.323,
    "graph_modularity" -> 1.346, // one-shot shape, no sizing action
    "dedup_stitch_pairs" -> 1.028,
    "graph_assortativity" -> 1.667, // single-job shape (no sizing action)
    "rel_benford_deviation" -> 0.255,
    "stream_psi_drift" -> 4.932, // 4-batch stage-write + drain per run
    "graph_conductance" -> 1.262, // one-shot shape, no sizing action
    "dedup_threshold_sweep" -> 1.757,
    "text_jsd_sources" -> 1.656,
    "rel_k_anonymity" -> 0.783,
    "multimodal_image_entropy" -> 0.876,
  )

  /** Dual-regime ISOLATED anchors (advisor, round 10): queries whose
    * in-bench anchor was deliberately loosened for code-cache/JIT
    * pressure keep a second, tight anchor at the isolated-warm-median
    * regime. `seconds` gates the driver's loaded run; THIS map gates the
    * Probe adjudication — so a real regression on these paths still
    * trips at 1.5x isolated even though the loaded anchor would absorb
    * it. Probe prints the ratio (and warns) automatically for any query
    * listed here; refresh only from a 5-rep isolated median. */
  val isolatedSeconds: Map[String, Double] = {
    val dual = checked("isolatedDualRegime", isolatedDualRegime)
    val trip = checked("r14IsolatedTripwires", r14IsolatedTripwires)
    val overlap = dual.keySet.intersect(trip.keySet)
    require(overlap.isEmpty, // both maps gate the SAME (isolated) regime
      s"isolated anchor declared twice across waves: ${overlap.toSeq.sorted.mkString(", ")}")
    // r16 refresh OVERRIDES earlier waves by design (the documented
    // re-anchor class: data regen at the round boundary + this round's
    // optimizations; 5-rep solo medians, see r16Refresh scaladoc). The
    // two CONTROL rows are here because box_health divides by these —
    // stale control medians after a data regen misread data shift as a
    // degraded box (baseline bench stamped 1.57 on a quiet box).
    dual ++ trip ++ checked("r16IsolatedRefresh", r16IsolatedRefresh)
  }

  private def r16IsolatedRefresh: Seq[(String, Double)] = Seq(
    "vec_ingest_assignment" -> 0.603,
    "graph_bfs_khop" -> 5.901,
    "graph_eccentricity" -> 9.008,
    "graph_kcore" -> 6.631,
    "graph_triangles" -> 5.875,
    "text_textrank_keywords" -> 4.145,
    "rel_markov_transitions" -> 0.613, // control row (data regen)
    "graph_hash_walks" -> 3.726,       // control row (data regen)
    "graph_hits" -> 6.108              // data regen (5-rep solo)
  )

  private def isolatedDualRegime: Seq[(String, Double)] = Seq(
    "pipeline_tokenizer_fertility" -> 0.714, // r11 Zipf-memo encode
    "text_bpe_encode" -> 0.445, // r11 Zipf-memo encode (was 2.10)
    "dedup_simhash" -> 1.90, // re-anchored r10 from isolated reps
    "stream_late_drop" -> 4.667, // r11 adjudication median
    "stream_interval_join" -> 2.685, // r11 adjudication median
    "vec_knn_partitioned" -> 0.724,
    "cluster_dbscan_labels" -> 3.828, // r13 isolated median (star CC)
  )

  /** Round-14 re-anchor of the whole ≥1.3×-in-bench class (46 rows,
    * BASELINE.md round-14 adjudication). The driver REGENERATED
    * /root/testdata at the r13→r14 boundary (01:30; the r13 driver bench
    * at 07:50 already ran on the new data while every anchor predated
    * it) and the graphs came back ~17% denser (custSupp bipartite
    * 586,871 distinct edges at sf0.1 vs the "~1M symmetrized" r13
    * note) — so the flagged rows mix a REAL data-shift (graph/vector
    * families, confirmed 1.1–1.4× in 5-rep isolated quiet-box probes)
    * with in-bench session load (sub-second rel/text rows, isolated at
    * or UNDER their old anchors). Per the stream_late_drop /
    * cluster_dbscan_labels precedent each row gets a LOADED anchor at
    * the regime the driver measures — r13 in-bench value × 1.15
    * headroom for registry growth — and a tight ISOLATED tripwire in
    * [[r14IsolatedTripwires]] at today's 5-rep quiet-box median, so a
    * real regression still trips at 1.5× isolated in Probe even though
    * the loaded anchor absorbs session noise. stream_dedup_survivors is
    * NOT here: its 1.3× isolated drift was root-caused (32 state
    * stores for a 2k-key stream) and FIXED by sizing the state shuffle
    * to the query — isolated median 2.35 → 1.43 s, old anchor kept. */
  private def r14DataShift: Seq[(String, Double)] = Seq(
    // r14 NEW gates: no in-bench observation exists yet, so the loaded
    // anchor projects the session-load factor this round measured on
    // comparable rows (~1.45×) onto the 5-rep isolated quiet-box
    // median; the median itself is the tripwire below.
    "rel_cohort_retention" -> 1.03,   // iso 0.711
    "rel_lorenz_points" -> 0.77,      // iso 0.528
    "rel_winsorize_stats" -> 0.90,    // iso 0.618
    "rel_theil_index" -> 0.83,        // iso 0.569
    "rel_sax_symbols" -> 0.45,        // iso 0.310
    "graph_local_clustering" -> 0.82, // iso 0.567
    "graph_eccentricity" -> 8.70,     // iso 6.660 (8-seed 6-round BFS)
    "cluster_davies_bouldin" -> 1.39, // iso 0.962
    "embed_cosine_histogram" -> 1.42, // iso 0.977
    "text_keyword_rake" -> 2.64,      // iso 1.824
    "multimodal_rle_compress" -> 0.85, // iso 0.586
    "pipeline_importance_resample" -> 0.41, // iso 0.285
    // r15 wave-3 gates (same projected-load protocol)
    "rel_funnel_paths" -> 0.82,       // iso 0.565
    "rel_rfm_segments" -> 0.63,       // iso 0.436
    "rel_burst_detection" -> 0.60,    // iso 0.411
    // re-anchored r16: the gate's PLAN changed deliberately (scale-safe
    // histogram rank replacing the single-task global ntile — verdict
    // r14 item 2); the new plan adds a broadcast + tie-group window,
    // ~0.3 s at gate scale, and buys the 100 TB shape. In-bench 0.75 s.
    "rel_entropy_binning" -> 1.0,
    "text_code_ratio" -> 0.30,        // iso 0.150
    // r15 wave-4 gates (same projected-load protocol)
    "rel_theil_sen" -> 5.83,          // iso 4.019 (45k-pair rank median)
    "rel_seasonal_decompose" -> 0.55, // iso 0.377
    "graph_motif_square" -> 1.36,     // iso 0.938
    "graph_edge_support" -> 1.26,     // iso 0.869
    "multimodal_image_gradient" -> 1.14, // iso 0.784
    // r15 wave-5 gates (same projected-load protocol)
    "multimodal_audio_clipping" -> 0.87, // iso 0.597
    "rel_hhi_concentration" -> 1.22,  // iso 0.844
    "graph_component_sizes" -> 4.96,  // iso 3.422 (star-CC rounds)
    "rel_orc_roundtrip" -> 1.88,
    "rel_acf_seasonality" -> 1.49,
    "rel_markov_transitions" -> 1.14,
    "rel_agg_distinct" -> 0.33,
    "text_kn_nll" -> 3.15,
    "text_stats" -> 0.48,
    "graph_link_ra" -> 4.33,
    "embed_mutual_knn" -> 5.67,
    "text_readability" -> 0.91,
    "vec_knn_federated" -> 5.48,
    "dedup_cdc_chunks" -> 3.73,
    "rel_cusum_changepoint" -> 0.65,
    "graph_sssp_weighted" -> 5.67,
    "graph_ppr" -> 6.88,
    "rel_benford_deviation" -> 0.48,
    "stream_cusum_changepoint" -> 8.90,
    "text_quality_filter" -> 1.97,
    "ann_hybrid_rrf" -> 4.60,
    "graph_kcore" -> 13.28,
    "graph_path_counts" -> 6.33,
    "rel_association_rules" -> 3.86,
    "text_cooccur_pairs" -> 2.44,
    "rel_ab_ztest" -> 0.40,
    "stream_vec_ingest" -> 3.73,
    "graph_pagerank_weighted" -> 8.59,
    "pipeline_leakage_safe_split" -> 0.63,
    "rel_kmv_intersect" -> 4.01,
    "dedup_threshold_sweep" -> 2.93,
    "dedup_bottomk_overlap" -> 2.87,
    "graph_hash_walks" -> 5.03,
    "text_ngram_novelty" -> 2.91,
    "graph_closeness" -> 4.73,
    "pipeline_dataset_digest" -> 0.69,
    "rel_new_vs_returning" -> 0.69,
    "multimodal_image_entropy" -> 1.38,
    "stream_transform_with_state" -> 3.50,
    "rel_gapfill_resample" -> 0.62,
    "text_heaps_vocab" -> 0.66,
    "ann_ivf_distributed" -> 1.96,
    "cluster_spherical_kmeans" -> 2.96,
    "rel_mad_outliers" -> 1.46,
    "rel_funnel_conversion" -> 0.97,
    "stream_sessionize" -> 2.82,
    "graph_lpa" -> 6.76,
    "text_bigram_nll" -> 2.10,
  )

  /** Today's 5-rep isolated quiet-box medians for every re-anchored row
    * (current-generation testdata) — the Probe-side regression gate for
    * the r14DataShift class. The two stream rows carry their CLEAN
    * observations: repeated Probe reps of stream gates occasionally
    * absorb a 15–50 s environmental stall (GC/timer class — erratic,
    * absent from single-shot bench runs, absorbed by Bench's retry
    * protocol), so their tripwires come from the unpolluted sessions
    * recorded in BASELINE.md round 14. */
  private def r14IsolatedTripwires: Seq[(String, Double)] = Seq(
    // r17 wave (5-rep isolated quiet-box medians)
    "multimodal_tar_roundtrip" -> 1.025,
    "rel_calibration_bins" -> 0.311,
    "rel_fdr_bh" -> 0.311,
    "rel_roc_auc" -> 0.213,
    "rel_lift_deciles" -> 0.314,
    // r14 new-gate tripwires (5-rep isolated quiet-box medians; the
    // sub-0.5 s rows carry the same session-depth margin as below)
    "rel_cohort_retention" -> 0.711,
    "rel_lorenz_points" -> 0.528,
    "rel_winsorize_stats" -> 0.618,
    "rel_theil_index" -> 0.569,
    "rel_sax_symbols" -> 0.46,
    "graph_local_clustering" -> 0.567,
    "graph_eccentricity" -> 6.660,
    "cluster_davies_bouldin" -> 0.962,
    "embed_cosine_histogram" -> 0.977,
    "text_keyword_rake" -> 1.824,
    "multimodal_rle_compress" -> 0.586,
    "pipeline_importance_resample" -> 0.43,
    "rel_funnel_paths" -> 0.565,
    "rel_rfm_segments" -> 0.50,
    "rel_burst_detection" -> 0.50,
    "rel_entropy_binning" -> 0.90, // r16 plan change (scale-safe rank)
    "text_code_ratio" -> 0.25,
    "rel_theil_sen" -> 4.019,
    "rel_seasonal_decompose" -> 0.45,
    "graph_motif_square" -> 0.938,
    "graph_edge_support" -> 0.869,
    "multimodal_image_gradient" -> 0.784,
    "multimodal_audio_clipping" -> 0.597,
    "rel_hhi_concentration" -> 0.844,
    "graph_component_sizes" -> 3.422,
    "rel_orc_roundtrip" -> 0.824,
    "rel_acf_seasonality" -> 0.731,
    "rel_markov_transitions" -> 0.507,
    "rel_agg_distinct" -> 0.21,
    "text_kn_nll" -> 2.015,
    "text_stats" -> 0.34,
    "graph_link_ra" -> 1.794,
    "embed_mutual_knn" -> 3.674,
    "text_readability" -> 0.30,
    "vec_knn_federated" -> 1.528,
    "dedup_cdc_chunks" -> 2.066,
    "rel_cusum_changepoint" -> 0.42,
    "graph_sssp_weighted" -> 4.173,
    "graph_ppr" -> 4.384,
    "rel_benford_deviation" -> 0.24,
    "stream_cusum_changepoint" -> 4.843,
    // re-probed after the QualityStatsExpr rewrite: the native pass adds
    // ~0.3 s of plan-constant (CodegenFallback boundary) on the 2k-doc
    // gate while cutting the 1M-doc stage 6.3x — priced deliberately
    "text_quality_filter" -> 0.85,
    "ann_hybrid_rrf" -> 1.609,
    "graph_kcore" -> 8.029,
    "graph_path_counts" -> 4.698,
    "rel_association_rules" -> 1.598,
    "text_cooccur_pairs" -> 1.491,
    "rel_ab_ztest" -> 0.45,
    "stream_vec_ingest" -> 4.289, // clean 4-rep session (see scaladoc)
    "graph_pagerank_weighted" -> 6.266,
    "pipeline_leakage_safe_split" -> 0.45,
    "rel_kmv_intersect" -> 1.801,
    "dedup_threshold_sweep" -> 1.553,
    "dedup_bottomk_overlap" -> 1.393,
    "graph_hash_walks" -> 2.887,
    "text_ngram_novelty" -> 1.624,
    "graph_closeness" -> 3.421,
    "pipeline_dataset_digest" -> 0.20,
    "rel_new_vs_returning" -> 0.40,
    "multimodal_image_entropy" -> 0.591,
    "stream_transform_with_state" -> 3.691, // solo 4-rep session
    "rel_gapfill_resample" -> 0.40,
    "text_heaps_vocab" -> 0.45,
    "ann_ivf_distributed" -> 0.900,
    "cluster_spherical_kmeans" -> 2.856,
    "rel_mad_outliers" -> 0.619,
    "rel_funnel_conversion" -> 0.50,
    "stream_sessionize" -> 2.802,
    "graph_lpa" -> 6.158,
    "text_bigram_nll" -> 1.006,
    "stream_dedup_survivors" -> 1.426, // post-fix 5-rep median
    // r15 statistical/graph-wave tripwires: the 5-rep quiet-box medians
    // (controls 0.61-0.96x during those sessions) that were mistakenly
    // appended to `base` as duplicate keys — restored here as the
    // Probe-side gate the new rows were always meant to have; their
    // loaded anchors stay at the 2x-headroom values in `base`.
    "rel_ks_test" -> 0.333,
    "rel_kendall_tau" -> 0.525,
    "rel_spearman_rho" -> 0.389,
    "rel_cramers_v" -> 1.162,
    "rel_mcnemar" -> 0.198,
    "rel_runs_test" -> 0.419,
    "rel_anova_f" -> 0.915,
    "rel_friedman_test" -> 0.686,
    "rel_chi2_gof" -> 0.249,
    "rel_tukey_fences" -> 0.656,
    "graph_k_truss" -> 1.069, // post-checkpoint-fix median
    "rel_pareto_days" -> 0.451,
    "rel_holt_linear" -> 0.272,
    "rel_page_hinkley" -> 0.226,
  )

  /** Duplicate-key guard (advisor round 15): a Scala `Map` literal keeps
    * the LAST occurrence of a duplicated key, so a re-declared anchor
    * silently shadows the documented one — exactly how the r15
    * statistical-wave medians disarmed their own 2x-headroom loaded
    * anchors. Each anchor literal above is declared as a `Seq` and
    * funneled through this check, which fails CLASS LOAD (so Bench,
    * Probe, and every spec that touches anchors) on any recurrence. */
  private def checked(name: String, entries: Seq[(String, Double)]): Map[String, Double] = {
    val m = entries.toMap
    require(
      m.size == entries.size,
      s"BenchAnchors.$name re-declares keys (Map literals keep the last, " +
        "silently shadowing the documented anchor): " +
        entries.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
          .toSeq.sorted.mkString(", "))
    m
  }
}
