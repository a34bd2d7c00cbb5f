"""Query catalog: every declared operator as a (spark_fn, oracle_sql) pair.

``REGISTRY`` maps query name → QuerySpec.  The driver contract
(`__spark_entry__.py`) is generated from this registry: ``queries()``
returns the Spark callables, ``oracle_sql()`` the DuckDB-equivalent SQL
for every oracle-checkable entry.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → rows-only check (non-SQL-expressible)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Iteration-order priority for the driver's correctness gate.  The
# driver samples the FIRST ~50 registry entries, so ordering is the
# lever that decides which queries get a driver row each round.
# Round-10 policy (r9 verdict items 1, 2 and 6, regenerated from
# CORRECTNESS_r01-r09): the window is ORACLED-ONLY (r9 "what's wrong"
# #1 — no rows-only entries burn slots) and is, in order:
# (a) eval_chrf + eval_bleu_components — their r10 short-doc gram
#     guard (the r9 ADVICE fix) touches the gram stream that feeds
#     _pair_clipped_counts, so their r9 rows no longer certify
#     current code (values identical on the driver fixtures, but the
#     standing changed-code rule sorts them first);
# (b) the 9 oracled queries whose PHYSICAL PLANS changed in the r9
#     perf pass without getting an r9 driver row (verdict item 6):
#     jl_project, the md5 MinHash/SimHash twins, assortativity,
#     modularity, bigram_backoff, and the vocab-stat consumers
#     dsir/logppl/bm25 — all parity-proven value-neutral locally,
#     but the driver row is the hard signal;
# (c) the ENTIRE remaining certification-freshness backlog: all 25
#     oracled queries whose newest green row is r4 (verdict item 1's
#     target — after this round ZERO oracled queries are ≤ r4,
#     alphabetical for determinism);
# (d) the oracled queries registered THIS round (11 total, capped
#     per verdict item 2; never-certified, so they take the freshest
#     slots left): events_acf_hourly / streak_longest /
#     user_overlap_jaccard, stats_linear_trend / benford_digits /
#     theil_between, quality_herfindahl_index, sample_systematic_thin,
#     dedup_levenshtein_names, sql_qualify_topk, and (late in the
#     round, swapped for the 4th cohort fill)
#     embeddings_matryoshka_recall;
# (e) 3 fill slots from the r5 cohort, alphabetical, plus the
#     round's 11th oracled registration (embeddings_matryoshka_recall,
#     landed late in the round — never-certified queries outrank a
#     cohort fill).  The r11 window inherits the other 46 r5-cohort
#     queries so no query falls more than 5-6 rounds behind.
# After the window: every other oracled query freshness-ordered
# (newest-green round ascending, alphabetical within a round), then
# the rows-only tail (the driver cannot certify those rows — r9
# lesson — so they never precede an oracled query again).
# Standing rule: any query whose implementation or shared-helper code
# changed in a round in a way that can alter VALUES sorts before
# unchanged ones; ties break oldest-certification-first.
_GATE_PRIORITY = [
    "eval_chrf",
    "eval_bleu_components",
    "embeddings_jl_project",
    "dedup_minhash_lsh_md5",
    "dedup_simhash_md5",
    "graph_assortativity_trade",
    "graph_modularity_lang",
    "quality_bigram_backoff",
    "quality_unigram_logppl",
    "quality_dsir_weights",
    "text_bm25_rank",
    "q12_late_priority_counts",
    "q13_customer_distribution",
    "q14_promo_revenue_ratio",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_revenue",
    "q20_part_promotion",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q4_order_priority_check",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "quality_drift_trend",
    "quality_l_diversity",
    "sample_target_mixture",
    "stats_anova_oneway",
    "stats_equidepth_histogram",
    "text_bpe_tokenize",
    "text_dup_ngram_mass",
    "text_mojibake_score",
    "events_acf_hourly",
    "events_streak_longest",
    "events_user_overlap_jaccard",
    "stats_linear_trend",
    "stats_benford_digits",
    "stats_theil_between",
    "quality_herfindahl_index",
    "sample_systematic_thin",
    "dedup_levenshtein_names",
    "sql_qualify_topk",
    "agg_bitmap_distinct_rollup",
    "agg_cms_frequency",
    "agg_hll_region_rollup",
    "embeddings_matryoshka_recall",
    "agg_hll_set_intersection",
    "agg_kll_quantile_merge",
    "agg_winsorized_mean",
    "chunk_content_defined",
    "corpus_token_drift",
    "dedup_cdc_chunks",
    "dedup_char_ngram_jaccard",
    "dedup_cluster_survivors",
    "dedup_connected_components",
    "dedup_containment_pairs",
    "dedup_spans_first_seen",
    "diag_key_skew",
    "embed_seam_parity",
    "embeddings_standardize",
    "events_attribution_last_touch",
    "events_ewma_smooth",
    "events_markov_transitions",
    "events_ohlc_hourly",
    "events_rolling_7d_distinct",
    "events_scd2_user_type",
    "events_sequence_pattern",
    "events_sessionize_dynamic_gap",
    "join_fuzzy_name_qgram",
    "join_hot_key_salted",
    "quality_gopher_rules",
    "quality_repetition_rules",
    "retrieval_hybrid_rrf",
    "sample_group_holdout",
    "sample_hard_negatives",
    "sample_mixture_temperature",
    "sample_stratified_lang",
    "sample_time_split",
    "sample_weighted_priority",
    "sql_group_by_all_revenue",
    "sql_recursive_chain_walk",
    "stats_bootstrap_ci",
    "stats_proportions_ztest",
    "stats_welch_ttest",
    "text_boilerplate_scrub",
    "text_pii_redact",
    "text_pmi_cooccurrence",
    "text_winnow_fingerprint",
    "udtf_sentence_split",
    "window_range_frame_revenue",
    "agg_corr_regression",
    "agg_heavy_hitter_terms",
    "agg_incremental_state",
    "ann_bruteforce_topk",
    "case_when_price_tiers",
    "cdc_apply_latest",
    "cdc_snapshot_diff",
    "date_functions_orders",
    "dedup_exact_survivors",
    "eval_ndcg_mrr_at_10",
    "events_anomaly_zscore",
    "events_funnel_steps",
    "events_gap_fill_hourly",
    "events_gap_interpolate_hourly",
    "events_json_props",
    "events_retention_cohorts",
    "events_sessionize_30m",
    "events_sliding_1h_30m",
    "events_time_rollup",
    "events_tumbling_1h",
    "events_type_pivot",
    "events_variant_props",
    "join_asof_cogrouped",
    "join_bloom_pruned",
    "join_interval_overlap",
    "month_sequence_gap_scan",
    "quality_classifier_score",
    "quality_k_anonymity",
    "retrieval_mmr_rerank",
    "sample_fixed_per_group",
    "sample_kfold_assign",
    "setop_multiset_all",
    "sql_lateral_topk_per_group",
    "sql_pipe_syntax_revenue",
    "stats_chi2_lang_source",
    "text_accent_fold",
    "text_clean_battery",
    "text_fingerprint",
    "text_lang_id",
    "text_length_histogram",
    "text_pdf_link_extract",
    "text_quality_score",
    "text_source_lang_matrix",
    "text_split_passages",
    "text_token_stats",
    "text_url_normalize",
    "text_xml_extract",
    "agg_cube",
    "agg_distinct_counts",
    "agg_grouping_sets",
    "agg_mode_quantity",
    "agg_percentiles",
    "agg_rollup",
    "chunk_sentence_budget",
    "chunk_word_budget",
    "corpus_dual_variant",
    "corpus_weighted_merge",
    "dedup_first_order_per_customer",
    "embeddings_label_centroids",
    "eval_answer_token_f1",
    "eval_recall_label_at_10",
    "events_interval_union",
    "join_anti_customers_without_orders",
    "join_asof_last_event_before_order",
    "join_full_outer_nation_activity",
    "join_left_outer_order_counts",
    "join_range_acctbal_band",
    "join_semi_orders_with_big_items",
    "join_theta_price_above_retail",
    "map_event_type_shares",
    "pack_training_sequences",
    "postprocess_unhelpful_flag",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "retrieval_build_prompt",
    "retrieval_pack_context",
    "retrieval_rerank_topk",
    "retrieval_threshold_cascade",
    "sample_train_split",
    "setop_customer_only_nations",
    "setop_nations_with_both",
    "setop_union_all_keys",
    "subquery_scalar_above_avg",
    "text_page_furniture",
    "text_top_terms",
    "udaf_label_centroid",
    "unpivot_flag_metrics",
    "window_dense_rank_parts",
    "window_lead_lag_order_gap",
    "window_ntile_percent_rank",
    "window_running_revenue",
    "window_top3_orders_per_customer",
    "ann_ivf_topk_md5",
    "ann_ivfpq_topk_md5",
    "ann_lsh_topk_md5",
    "ann_pq_topk_md5",
    "ann_sq8_topk",
    "corpus_crossdup_matrix",
    "corpus_gini_concentration",
    "corpus_js_divergence",
    "corpus_kl_divergence",
    "corpus_zipf_slope",
    "dedup_cluster_best_survivors",
    "dedup_cluster_size_histogram",
    "dedup_duplicate_substring_spans",
    "dedup_exact_groups",
    "eval_ann_recall_vs_exact_md5",
    "eval_pass_at_k",
    "eval_recall_at_k_sweep",
    "events_attribution_linear",
    "events_funnel_latency",
    "events_peak_concurrency",
    "events_robust_zscore_mad",
    "events_seasonal_profile",
    "graph_bfs_hops",
    "graph_degree_powerlaw",
    "graph_hits_trade",
    "graph_kcore_decomposition",
    "graph_ppr_customer_seeds",
    "join_asof_nearest_event",
    "join_interval_overlap_count",
    "join_null_safe_counts",
    "multimodal_frame_sample",
    "multimodal_phash_dedup",
    "postprocess_battery",
    "quality_ppl_buckets",
    "retrieval_maxsim_topk",
    "sample_bottomk_mergeable",
    "sample_coreset_kcenter",
    "sample_stratified_neyman",
    "sql_scalar_udf_revenue",
    "stats_kendall_tau",
    "stats_spearman_rho",
    "text_rake_keyphrases",
    "training_best_of_n",
    "ann_range_search",
    "corpus_health_report",
    "corpus_overlap_matrix",
    "decontam_report",
    "decontam_survivors",
    "dedup_bow_cosine",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "dedup_threshold_curve",
    "embeddings_single_link_clusters",
    "er_name_clusters",
    "events_cusum_changepoint",
    "events_rfm_scores",
    "events_rolling_1h_value",
    "events_twap_user",
    "graph_link_prediction_jaccard",
    "graph_pagerank_trade",
    "graph_triangle_count",
    "join_asof_forward_next_event",
    "join_asof_tolerance_event_order",
    "layout_zorder_keys",
    "market_basket_rules",
    "q10_returned_items",
    "q11_important_values",
    "quality_char_entropy",
    "quality_classifier_calibration",
    "quality_luhn_audit",
    "quality_readability_fk",
    "retrieval_hybrid_weighted",
    "sample_quality_budget",
    "sql_array_hof_battery",
    "sql_star_except_projection",
    "stats_bh_fdr",
    "stats_ks_test",
    "stats_mannwhitney_u",
    "stats_permutation_test",
    "text_explode_outer_longtoks",
    "text_keyword_tag",
    "text_light_stem",
    "text_phrase_search",
    "text_vocab_build",
    "training_chat_render",
    "training_length_batching",
    "training_preference_pairs",
    "training_span_corruption",
    "window_cume_dist_nth",
    "agg_percentiles_kll",
    "agg_winsorized_mean_kll",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_lsh_topk",
    "ann_nsw_topk",
    "ann_pq_topk",
    "dedup_minhash_lsh",
    "dedup_semantic_pairs",
    "dedup_simhash",
    "embeddings_zca_whitening",
    "eval_ann_recall_vs_exact",
    "eval_dedup_recall_vs_exact",
    "eval_rouge_l",
    "events_funnel_latency_kll",
    "events_rfm_scores_kll",
    "multimodal_audio_codec_matrix",
    "multimodal_audio_features",
    "multimodal_audio_vad",
    "multimodal_exif_extract",
    "multimodal_image_codec_matrix",
    "multimodal_image_features",
    "multimodal_image_resize",
    "multimodal_pdf_images",
    "multimodal_pdf_passages",
    "multimodal_pdf_text",
    "multimodal_video_pipeline",
    "quality_ppl_buckets_kll",
    "stats_ks_test_kll",
    "stats_mannwhitney_u_kll",
    "text_bpe_learn_merges",
    "text_unigram_lm_train",
    "multimodal_pdf_triage",
    "text_unigram_lm_tokenize",
    "streaming_sessionize_30m",
    "streaming_tumbling_1h",
]


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: fills REGISTRY)."""
    from knowledge_model_spark.plans import (  # noqa: F401
        relational_queries,
        text_queries,
        dedup_queries,
        events_queries,
        similarity_queries,
        retrieval_queries,
        pipeline_queries,
        postprocess_queries,
        training_queries,
        graph_queries,
        quality_queries,
        sketch_queries,
        sql_surface_queries,
        tpch_queries,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in _GATE_PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
