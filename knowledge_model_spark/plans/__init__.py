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
# Round-3 policy: (a) queries whose implementation CHANGED since their
# last driver-green row, (b) queries that have never had a driver row
# with the shipped implementation (new this round), (c) the 27 queries
# the r02 sample skipped (all r01-green, code unchanged), then (d)
# everything r02-green, whose rows are on record in CORRECTNESS_r02.json.
_GATE_PRIORITY = [
    # (a) new/changed this round, oracle-checked — zero driver history
    # with the shipped code (new queries, plus queries whose
    # implementation was rewritten or re-inputted this round: prefix
    # Jaccard, spread scans, grid-decomposed cusum, WindowGroupLimit
    # mixture — their old green rows no longer certify this code)
    "text_pdf_link_extract",
    "ann_range_search",
    "join_asof_tolerance_event_order",
    "stats_proportions_ztest",
    "graph_link_prediction_jaccard",
    "stats_anova_oneway",
    "corpus_health_report",
    "text_dup_ngram_mass",
    "text_mojibake_score",
    "quality_l_diversity",
    "dedup_threshold_curve",
    "quality_drift_trend",
    "events_rolling_1h_value",
    "dedup_ngram_jaccard",
    "dedup_bow_cosine",
    "dedup_embedding_cosine",
    "events_cusum_changepoint",
    "sample_target_mixture",
    "corpus_overlap_matrix",
    "decontam_survivors",
    "decontam_report",
    "embeddings_single_link_clusters",
    # (b) never driver-sampled, oracle-checked — the rest of the ~50
    # sample window lands in this backlog (r3 verdict item 2);
    # heavily-engineered ones the judge named go first, then TPC-H
    "text_bpe_tokenize",
    "er_name_clusters",
    "graph_pagerank_trade",
    "stats_equidepth_histogram",
    "layout_zorder_keys",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_values",
    "q12_late_priority_counts",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_part_promotion",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    "q15_top_supplier",
    "q4_order_priority_check",
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "q14_promo_revenue_ratio",
    "q18_large_volume_orders",
    "graph_triangle_count",
    "market_basket_rules",
    "events_twap_user",
    "join_asof_forward_next_event",
    "embeddings_standardize",
    "stats_welch_ttest",
    "events_sequence_pattern",
    "agg_cms_frequency",
    "agg_hll_set_intersection",
    "chunk_content_defined",
    "dedup_cdc_chunks",
    "events_markov_transitions",
    "text_pmi_cooccurrence",
    "sql_group_by_all_revenue",
    "stats_bootstrap_ci",
    "agg_winsorized_mean",
    "join_hot_key_salted",
    "events_sessionize_dynamic_gap",
    "events_rolling_7d_distinct",
    "events_ohlc_hourly",
    "sample_group_holdout",
    "diag_key_skew",
    "agg_bitmap_distinct_rollup",
    "events_attribution_last_touch",
    "events_ewma_smooth",
    "dedup_connected_components",
    "dedup_cluster_survivors",
    "embed_seam_parity",
    "text_pii_redact",
    "quality_gopher_rules",
    "sample_stratified_lang",
    "window_range_frame_revenue",
    "dedup_char_ngram_jaccard",
    "text_winnow_fingerprint",
    "quality_repetition_rules",
    "dedup_containment_pairs",
    "text_boilerplate_scrub",
    "dedup_spans_first_seen",
    "sample_mixture_temperature",
    "corpus_token_drift",
    "text_bm25_rank",
    "join_fuzzy_name_qgram",
    "retrieval_hybrid_rrf",
    "quality_dsir_weights",
    "sample_hard_negatives",
    "sample_weighted_priority",
    "udtf_sentence_split",
    "events_scd2_user_type",
    "agg_hll_region_rollup",
    "agg_kll_quantile_merge",
    "join_asof_cogrouped",
    "agg_incremental_state",
    "eval_ndcg_mrr_at_10",
    "sample_kfold_assign",
    "events_variant_props",
    "sql_recursive_chain_walk",
    "sql_pipe_syntax_revenue",
    "agg_heavy_hitter_terms",
    "join_bloom_pruned",
    "events_funnel_steps",
    "text_url_normalize",
    "quality_unigram_logppl",
    "retrieval_mmr_rerank",
    "sample_fixed_per_group",
    "agg_corr_regression",
    "events_retention_cohorts",
    "cdc_apply_latest",
    "cdc_snapshot_diff",
    "events_anomaly_zscore",
    "quality_k_anonymity",
    "events_gap_fill_hourly",
    "events_gap_interpolate_hourly",
    "quality_classifier_score",
    "stats_chi2_lang_source",
    "sql_lateral_topk_per_group",
    "setop_multiset_all",
    # (c) rows-only: new/changed this round, then never-sampled
    "text_bpe_learn_merges",
    "multimodal_audio_vad",
    "stats_mannwhitney_u_kll",
    "stats_ks_test_kll",
    "eval_dedup_recall_vs_exact",
    "eval_ann_recall_vs_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_sq8_topk",
    "multimodal_phash_dedup",
    "dedup_semantic_pairs",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    # (d) driver-green on record (r1-r3), code unchanged
    "postprocess_battery",
    "dedup_exact_groups",
    "text_vocab_build",
    "quality_bigram_backoff",
    "text_phrase_search",
    "training_chat_render",
    "training_preference_pairs",
    "graph_kcore_decomposition",
    "graph_bfs_hops",
    "stats_mannwhitney_u",
    "quality_luhn_audit",
    "stats_bh_fdr",
    "join_null_safe_counts",
    "text_explode_outer_longtoks",
    "sql_array_hof_battery",
    "text_light_stem",
    "events_robust_zscore_mad",
    "graph_ppr_customer_seeds",
    "eval_recall_at_k_sweep",
    "quality_readability_fk",
    "events_attribution_linear",
    "corpus_zipf_slope",
    "window_cume_dist_nth",
    "dedup_cluster_best_survivors",
    "retrieval_hybrid_weighted",
    "stats_ks_test",
    "corpus_js_divergence",
    "stats_permutation_test",
    "quality_classifier_calibration",
    "events_seasonal_profile",
    "sample_time_split",
    "graph_degree_powerlaw",
    "dedup_cluster_size_histogram",
    "agg_mode_quantity",
    "join_asof_nearest_event",
    "sql_star_except_projection",
    "events_funnel_latency",
    "corpus_crossdup_matrix",
    "quality_char_entropy",
    "sample_quality_budget",
    "training_length_batching",
    "training_span_corruption",
    "embeddings_jl_project",
    "text_keyword_tag",
    "corpus_kl_divergence",
    "ann_lsh_topk",
    "date_functions_orders",
    "month_sequence_gap_scan",
    "case_when_price_tiers",
    "text_split_passages",
    "text_token_stats",
    "text_lang_id",
    "text_quality_score",
    "text_fingerprint",
    "text_clean_battery",
    "text_length_histogram",
    "text_source_lang_matrix",
    "text_accent_fold",
    "text_xml_extract",
    "dedup_exact_survivors",
    "events_tumbling_1h",
    "events_sliding_1h_30m",
    "events_sessionize_30m",
    "events_json_props",
    "events_type_pivot",
    "events_time_rollup",
    "join_interval_overlap",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "multimodal_image_features",
    "multimodal_frame_sample",
    "multimodal_audio_features",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "agg_distinct_counts",
    "agg_cube",
    "agg_rollup",
    "agg_grouping_sets",
    "join_semi_orders_with_big_items",
    "join_anti_customers_without_orders",
    "join_left_outer_order_counts",
    "join_full_outer_nation_activity",
    "join_theta_price_above_retail",
    "join_range_acctbal_band",
    "join_asof_last_event_before_order",
    "window_top3_orders_per_customer",
    "window_lead_lag_order_gap",
    "window_running_revenue",
    "window_ntile_percent_rank",
    "window_dense_rank_parts",
    "setop_nations_with_both",
    "setop_customer_only_nations",
    "setop_union_all_keys",
    "dedup_first_order_per_customer",
    "embeddings_label_centroids",
    "udaf_label_centroid",
    "retrieval_threshold_cascade",
    "retrieval_pack_context",
    "retrieval_rerank_topk",
    "eval_recall_label_at_10",
    "corpus_dual_variant",
    "corpus_weighted_merge",
    "chunk_word_budget",
    "chunk_sentence_budget",
    "agg_percentiles",
    "unpivot_flag_metrics",
    "subquery_scalar_above_avg",
    "map_event_type_shares",
    "text_page_furniture",
    "postprocess_unhelpful_flag",
    "retrieval_build_prompt",
    "sample_train_split",
    "pack_training_sequences",
    "text_top_terms",
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
