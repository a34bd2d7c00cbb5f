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
    # (a) changed since their last driver-green row, oracle-checked
    "postprocess_battery",        # r02 RED (array canon) — citations now scalar
    "dedup_embedding_cosine",     # rewritten cross-join→LSH after its r01 green
    "dedup_ngram_jaccard",        # max_df stop-shingle pruning added (r3)
    "dedup_exact_groups",         # dup_ids array<bigint> → comma string (canon-safe)
    # (b) never driver-checked, oracle-checked — the ~50-query sample
    # window should be spent here: an oracle row is the strong signal
    # (newest code first: zero parity history = most valuable row)
    "text_vocab_build",           # new (r3 session 4)
    "quality_bigram_backoff",     # new (r3 session 4)
    "text_phrase_search",         # new (r3 session 4)
    "training_chat_render",       # new (r3 session 4)
    "training_preference_pairs",  # new (r3 session 4)
    "graph_kcore_decomposition",  # new (r3 session 4)
    "graph_bfs_hops",             # new (r3 session 4)
    "stats_mannwhitney_u",        # new (r3 session 4)
    "quality_luhn_audit",         # new (r3 session 4)
    "stats_bh_fdr",               # new (r3 session 4)
    "join_null_safe_counts",      # new (r3 session 4)
    "text_explode_outer_longtoks",  # new (r3 session 4)
    "sql_array_hof_battery",      # new (r3 session 4)
    "text_light_stem",            # new (r3 session 4)
    "events_robust_zscore_mad",   # new (r3 session 4)
    "graph_ppr_customer_seeds",   # new (r3 session 4)
    "eval_recall_at_k_sweep",     # new (r3 session 4)
    "embeddings_single_link_clusters",  # new (r3 session 4)
    "quality_readability_fk",     # new (r3 session 4)
    "events_attribution_linear",  # new (r3 session 4)
    "corpus_zipf_slope",          # new (r3 session 4)
    "window_cume_dist_nth",       # new (r3 session 4)
    "dedup_cluster_best_survivors",  # new (r3 session 4)
    "retrieval_hybrid_weighted",  # new (r3 session 4)
    "stats_ks_test",              # new (r3 session 4)
    "corpus_js_divergence",       # new (r3 session 4)
    "stats_permutation_test",     # new (r3 session 4)
    "quality_classifier_calibration",  # new (r3 session 4)
    "events_seasonal_profile",    # new (r3 session 4)
    "events_cusum_changepoint",   # new (r3 session 4)
    "sample_time_split",          # new (r3 session 4)
    "graph_degree_powerlaw",      # new (r3 session 4)
    "dedup_cluster_size_histogram",  # new (r3 session 4)
    "agg_mode_quantity",          # new (r3 session 4)
    "join_asof_nearest_event",    # new (r3 session 4)
    "sql_star_except_projection",  # new (r3 session 4)
    "events_funnel_latency",      # new (r3 session 4)
    "corpus_crossdup_matrix",     # new (r3 session 4)
    "quality_char_entropy",       # new (r3 session 3)
    "sample_quality_budget",      # new (r3 session 3)
    "sample_target_mixture",      # new (r3 session 3)
    "training_length_batching",   # new (r3 session 3)
    "training_span_corruption",   # new (r3 session 3)
    "embeddings_jl_project",      # new (r3 session 3)
    "text_keyword_tag",           # new (r3 session 3)
    "corpus_kl_divergence",       # new (r3 session 3)
    "q2_min_cost_supplier",       # new (r3 session 3, TPC-H wave 2)
    "q7_volume_shipping",         # new (r3 session 3)
    "q8_market_share",            # new (r3 session 3)
    "q9_product_profit",          # new (r3 session 3)
    "q10_returned_items",         # new (r3 session 3)
    "q11_important_values",       # new (r3 session 3)
    "q12_late_priority_counts",   # new (r3 session 3)
    "q16_supplier_part_counts",   # new (r3 session 3)
    "q17_small_quantity_revenue", # new (r3 session 3)
    "q19_disjunctive_revenue",    # new (r3 session 3)
    "q20_part_promotion",         # new (r3 session 3)
    "q21_waiting_suppliers",      # new (r3 session 3)
    "graph_triangle_count",       # new (r3 session 2)
    "market_basket_rules",        # new (r3 session 2)
    "events_twap_user",           # new (r3 session 2)
    "corpus_overlap_matrix",      # new (r3 session 2)
    "join_asof_forward_next_event",  # new (r3 session 2)
    "q22_global_sales_opportunity",  # new (r3 session 2)
    "embeddings_standardize",     # new (r3 session 2)
    "er_name_clusters",           # new (r3 session 2)
    "stats_equidepth_histogram",  # new (r3 session 2)
    "stats_welch_ttest",          # new (r3 session 2)
    "q15_top_supplier",           # new (r3 session 2)
    "events_sequence_pattern",    # new (r3 session 2)
    "agg_cms_frequency",          # new (r3 cont.)
    "agg_hll_set_intersection",   # new (r3 cont.)
    "chunk_content_defined",      # new (r3 cont.)
    "dedup_cdc_chunks",           # new (r3 cont.)
    "events_markov_transitions",  # new (r3 cont.)
    "text_pmi_cooccurrence",      # new (r3 cont.)
    "sql_group_by_all_revenue",   # new (r3 cont.)
    "stats_bootstrap_ci",         # new (r3 cont.)
    "q4_order_priority_check",    # new (r3 cont.)
    "q6_forecast_revenue",        # new (r3 cont.)
    "agg_winsorized_mean",        # new (r3 cont.)
    "join_hot_key_salted",        # new (r3 cont.)
    "events_sessionize_dynamic_gap",  # new (r3 cont.)
    "events_rolling_7d_distinct",     # new (r3 cont.)
    "q13_customer_distribution",  # new (r3 cont.)
    "q14_promo_revenue_ratio",    # new (r3 cont.)
    "q18_large_volume_orders",    # new (r3 cont.)
    "dedup_bow_cosine",
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
    "decontam_report",
    "decontam_survivors",
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
    "graph_pagerank_trade",
    "events_scd2_user_type",
    "agg_hll_region_rollup",
    "agg_kll_quantile_merge",
    "join_asof_cogrouped",
    "agg_incremental_state",
    "layout_zorder_keys",
    "eval_ndcg_mrr_at_10",
    "text_bpe_tokenize",
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
    # (c) rows-only entries (changed or never-checked) — a driver row
    # here is only a rows-count check; tests carry the real gate
    "eval_dedup_recall_vs_exact", # new (r3 cont., rows-only gate)
    "ann_sq8_topk",               # new (r3 cont., rows-only)
    "multimodal_phash_dedup",     # new (r3)
    "dedup_minhash_lsh",          # default bucket cap + self-pair filter (r3)
    "dedup_simhash",              # same (r3)
    "dedup_semantic_pairs",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_lsh_topk",               # multiprobe retuned
    "eval_ann_recall_vs_exact",   # recall gate for lsh/ivf/pq/ivfpq
    # (d) r02-unsampled, r01-green, unchanged
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
