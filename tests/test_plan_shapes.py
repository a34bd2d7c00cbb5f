"""Physical-plan shape guards for the headline queries.

Correct results with a wrong plan shape become a scale incident at
1000 executors, so the plan IS part of the contract: filters must reach
the parquet scan, dimension joins must broadcast, and no registered
query may contain an all-pairs join.
"""

from __future__ import annotations

import pytest

from knowledge_model_spark.plans import load_registry

from tests.conftest import SF_DIR

REGISTRY = load_registry()


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_pushes_filter_and_broadcasts_dimension(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "PushedFilters: [" in plan and "c_mktsegment" in plan
    assert "BroadcastHashJoin" in plan


def test_scans_prune_columns(spark):
    # a 2-column projection must not read the whole table
    plan = _plan(spark, "text_token_stats")
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "source" not in read_schema


@pytest.mark.parametrize(
    "name",
    [
        "dedup_embedding_cosine",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "ann_lsh_topk",
    ],
)
def test_no_all_pairs_joins_in_bucketed_operators(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_brute_force_ann_broadcasts_queries_not_corpus(spark):
    # the intentional nested-loop is broadcast(query-batch) x corpus scan;
    # the corpus side must NOT be exchanged before scoring
    plan = _plan(spark, "ann_bruteforce_topk")
    scoring = plan.split("BroadcastNestedLoopJoin")[-1]
    head = scoring.split("Window")[0] if "Window" in scoring else scoring
    assert "Exchange hashpartitioning" not in head


def test_interval_overlap_joins_on_day_bucket(spark):
    plan = _plan(spark, "join_interval_overlap")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan


def test_ann_lsh_dedups_on_slim_columns(spark):
    """The multiprobe candidate dedup must be a max-aggregation over
    (query, id, score) with a map-side partial — not a dropDuplicates
    shuffle carrying both 64-float vectors."""
    plan = _plan(spark, "ann_lsh_topk")
    assert "partial_max" in plan
    assert "BroadcastHashJoin" in plan


def test_decontam_broadcasts_eval_index(spark):
    """The eval shingle index must broadcast; the train corpus must never
    be hash-exchanged before the probe join."""
    plan = _plan(spark, "decontam_report")
    assert "BroadcastHashJoin" in plan
    probe = plan.split("BroadcastHashJoin")[-1]
    assert "BroadcastExchange" in probe


def test_quality_batteries_are_udf_free_scans(spark):
    """PII redaction and the Gopher rules must stay whole-stage-codegen
    column expressions: no Python evaluation, no exchange, no join."""
    for name in ("text_pii_redact", "quality_gopher_rules"):
        plan = _plan(spark, name)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "Exchange hashpartitioning" not in plan
        assert "Join" not in plan


def test_stratified_sample_is_scan_speed_filter(spark):
    plan = _plan(spark, "sample_stratified_lang")
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize(
    "name",
    ["dedup_containment_pairs", "dedup_spans_first_seen", "text_boilerplate_scrub"],
)
def test_corpus_hygiene_queries_have_no_all_pairs_joins(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mixture_broadcasts_rates_not_corpus(spark):
    """The per-stratum rates table (one row per lang) must broadcast so
    the corpus side is a scan-speed filter — a shuffled join here would
    move the whole corpus for a 5-row dimension."""
    plan = _plan(spark, "sample_mixture_temperature")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scrub_corpus_side_is_scan_only(spark):
    """scrub_frequent_units inlines the bounded hot set as a literal
    array: the scrub projection must contain no join at all (the only
    joins in the plan would come from the corpus side, since the
    hot-set job already ran at plan-build time)."""
    plan = _plan(spark, "text_boilerplate_scrub")
    assert "Join" not in plan


def test_bm25_takeordered_not_global_window(spark):
    # top-k must compile to TakeOrderedAndProject (per-partition partial
    # top-k); a global-sort window over all matched docs would be a
    # single-partition bottleneck at corpus scale
    plan = _plan(spark, "text_bm25_rank")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_join_no_cartesian_and_nested_loop_only_for_sidecar(spark):
    plan = _plan(spark, "join_fuzzy_name_qgram")
    assert "CartesianProduct" not in plan
    # candidate generation joins grams hash-wise; the only nested loop
    # allowed is the short-string sidecar (empty for name-like data)
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_weighted_sample_is_scan_plus_takeordered(spark):
    plan = _plan(spark, "sample_weighted_priority")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan  # zero shuffles
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_dsir_single_broadcast_join(spark):
    # term-stats (vocabulary-sized) must broadcast back onto the tf
    # table; no corpus-sized SortMergeJoin anywhere
    plan = _plan(spark, "quality_dsir_weights")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hard_negatives_windowgrouplimit(spark):
    plan = _plan(spark, "sample_hard_negatives")
    assert "WindowGroupLimit" in plan  # top-k pruned map-side
    assert "CartesianProduct" not in plan


def test_scd2_single_entity_shuffle(spark):
    """Both windows and the island aggregate cluster on the entity key:
    one Exchange total.  (HashPartitioning(user_id) satisfies the
    (user_id, __ver) grouping — a second exchange here would mean the
    run aggregation re-shuffled what the window already placed.)"""
    plan = _plan(spark, "events_scd2_user_type")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan


def test_sketch_rollups_broadcast_dims_and_shuffle_sketch_bytes(spark):
    """The geo dims broadcast; the only exchanges are the two
    aggregation levels, and the second moves sketch bytes (one blob per
    fine group), never raw values — the mergeable-summary contract."""
    for q in ("agg_hll_region_rollup", "agg_kll_quantile_merge"):
        plan = _plan(spark, q)
        assert "SortMergeJoin" not in plan, q
        assert plan.count("BroadcastHashJoin") == 2, q
        assert plan.count("Exchange hashpartitioning") == 2, q


def test_bloom_prune_filters_probe_before_join(spark):
    # the bitmap membership test must sit on the probe side BELOW the
    # join (prune-then-shuffle, not shuffle-then-prune)
    plan = _plan(spark, "join_bloom_pruned")
    assert "xxhash64" in plan
    join_kw = "ShuffledHashJoin" if "ShuffledHashJoin" in plan else (
        "SortMergeJoin" if "SortMergeJoin" in plan else "BroadcastHashJoin"
    )
    probe_side = plan.split(join_kw, 1)[1]
    assert "xxhash64" in probe_side  # filter is inside the join's subtree
    assert "CartesianProduct" not in plan


def test_funnel_steps_single_user_key_partitioning(spark):
    # every step aggregates on the user key: hashpartitioning(user...)
    # is the only grouping key that appears — no per-user sort of raw
    # event history, no collect_list
    plan = _plan(spark, "events_funnel_steps")
    assert "collect_list" not in plan
    import re

    parts = set(re.findall(r"hashpartitioning\((\w+)", plan))
    assert parts <= {"user", "user_id"}, parts


def test_url_battery_is_udf_free_scan(spark):
    plan = _plan(spark, "text_url_normalize")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure projection: no shuffle at all


def test_heavy_hitters_verify_filters_scan(spark):
    # the exact-verify pass must push the candidate-set membership into
    # the scan stage (a Filter on the token column), not post-shuffle
    plan = _plan(spark, "agg_heavy_hitter_terms")
    before_exchange = plan.split("Exchange")[-1]  # deepest = scan side
    assert "Filter" in before_exchange or "PushedFilters" in before_exchange


def test_q6_pushes_all_predicates_and_prunes_columns(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed to the scan"
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema and "l_orderkey" not in read_schema


def test_q4_semi_join_no_cartesian(spark):
    plan = _plan(spark, "q4_order_priority_check")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_triangle_count_no_cartesian_and_broadcast_degrees(spark):
    plan = _plan(spark, "graph_triangle_count")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_market_basket_only_scalar_bnlj(spark):
    plan = _plan(spark, "market_basket_rules")
    assert "CartesianProduct" not in plan
    # the single BNLJ is the broadcast 1-row order-count scalar
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_standardize_broadcasts_stats_back(spark):
    plan = _plan(spark, "embeddings_standardize")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q15_pushes_date_filter(spark):
    plan = _plan(spark, "q15_top_supplier")
    assert "PushedFilters: [" in plan and "l_shipdate" in plan
    assert "BroadcastHashJoin" in plan


def test_equidepth_single_partition_only_on_cells(spark):
    # the SinglePartition exchange must sit above the grid aggregation
    # (NDV-bounded), not above the raw scan: raw rows reach only a
    # hashpartitioning exchange
    plan = _plan(spark, "stats_equidepth_histogram")
    assert "Exchange hashpartitioning" in plan
    assert "Exchange SinglePartition" in plan


# ------------------------------------------------------ TPC-H wave 2 (r3)

def test_q2_bridge_single_shuffle_and_broadcast_dims(spark):
    # the (partkey,suppkey) bridge aggregate is the only fact shuffle;
    # supplier/nation/region/part all broadcast
    plan = _plan(spark, "q2_min_cost_supplier")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q7_date_filter_pushed_and_nations_broadcast(spark):
    plan = _plan(spark, "q7_volume_shipping")
    assert "PushedFilters: [" in plan and "l_shipdate" in plan
    assert "BroadcastHashJoin" in plan


def test_q8_single_fact_shuffle(spark):
    # orders⋈lineitem is the one shuffled join; everything else broadcasts
    plan = _plan(spark, "q8_market_share")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q9_like_filter_prunes_part_before_broadcast(spark):
    plan = _plan(spark, "q9_product_profit")
    assert "BroadcastHashJoin" in plan
    # the LIKE filter must sit under the broadcast exchange (on the
    # part scan), not above the join
    assert "p_name" in plan.split("BroadcastExchange")[-1] or "p_name" in plan


def test_q10_takeordered_and_pushed_filters(spark):
    plan = _plan(spark, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters: [" in plan and "l_returnflag" in plan


def test_q16_anti_join_is_broadcast(spark):
    plan = _plan(spark, "q16_supplier_part_counts")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_q17_per_part_threshold_broadcasts_back(spark):
    # the decorrelated per-part avg joins back as a broadcast, so the
    # corpus-side lineitem scan never shuffles for the threshold probe
    plan = _plan(spark, "q17_small_quantity_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q19_disjunction_prunes_part_build_side(spark):
    # the brand IN (12,23,34) implied filter must reach the part scan
    plan = _plan(spark, "q19_disjunctive_revenue")
    assert "PushedFilters: [" in plan and "p_brand" in plan
    assert "BroadcastHashJoin" in plan


def test_q21_decorrelated_exists_single_orderkey_shuffle(spark):
    # the EXISTS/NOT-EXISTS pair must appear as ONE per-order aggregate
    # joined back — not as correlated per-row probes (no nested-loop)
    plan = _plan(spark, "q21_waiting_suppliers")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_null_safe_join_stays_hash_join(spark):
    # eqNullSafe is an equi condition: the plan must be a broadcast or
    # shuffled HASH join — a fallback to BroadcastNestedLoopJoin would
    # be quadratic at scale.
    plan = _plan(spark, "join_null_safe_counts")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan


def test_explode_outer_is_generate_outer(spark):
    plan = _plan(spark, "text_explode_outer_longtoks")
    # Generate's third argument is the outer flag: `Generate explode(lt),
    # [doc_id], true, [long_tok]`
    assert "Generate explode" in plan and ", true, [" in plan


def test_aqe_coalesces_shuffle_partitions_at_runtime(spark):
    """Evidence that the session's AQE config actually re-plans at
    runtime: after executing a small groupBy, the final adaptive plan
    reads the shuffle through AQEShuffleRead with fewer partitions than
    spark.sql.shuffle.partitions — the mechanism that replaces
    hand-tuned partition counts at any scale."""
    from pyspark.sql import functions as F

    df = (
        spark.range(10_000)
        .groupBy((F.col("id") % 5).alias("k"))
        .agg(F.count("*").alias("n"))
    )
    df.collect()  # materialize so AQE finalizes the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan


def test_join_strategy_hints_are_honored(spark, tables):
    """Physical-strategy control surface: hints must override the
    planner's default choice — the manual lever when statistics mislead
    (e.g. a filter-reduced build side the optimizer sizes at scan
    width)."""
    fact = tables["orders"].select("o_orderkey", "o_custkey")
    dim = tables["customer"].select("c_custkey", "c_nationkey")
    cond = fact["o_custkey"] == dim["c_custkey"]

    merge_plan = (
        fact.join(dim.hint("merge"), cond)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" in merge_plan

    bcast_plan = (
        fact.join(dim.hint("broadcast"), cond)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in bcast_plan

    shj_plan = (
        fact.join(dim.hint("shuffle_hash"), cond)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ShuffledHashJoin" in shj_plan


def test_star_except_prunes_scan_columns(spark):
    plan = _plan(spark, "sql_star_except_projection")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_tax" not in read_schema and "l_quantity" in read_schema


def test_phrase_search_no_cartesian(spark):
    plan = _plan(spark, "text_phrase_search")
    assert "CartesianProduct" not in plan
    # adjacency joins are equi on (id, pos-i): hash-joinable
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_chat_render_single_conv_exchange(spark):
    """The loss-mask offset window and the final assembly both cluster
    on the conversation key: one hashpartitioning Exchange total."""
    plan = _plan(spark, "training_chat_render")
    assert plan.count("Exchange hashpartitioning") == 1


def test_preference_pairs_single_agg_no_window(spark):
    """struct-extrema form: one partial+final hash agg, no window sort,
    no join."""
    plan = _plan(spark, "training_preference_pairs")
    assert "Window" not in plan and "Join" not in plan
    # struct extrema compile to SortAggregate (structs aren't
    # hash-aggregable) — what matters is the MAP-SIDE partial before
    # the single exchange
    assert "partial_max" in plan and plan.count("Exchange hashpartitioning") == 1


def test_mwu_window_runs_on_value_level_aggregate(spark):
    """The global rank sort must consume the VALUE-level aggregate, not
    raw events: a partial aggregate appears below the single-partition
    sort Exchange."""
    plan = _plan(spark, "stats_mannwhitney_u")
    below_sort = plan.split("Exchange SinglePartition")[-1]
    assert "HashAggregate" in below_sort


def test_seasonal_profile_single_agg_scan(spark):
    plan = _plan(spark, "events_seasonal_profile")
    assert "Join" not in plan  # grand mean is a driver literal
    assert plan.count("Exchange hashpartitioning") == 1


# ------------------------------------------- grid-decomposed ordering (r4)

@pytest.mark.parametrize(
    "name",
    ["training_length_batching", "sample_quality_budget", "sample_time_split"],
)
def test_grid_ordering_no_raw_single_partition_window(spark, name):
    """r3 verdict fix: the global numbering / running sum must be
    grid-decomposed. Every Exchange SinglePartition in these plans must
    consume a grid-level HashAggregate (bounded rows), never the raw
    scan; raw rows reach only hash-partitioned exchanges and
    grid-partitioned windows."""
    plan = _plan(spark, name)
    lines = plan.splitlines()
    hits = [i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln]
    assert hits, "expected the bounded offsets table funnel to exist"
    for i in hits:
        assert "HashAggregate" in lines[i + 1], lines[i : i + 2]
    # the corpus-side window is partitioned on the grid key
    assert "Exchange hashpartitioning(__kms_grid" in plan


# ------------------------------------------------- r4 new-query guards

def test_mojibake_is_scan_only(spark):
    """Encoding audit must run at scan speed: a single projection over
    the documents scan, no Exchange of any kind."""
    plan = _plan(spark, "text_mojibake_score")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_l_diversity_partial_agg_before_exchange(spark):
    """Exact distinct over (qid-pair) must map-side partial-aggregate
    before its shuffles; no join anywhere."""
    plan = _plan(spark, "quality_l_diversity")
    assert "Join" not in plan
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_dup_ngram_mass_shuffles_are_gram_table_sized(spark):
    """Key-partitioned shuffles only — (gram,doc), (gram), (doc) — no
    single-partition Exchange and NO WINDOW: the per-gram doc count is
    an agg + equi-join so AQE can split a hot-gram partition (it can
    split skewed joins, never window partitions)."""
    plan = _plan(spark, "text_dup_ngram_mass")
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 4, f"expected <=4 key shuffles, saw {n_ex}"
    # both join inputs are aggregates (gram-table-sized), never raw grams
    join_seg = plan.split("Join")[-1]
    assert "HashAggregate" in join_seg


def test_cusum_per_type_window_is_grid_decomposed(spark):
    """A raw per-event_type window pins corpus/k rows to one task (AQE
    can split neither a window partition nor its sort). The cumsum and
    ordinal must come from the (event_type, grid) decomposition: every
    Window over raw events is partitioned on the grid key, and the
    offsets window consumes a HashAggregate-bounded table."""
    import re

    plan = _plan(spark, "events_cusum_changepoint")
    assert "__kms_grid" in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected Window operators in the plan"
    for spec in specs:
        if "event_type" in spec:
            assert "__kms_grid" in spec, f"raw per-type window: {spec}"


def test_target_mixture_window_prunes_map_side(spark):
    """The dynamic per-source quota filter alone cannot trigger
    InferWindowGroupLimit; the foldable max-quota conjunct must keep the
    map-side prune (each source's partition is corpus/k rows without it)."""
    plan = _plan(spark, "sample_target_mixture")
    assert "WindowGroupLimit" in plan


def test_link_prediction_no_cartesian_degrees_broadcast(spark):
    plan = _plan(spark, "graph_link_prediction_jaccard")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-20, never a global sort
    assert "BroadcastHashJoin" in plan  # degree tables broadcast


def test_proportions_ztest_single_scan_two_aggs(spark):
    """User-level conversion then four counters: one user-key Exchange,
    one reduce to a single row, no join anywhere."""
    plan = _plan(spark, "stats_proportions_ztest")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# ------------------------------------------------- r5 multimodal pipelines

def test_pdf_text_pipeline_shuffles_nothing_before_join(spark):
    """Two chained mapInPandas stages over the documents scan; the only
    join is the broadcast self-join for the round-trip equality — no
    hash-partitioned Exchange anywhere (payloads never shuffle)."""
    plan = _plan(spark, "multimodal_pdf_text")
    assert "Exchange hashpartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_pdf_passages_pipeline_is_shuffle_free(spark):
    """extract -> clean -> posexplode split: pure narrow pipeline, zero
    Exchange of any kind."""
    plan = _plan(spark, "multimodal_pdf_passages")
    assert "Exchange" not in plan
    assert "Generate" in plan  # the posexplode passage splitter


def test_video_pipeline_single_aggregate_shuffle(spark):
    """mux -> demux are narrow mapInPandas stages behind one demux
    checkpoint; featurize and the r8 pixel gate are narrow stages over
    it; the ONLY shuffles are the two tiny per-video aggregates (32
    rows each), stitched by a broadcast join — never a shuffled one."""
    plan = _plan(spark, "multimodal_video_pipeline")
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") >= 2
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_interval_overlap_count_sweep_on_planted_skew(spark):
    """The O(n log n) sweep twin (r7: join_interval_overlap_count) must
    match brute-force pair counting on PLANTED skew — one hot bucket
    where all k intervals overlap (the worst case that makes the
    pair-materializing join Θ(k²)), one bucket of strictly disjoint
    chained intervals, one bucket mixing touching endpoints (e == s
    counts as overlap under the <= predicate) — and its plan must hold
    the one-exchange shape: a single hash shuffle on the bucket, no
    join node, no pair row ever produced."""
    import datetime

    from pyspark.sql import functions as F

    from knowledge_model_spark.operators.relational import (
        interval_overlap_counts,
    )

    def ts(h, m=0):
        return datetime.datetime(2024, 1, 1, h, m)

    rows = []
    # hot bucket: 40 sessions all spanning [1:00, 20:00] → C(40,2) pairs
    rows += [("hot", ts(1), ts(20)) for _ in range(40)]
    # disjoint chain: [h, h+0:30] hourly → 0 pairs
    rows += [("disjoint", ts(h), ts(h, 30)) for h in range(1, 21)]
    # touching: e == next s exactly → each adjacent pair overlaps
    rows += [("touch", ts(h), ts(h + 1)) for h in range(1, 11)]
    sessions = spark.createDataFrame(rows, "day string, s timestamp, e timestamp")

    got = {
        r["day"]: (r["n_sessions"], r["overlap_pairs"])
        for r in interval_overlap_counts(sessions, "day", "s", "e").collect()
    }
    # brute-force truth over the tiny planted set
    a = sessions.select(
        "day", F.col("s").alias("s_a"), F.col("e").alias("e_a"),
        F.monotonically_increasing_id().alias("ia"),
    ).localCheckpoint()
    b = a.select(
        "day", F.col("s_a").alias("s_b"), F.col("e_a").alias("e_b"),
        F.col("ia").alias("ib"),
    )
    brute = {
        r["day"]: r["n"]
        for r in a.join(b, "day")
        .filter(
            (F.col("ia") < F.col("ib"))
            & (F.col("s_a") <= F.col("e_b"))
            & (F.col("s_b") <= F.col("e_a"))
        )
        .groupBy("day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got["hot"] == (40, 40 * 39 // 2)
    assert got["disjoint"] == (20, 0)
    assert got["touch"] == (10, 9)
    for day, (_, pairs) in got.items():
        assert pairs == brute.get(day, 0), day

    plan = (
        interval_overlap_counts(sessions, "day", "s", "e")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    # exactly one exchange subtree shape: hashpartitioning on the bucket
    assert plan.count("hashpartitioning(day") <= 2  # window + reused agg


def test_interval_union_length_planted_cases(spark):
    """interval_union_length (r7): overlapping intervals merge, touching
    intervals stay continuous (closed-interval semantics), zero-length
    intervals contribute nothing — against hand-computed truth; plan
    holds the one-exchange no-join sweep shape."""
    import datetime

    from knowledge_model_spark.operators.relational import (
        interval_union_length,
    )

    def ts(h, m=0):
        return datetime.datetime(2024, 1, 1, h, m)

    rows = [
        ("a", ts(1), ts(3)), ("a", ts(2), ts(5)),  # union [1,5] = 4h
        ("a", ts(7), ts(8)),                        # +1h → 5h
        ("b", ts(1), ts(2)), ("b", ts(2), ts(3)),  # touching → 2h
        ("c", ts(4), ts(4)),                        # zero-length → 0
    ]
    df = spark.createDataFrame(rows, "day string, s timestamp, e timestamp")
    got = {
        r["day"]: (r["n_sessions"], r["covered_us"])
        for r in interval_union_length(df).collect()
    }
    H = 3_600_000_000
    assert got["a"] == (3, 5 * H)
    assert got["b"] == (2, 2 * H)
    assert got["c"] == (1, 0)
    plan = (
        interval_union_length(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_ann_md5_twins_broadcast_only_no_python(spark):
    """r8 certified ANN twins: every join broadcasts (the plane table,
    query buckets, and query batch are all tiny), no SortMergeJoin or
    CartesianProduct anywhere, and no row-at-a-time Python.  Since r11
    the LSH twin's corpus buckets come from ONE vectorized Arrow kernel
    (md5_buckets — bakes the content-addressed ±1 planes in and emits
    all 12 bucket ids per row, replacing the 72-way plane explode +
    aggregation exchange; per-dim fold order keeps md5/oracle parity,
    see OPTIMIZATION_r11.md), so exactly one ArrowEvalPython is the
    pinned shape — more of them would mean the boundary regressed."""
    plan = _plan(spark, "ann_lsh_topk_md5")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") == 1 and "MapInPandas" not in plan

    plan_ivf = _plan(spark, "ann_ivf_topk_md5")
    assert "SortMergeJoin" not in plan_ivf
    assert "CartesianProduct" not in plan_ivf


def test_interval_peak_concurrency_planted_cases(spark):
    """interval_peak_concurrency (r8): peak = max simultaneous intervals
    under closed-interval semantics (touching counts as concurrent at
    the shared instant); first_peak_us is the earliest attaining
    boundary; plan holds the one-exchange no-join sweep shape."""
    import datetime

    from knowledge_model_spark.operators.relational import (
        interval_peak_concurrency,
    )

    def ts(h, m=0):
        return datetime.datetime(2024, 1, 1, h, m)

    def us(h, m=0):
        return int(ts(h, m).timestamp() * 1_000_000)

    rows = [
        # a: [1,4] [2,5] [3,6] → 3 concurrent in [3,4]; first at t=3
        ("a", ts(1), ts(4)), ("a", ts(2), ts(5)), ("a", ts(3), ts(6)),
        # b: touching [1,2] [2,3] → concurrent exactly at t=2 (closed)
        ("b", ts(1), ts(2)), ("b", ts(2), ts(3)),
        # c: disjoint [1,2] [3,4] → peak 1, first at t=1
        ("c", ts(1), ts(2)), ("c", ts(3), ts(4)),
    ]
    df = spark.createDataFrame(rows, "day string, s timestamp, e timestamp")
    got = {
        r["day"]: (r["n_sessions"], r["peak_concurrency"], r["first_peak_us"])
        for r in interval_peak_concurrency(df).collect()
    }
    assert got["a"] == (3, 3, us(3))
    assert got["b"] == (2, 2, us(2))
    assert got["c"] == (2, 1, us(1))
    plan = (
        interval_peak_concurrency(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_events_rfm_scores_quintiles_balanced(spark):
    """events_rfm_scores (r8): every score is a 1..5 quintile whose
    bucket sizes differ by at most one (ntile contract), the segment
    string is the score concatenation, and monetary is an exact
    integer micro-unit sum (no float fold in the sort key)."""
    from collections import Counter

    rows = REGISTRY["events_rfm_scores"].fn(spark, SF_DIR).collect()
    assert rows
    for col in ("r_score", "f_score", "m_score"):
        counts = Counter(r[col] for r in rows)
        assert set(counts) <= {1, 2, 3, 4, 5}
        assert max(counts.values()) - min(counts.values()) <= 1
    for r in rows:
        assert r["rfm_segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"
        assert isinstance(r["monetary_micros"], int)
        assert r["frequency"] >= 1 and r["recency_days"] >= 0


def test_training_best_of_n_argmax_contract(spark):
    """training_best_of_n (r8): the winner belongs to its prompt group,
    candidates partition the corpus, the margin is best−second, and the
    winner's score is the true per-group max (re-derived independently
    from the raw documents)."""
    from knowledge_model_spark.session import load_tables
    import re

    rows = REGISTRY["training_best_of_n"].fn(spark, SF_DIR).collect()
    docs = load_tables(spark, SF_DIR)["documents"].select(
        "doc_id", "text"
    ).collect()
    assert sum(r["n_candidates"] for r in rows) == len(docs)

    def score(text):
        toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if len(w) > 1]
        return len(set(toks)) / len(toks) if toks else 0.0

    best = {}
    for d in docs:
        pid = d["doc_id"] % 125
        key = (-score(d["text"]), d["doc_id"])
        if pid not in best or key < best[pid]:
            best[pid] = key
    for r in rows:
        assert r["best_doc_id"] % 125 == r["prompt_id"]
        assert r["best_doc_id"] == best[r["prompt_id"]][1]
        assert abs(r["best_score"] - round(-best[r["prompt_id"]][0], 6)) < 1e-9
        if r["second_score"] is not None:
            assert r["best_score"] >= r["second_score"]
            assert abs(r["margin"] - round(r["best_score"] - r["second_score"], 6)) < 1e-5


def test_quality_ppl_buckets_terciles_ordered(spark):
    """quality_ppl_buckets (r8): per language the three buckets
    partition the documents with balanced sizes and non-overlapping
    logppl ranges ordered head ≤ middle ≤ tail."""
    rows = REGISTRY["quality_ppl_buckets"].fn(spark, SF_DIR).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}, lang
        sizes = [b["n_docs"] for b in buckets.values()]
        assert max(sizes) - min(sizes) <= 1, lang
        assert buckets["head"]["max_logppl"] <= buckets["middle"]["min_logppl"]
        assert buckets["middle"]["max_logppl"] <= buckets["tail"]["min_logppl"]


def test_retrieval_maxsim_topk_matches_numpy(spark):
    """retrieval_maxsim_topk (r8): the two-stage Spark plan reproduces a
    numpy re-implementation of coarse-prune + MaxSim re-rank exactly
    (ranks per query), and the plan broadcasts the query batch with no
    Python on the hot path."""
    import numpy as np

    from knowledge_model_spark.session import load_tables

    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_tables(spark, SF_DIR)["embeddings"].collect()
    }
    queries = {i: emb[i] for i in sorted(emb) if i < 5}
    expected = {}
    for qid, qv in queries.items():
        coarse = sorted(emb, key=lambda v: (-float(qv @ emb[v]), v))[:50]
        qt = qv.reshape(8, 8)

        def maxsim(v):
            dt = emb[v].reshape(8, 8)
            return float(sum((qt @ dt.T).max(axis=1)))

        top = sorted(coarse, key=lambda v: (-maxsim(v), v))[:10]
        expected[qid] = top
    got = {}
    for r in REGISTRY["retrieval_maxsim_topk"].fn(spark, SF_DIR).collect():
        got.setdefault(r["query_id"], {})[r["rank"]] = r["vec_id"]
    for qid, top in expected.items():
        assert [got[qid][i + 1] for i in range(10)] == top, qid

    plan = _plan(spark, "retrieval_maxsim_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_eval_pass_at_k_matches_comb(spark):
    """eval_pass_at_k (r8): the unrolled ratio chain equals the exact
    combinatorial 1 − C(n−c,k)/C(n,k) for every task, and pass@1 is
    exactly c/n."""
    import math

    rows = REGISTRY["eval_pass_at_k"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        n, c, k = r["n"], r["c"], r["k"]
        want = (
            1.0
            if n - c < k
            else 1.0 - math.comb(n - c, k) / math.comb(n, k)
        )
        assert abs(r["pass_at_k"] - want) < 1e-12, (n, c, k)
        if k == 1:
            assert abs(r["pass_at_k"] - c / n) < 1e-12


def test_sample_coreset_kcenter_matches_numpy(spark):
    """sample_coreset_kcenter (r8): the distributed greedy walk equals
    a numpy re-implementation of Gonzalez farthest-point traversal
    (round-6 cosine, md5 seed, id tiebreak) step for step."""
    import hashlib

    import numpy as np

    from knowledge_model_spark.session import load_tables

    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_tables(spark, SF_DIR)["embeddings"].collect()
    }

    def cos(a, b):
        den = np.sqrt(a @ a) * np.sqrt(b @ b)
        return round(float(a @ b) / den, 6) if den else 0.0

    seed = min(emb, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))
    sel = [(seed, None)]
    while len(sel) < 4:
        cands = [
            (vid, max(cos(emb[vid], emb[s]) for s, _ in sel))
            for vid in emb
            if vid not in {s for s, _ in sel}
        ]
        vid, ms = min(cands, key=lambda t: (t[1], t[0]))
        sel.append((vid, ms))
    got = sorted(
        REGISTRY["sample_coreset_kcenter"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["center_rank"],
    )
    assert [(r["vec_id"], r["max_sim_to_selected"]) for r in got] == sel
    assert len({r["vec_id"] for r in got}) == 4


def test_graph_modularity_lang_invariants(spark):
    """graph_modularity_lang (r8): degree sums total 2m, intra edges
    never exceed m, node counts match the graph, and every q_contrib
    equals an independent python recompute from the raw tables."""
    from knowledge_model_spark.session import load_tables

    rows = REGISTRY["graph_modularity_lang"].fn(spark, SF_DIR).collect()
    docs = load_tables(spark, SF_DIR)["documents"].select(
        "doc_id", "lang"
    ).collect()
    lang = {d["doc_id"]: d["lang"] for d in docs}
    edges = [
        (d["doc_id"], d["doc_id"] + 1)
        for d in docs
        if d["doc_id"] % 10 < 4 and d["doc_id"] + 1 in lang
    ]
    m = len(edges)
    assert sum(r["degree_sum"] for r in rows) == 2 * m
    assert sum(r["intra_edges"] for r in rows) <= m
    want_nodes = {}
    want_intra = {}
    want_deg = {}
    for a, b in edges:
        want_nodes.setdefault(lang[a], set()).add(a)
        want_nodes.setdefault(lang[b], set()).add(b)
        want_deg[lang[a]] = want_deg.get(lang[a], 0) + 1
        want_deg[lang[b]] = want_deg.get(lang[b], 0) + 1
        if lang[a] == lang[b]:
            want_intra[lang[a]] = want_intra.get(lang[a], 0) + 1
    for r in rows:
        lg = r["lang"]
        assert r["n_nodes"] == len(want_nodes[lg])
        assert r["intra_edges"] == want_intra.get(lg, 0)
        assert r["degree_sum"] == want_deg[lg]
        q = want_intra.get(lg, 0) / m - (want_deg[lg] / (2.0 * m)) ** 2
        assert abs(r["q_contrib"] - q) < 1e-12


def test_eval_bleu_components_matches_python(spark):
    """eval_bleu_components (r8): clipped precisions re-derived
    independently (collections.Counter clipping) match every pair, and
    each p_n is a valid [0,1] ratio."""
    import re
    from collections import Counter

    from knowledge_model_spark.session import load_tables

    docs = {
        d["doc_id"]: [
            w for w in re.split(r"[^a-z0-9]+", d["text"].lower()) if len(w) > 1
        ]
        for d in load_tables(spark, SF_DIR)["documents"].collect()
    }

    def ngrams(t, n):
        return Counter(
            " ".join(t[i : i + n]) for i in range(len(t) - n + 1)
        )

    rows = REGISTRY["eval_bleu_components"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        c, ref = docs[r["cand_id"]], docs[r["ref_id"]]
        assert r["cand_len"] == len(c) and r["ref_len"] == len(ref)
        assert abs(r["brevity_ratio"] - len(c) / len(ref)) < 1e-12
        for n in range(1, 5):
            total = max(len(c) - n + 1, 0)
            if total == 0:
                assert r[f"p{n}"] is None
                continue
            cg, rg = ngrams(c, n), ngrams(ref, n)
            clipped = sum(min(cnt, rg[g]) for g, cnt in cg.items())
            assert abs(r[f"p{n}"] - clipped / total) < 1e-12, (r["cand_id"], n)
            assert 0.0 <= r[f"p{n}"] <= 1.0


def test_pair_clipped_counts_edge_cases(spark):
    """_pair_clipped_counts (r9, the routed one-pass clip core shared by
    eval_bleu_components / eval_chrf): planted gram streams with empty
    docs, one-sided grams, and count asymmetries match a Counter
    reference pair-for-pair.  Covers exactly the cases the sf fixtures
    may not contain (a pair whose cand or ref contributes no grams, and
    clipping where the REF side has the higher multiplicity)."""
    from collections import Counter

    from knowledge_model_spark.plans.retrieval_queries import (
        _pair_clipped_counts,
    )

    # (doc_id, n, h): docs 0-3 are candidates (%10<4); refs are doc+1.
    # doc 0: grams {7:2, 8:1} at n=1 | doc 1 (ref of 0): {7:1, 9:5}
    #   -> pair 0 clipped(n=1) = min(2,1) = 1
    # doc 1 is ALSO cand (%10<4); doc 2 (ref of 1): {9:2}
    #   -> pair 1 clipped = min(5,2) = 2
    # doc 2 cand; doc 3 ref: NO gram rows (empty doc) -> pair 2 absent
    # doc 3 cand; doc 4 ref: {11:3} vs {11:4} -> clipped = 3 (ref higher)
    # n=2 order: only pair 0 shares gram 20 (1 vs 1) -> c2 = 1
    rows = [
        (0, 1, 7), (0, 1, 7), (0, 1, 8),
        (1, 1, 7), (1, 1, 9), (1, 1, 9), (1, 1, 9), (1, 1, 9), (1, 1, 9),
        (2, 1, 9), (2, 1, 9),
        (3, 1, 11), (3, 1, 11), (3, 1, 11),
        (4, 1, 11), (4, 1, 11), (4, 1, 11), (4, 1, 11),
        (0, 2, 20), (1, 2, 20),
    ]
    # r12: the helper consumes the packed k = h*8 + n key (bijective for
    # n < 8), so the planted (n, h) rows are packed the same way the
    # gram-struct helpers pack them
    grams = spark.createDataFrame(rows, "doc_id long, n int, h long").selectExpr(
        "doc_id", "h * 8 + n AS k"
    )
    got = {
        r["cand_id"]: (r["c1"], r["c2"])
        for r in _pair_clipped_counts(grams, 2).collect()
    }

    # python reference: clip per (pair, n) with Counters.  Semantics:
    # a pair key appears iff EITHER side routed gram rows for ANY
    # order; per order, one-sided grams clip to 0 while an order with
    # no routed rows at all is NULL (both coalesce to 0 downstream).
    by_doc: dict = {}
    for d, n, h in rows:
        by_doc.setdefault((d, n), Counter())[h] += 1
    expect = {}
    for cand in (0, 1, 2, 3):
        cs = []
        present = False
        for n in (1, 2):
            cg = by_doc.get((cand, n), Counter())
            rg = by_doc.get((cand + 1, n), Counter())
            if not cg and not rg:
                cs.append(None)
                continue
            present = True
            cs.append(sum(min(c, rg[g]) for g, c in cg.items()))
        if present:
            expect[cand] = tuple(cs)
    assert set(got) == set(expect)
    for cand, want in expect.items():
        assert got[cand] == want, (cand, got[cand], want)
    # the planted values themselves, so the reference can't drift:
    # pair 0 shares gram 7 once and gram 20 once; pair 1 clips 5 ref-9s
    # to 2 and has a one-sided n=2 gram (0); pair 2 has disjoint grams
    # both sides (0); pair 3 clips cand's three 11s against ref's four
    assert got[0] == (1, 1)
    assert got[1] == (2, 0)
    assert got[2] == (0, None)
    assert got[3] == (3, None)


def test_gram_structs_short_doc_guard(spark):
    """_word_gram_structs / _char_gram_structs (r9 ADVICE regression):
    docs shorter than an order n must contribute ZERO grams at that
    order — the unguarded sequence(1, greatest(len-n+1, 0)) produced
    the descending [1, 0], which crashed slice (BLEU, word grams) and
    silently emitted two phantom grams per short doc per order (chrF,
    substr tolerates position 0).  Planted: an empty doc, a 1-token /
    1-char doc, a 2-token / 3-char doc, and a long doc as control —
    gram counts per order must equal max(len - n + 1, 0) exactly."""
    from pyspark.sql import functions as F

    from knowledge_model_spark.plans.retrieval_queries import (
        _char_gram_structs,
        _word_gram_structs,
    )

    words = spark.createDataFrame(
        [(0, []), (1, ["ab"]), (2, ["ab", "cd"]),
         (3, ["ab", "cd", "ef", "gh", "ij"])],
        "doc_id long, t array<string>",
    )
    got = {
        (r["doc_id"], r["n"]): r["cnt"]
        for r in words.select(
            "doc_id", F.explode(_word_gram_structs(4)).alias("k")
        )
        .groupBy("doc_id", (F.col("k") % 8).cast("int").alias("n"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    lens = {0: 0, 1: 1, 2: 2, 3: 5}
    want = {
        (d, n): L - n + 1
        for d, L in lens.items()
        for n in range(1, 5)
        if L - n + 1 > 0
    }
    assert got == want

    chars = spark.createDataFrame(
        [(0, ""), (1, "a"), (2, "abc"), (3, "abcdefgh")],
        "doc_id long, s string",
    )
    got_c = {
        (r["doc_id"], r["n"]): r["cnt"]
        for r in chars.select(
            "doc_id", F.explode(_char_gram_structs(6)).alias("k")
        )
        .groupBy("doc_id", (F.col("k") % 8).cast("int").alias("n"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    lens_c = {0: 0, 1: 1, 2: 3, 3: 8}
    want_c = {
        (d, n): L - n + 1
        for d, L in lens_c.items()
        for n in range(1, 7)
        if L - n + 1 > 0
    }
    assert got_c == want_c


def test_eval_rouge_l_matches_python(spark):
    """eval_rouge_l (r8): the vectorized rolling-row LCS equals a
    textbook O(mn) python DP for every pair, determinism holds, and
    the plan keeps the kernel shuffle-free after the pair join."""
    import re

    from knowledge_model_spark.session import load_tables

    docs = {
        d["doc_id"]: [
            w for w in re.split(r"[^a-z0-9]+", d["text"].lower()) if len(w) > 1
        ]
        for d in load_tables(spark, SF_DIR)["documents"].collect()
    }

    def lcs(a, b):
        dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                dp[i][j] = (
                    dp[i - 1][j - 1] + 1
                    if a[i - 1] == b[j - 1]
                    else max(dp[i - 1][j], dp[i][j - 1])
                )
        return dp[-1][-1]

    rows = REGISTRY["eval_rouge_l"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        c, ref = docs[r["cand_id"]], docs[r["ref_id"]]
        want = lcs(c, ref)
        assert r["lcs_len"] == want, (r["cand_id"], r["ref_id"])
        p = want / len(c) if c else 0.0
        rr = want / len(ref) if ref else 0.0
        assert abs(r["rouge_l_p"] - p) < 1e-12
        assert abs(r["rouge_l_r"] - rr) < 1e-12
        f1 = 2 * p * rr / (p + rr) if p + rr else 0.0
        assert abs(r["rouge_l_f1"] - f1) < 1e-12
    again = REGISTRY["eval_rouge_l"].fn(spark, SF_DIR).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_sql_scalar_udf_inlines_to_codegen(spark):
    """sql_scalar_udf_revenue (r8): the SQL UDF body must be INLINED by
    Catalyst — no Python evaluation nodes anywhere, the decimal
    multiply visible inside the HashAggregate."""
    plan = _plan(spark, "sql_scalar_udf_revenue")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
    assert "promote_precision" in plan or "decimal" in plan.lower()


def test_sample_bottomk_mergeable_identity(spark):
    """sample_bottomk_mergeable (r8): the merge-path result equals the
    direct global bottom-k (KMV mergeability), ranks are 1..k in md5
    order, and a python recompute agrees."""
    import hashlib

    from knowledge_model_spark.session import load_tables

    rows = sorted(
        REGISTRY["sample_bottomk_mergeable"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["rank"],
    )
    docs = load_tables(spark, SF_DIR)["documents"].select("doc_id").collect()
    want = sorted(
        (hashlib.md5(str(d["doc_id"]).encode()).hexdigest(), d["doc_id"])
        for d in docs
    )[: len(rows)]
    assert [r["doc_id"] for r in rows] == [d for _, d in want]
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_eval_chrf_matches_python(spark):
    """eval_chrf (r8): chrP/chrR/chrF2 re-derived independently with
    Counter clipping over character n-grams match every pair."""
    from collections import Counter

    from knowledge_model_spark.session import load_tables

    docs = {
        d["doc_id"]: d["text"].lower().replace(" ", "")
        for d in load_tables(spark, SF_DIR)["documents"].collect()
    }

    def grams(s, n):
        return Counter(s[i : i + n] for i in range(len(s) - n + 1))

    rows = REGISTRY["eval_chrf"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        c, ref = docs[r["cand_id"]], docs[r["ref_id"]]
        ps, rs = 0.0, 0.0
        for n in range(1, 7):
            cg, rg = grams(c, n), grams(ref, n)
            clipped = sum(min(v, rg[g]) for g, v in cg.items())
            ct, rt = max(len(c) - n + 1, 0), max(len(ref) - n + 1, 0)
            ps += clipped / ct if ct else 0.0
            rs += clipped / rt if rt else 0.0
        chrp, chrr = ps / 6, rs / 6
        chrf2 = (
            5 * chrp * chrr / (4 * chrp + chrr) if 4 * chrp + chrr > 0 else 0.0
        )
        assert abs(r["chrp"] - chrp) < 1e-12
        assert abs(r["chrr"] - chrr) < 1e-12
        assert abs(r["chrf2"] - chrf2) < 1e-12
        assert 0.0 <= r["chrf2"] <= 1.0


def test_text_rake_keyphrases_matches_python(spark):
    """text_rake_keyphrases (r8): top phrases re-derived with a
    textbook RAKE implementation (stopword splits, degree/frequency
    word scores, position-ordered phrase sums) match rank-for-rank."""
    import re

    from knowledge_model_spark.plans.text_queries import (
        RAKE_STOPWORDS,
        RAKE_TOP,
    )
    from knowledge_model_spark.session import load_tables

    docs = load_tables(spark, SF_DIR)["documents"].collect()
    got = {}
    for r in REGISTRY["text_rake_keyphrases"].fn(spark, SF_DIR).collect():
        got.setdefault(r["doc_id"], {})[r["rank"]] = (
            r["phrase"], r["n_words"], r["score"]
        )
    stop = set(RAKE_STOPWORDS)
    for d in docs:
        toks = [w for w in re.split(r"[^a-z0-9]+", d["text"].lower()) if w]
        phrases, cur = [], []
        for w in toks:
            if w in stop:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
        freq, deg = {}, {}
        for p in phrases:
            for w in p:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(p)
        scored = sorted(
            ((sum(deg[w] / freq[w] for w in p), " ".join(p), len(p)) for p in phrases),
            key=lambda t: (-t[0], t[1]),
        )[:RAKE_TOP]
        want = {i + 1: (ph, n, sc) for i, (sc, ph, n) in enumerate(scored)}
        have = got.get(d["doc_id"], {})
        assert set(have) == set(want), d["doc_id"]
        for rank, (ph, n, sc) in want.items():
            gph, gn, gsc = have[rank]
            assert gph == ph and gn == n, (d["doc_id"], rank)
            assert abs(gsc - sc) < 1e-9, (d["doc_id"], rank)


def test_graph_hits_trade_semantics(spark):
    """graph_hits_trade (r8): customers (even ids) carry hub scores and
    zero authority, suppliers (odd ids) the reverse; scores are
    max-normalized fixed-point (max == 1e6 on each side); a python
    recompute of the integer recurrence matches node-for-node."""
    from knowledge_model_spark.session import load_tables

    rows = REGISTRY["graph_hits_trade"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r["node"] % 2 == 0:
            assert r["auth_e6"] == 0, r
        else:
            assert r["hub_e6"] == 0, r
    assert max(r["hub_e6"] for r in rows) == 1_000_000
    assert max(r["auth_e6"] for r in rows) == 1_000_000

    t = load_tables(spark, SF_DIR)
    edges = {
        (r["o_custkey"] * 2, r["l_suppkey"] * 2 + 1)
        for r in t["orders"]
        .join(t["lineitem"], t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"])
        .select("o_custkey", "l_suppkey")
        .collect()
    }
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    h = {n: 1_000_000 for n in nodes}
    a = {}
    for _ in range(2):
        a = {}
        for s, d in edges:
            a[d] = a.get(d, 0) + h.get(s, 0)
        am = max(a.values())
        a = {n: v * 1_000_000 // am for n, v in a.items()}
        h = {}
        for s, d in edges:
            h[s] = h.get(s, 0) + a.get(d, 0)
        hm = max(h.values())
        h = {n: v * 1_000_000 // hm for n, v in h.items()}
    for r in rows:
        assert r["hub_e6"] == h.get(r["node"], 0), r["node"]
        assert r["auth_e6"] == a.get(r["node"], 0), r["node"]


def test_stats_spearman_rho_matches_scipy_style(spark):
    """stats_spearman_rho (r8): the midrank/decimal-moment pipeline
    equals a direct python Spearman (average ranks + Pearson) per
    group, and rho is in [-1, 1]."""
    from collections import defaultdict

    from knowledge_model_spark.session import load_tables

    li = load_tables(spark, SF_DIR)["lineitem"].select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    groups = defaultdict(list)
    for r in li:
        groups[r["l_returnflag"]].append((r["l_quantity"], r["l_extendedprice"]))

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            avg = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = avg
            i = j + 1
        return ranks

    def pearson(xs, ys):
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        num = n * sxy - sx * sy
        den = ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
        return num / den

    rows = {r["grp"]: r for r in REGISTRY["stats_spearman_rho"].fn(spark, SF_DIR).collect()}
    for grp, pairs in groups.items():
        rx = midranks([p[0] for p in pairs])
        ry = midranks([p[1] for p in pairs])
        want = pearson(rx, ry)
        got = rows[grp]
        assert got["n"] == len(pairs)
        assert abs(got["rho"] - round(want, 6)) < 1e-6, grp
        assert -1.0 <= got["rho"] <= 1.0


def test_stats_kendall_tau_matches_bruteforce(spark):
    """stats_kendall_tau (r8): the contingency-table tau-b equals the
    O(n²) pairwise definition (concordant − discordant over the
    tie-corrected normalizer) per group."""
    from collections import defaultdict

    from knowledge_model_spark.session import load_tables

    li = load_tables(spark, SF_DIR)["lineitem"].select(
        "l_returnflag", "l_quantity", "l_linenumber"
    ).collect()
    groups = defaultdict(list)
    for r in li:
        groups[r["l_returnflag"]].append((r["l_quantity"], r["l_linenumber"]))

    rows = {r["grp"]: r for r in REGISTRY["stats_kendall_tau"].fn(spark, SF_DIR).collect()}
    for grp, pairs in groups.items():
        n = len(pairs)
        conc = disc = tx = ty = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx = (pairs[i][0] > pairs[j][0]) - (pairs[i][0] < pairs[j][0])
                dy = (pairs[i][1] > pairs[j][1]) - (pairs[i][1] < pairs[j][1])
                if dx == 0 and dy == 0:
                    tx += 1
                    ty += 1
                elif dx == 0:
                    tx += 1
                elif dy == 0:
                    ty += 1
                elif dx == dy:
                    conc += 1
                else:
                    disc += 1
        n0 = n * (n - 1) // 2
        # tie masses per definition: n1 = pairs tied on x, n2 tied on y
        want = (conc - disc) / (((n0 - tx) * (n0 - ty)) ** 0.5)
        got = rows[grp]
        assert got["n"] == n
        assert abs(got["tau_b"] - round(want, 6)) < 1e-6, grp
        assert -1.0 <= got["tau_b"] <= 1.0


def test_corpus_gini_concentration_semantics(spark):
    """corpus_gini_concentration (r8): Gini in [0,1), python recompute
    per language via the sorted-index identity matches round-6, and a
    uniform distribution scores ~0 by the identity's construction."""
    import re
    from collections import Counter, defaultdict

    from knowledge_model_spark.session import load_tables

    docs = load_tables(spark, SF_DIR)["documents"].collect()
    by_lang = defaultdict(Counter)
    for d in docs:
        toks = [w for w in re.split(r"[^a-z0-9]+", d["text"].lower()) if len(w) > 1]
        by_lang[d["lang"]].update(toks)
    rows = {r["lang"]: r for r in
            REGISTRY["corpus_gini_concentration"].fn(spark, SF_DIR).collect()}
    for lang, cnt in by_lang.items():
        cs = sorted(cnt.values())
        n, tot = len(cs), sum(cs)
        want = sum((2 * (i + 1) - n - 1) * c for i, c in enumerate(cs)) / (n * tot)
        got = rows[lang]
        assert got["n_terms"] == n
        assert abs(got["gini"] - round(want, 6)) < 1e-6, lang
        assert 0.0 <= got["gini"] < 1.0


def test_graph_assortativity_trade_matches_python(spark):
    """graph_assortativity_trade (r8): the decimal-moment Pearson over
    endpoint degrees equals a direct python computation on the
    symmetrized edge list."""
    from collections import Counter

    from knowledge_model_spark.session import load_tables

    t = load_tables(spark, SF_DIR)
    e0 = {
        (r["o_custkey"] * 2, r["l_suppkey"] * 2 + 1)
        for r in t["orders"]
        .join(t["lineitem"], t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"])
        .select("o_custkey", "l_suppkey")
        .collect()
    }
    edges = list(e0) + [(d, s) for s, d in e0]
    deg = Counter(s for s, _ in edges)
    xs = [deg[s] for s, _ in edges]
    ys = [deg[d] for _, d in edges]
    m = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    want = (m * sxy - sx * sy) / (
        ((m * sxx - sx * sx) * (m * syy - sy * sy)) ** 0.5
    )
    row = REGISTRY["graph_assortativity_trade"].fn(spark, SF_DIR).collect()[0]
    assert row["m_edges"] == m
    assert abs(row["assortativity"] - round(want, 6)) < 1e-6
    assert -1.0 <= row["assortativity"] <= 1.0
