"""Physical-plan shape assertions (SURVEY §4.3, the 100 TB checklist).

Correctness tests prove the operators compute the right answer; these
prove Catalyst produced the plan that survives a 1000-executor cluster:
filters pushed to the parquet scan, columns pruned, small dims
broadcast, top-k collapsed to TakeOrderedAndProject, aggregates
partial+final. A regression here is a performance bug even when every
value still matches.
"""

from __future__ import annotations

from odns_dataimporter_spark.registry import REGISTRY, all_queries

all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_compound")
    assert "PushedFilters: [" in plan
    # the IN and range predicates must reach the parquet reader
    assert "In(o_orderstatus" in plan
    assert "GreaterThanOrEqual(o_totalprice,10000" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "fn_map_json")
    # 2-output-column query over a 6-column table: scan must read only what's needed
    assert "ReadSchema: struct<event_id:bigint,props:string>" in plan


def test_dim_joins_are_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_broadcast")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_range_join_broadcasts_tiny_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_theta_range")
    assert "BroadcastNestedLoopJoin" in plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "limit_topk")
    assert "TakeOrderedAndProject" in plan


def test_agg_is_partial_then_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_hash_group")
    # map-side partial aggregation keeps the shuffle at |groups|
    assert "partial_" in plan
    assert plan.count("HashAggregate") >= 2


def test_window_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "window_rank")
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_single_shuffle(spark, sf_dir):
    # union + window construction must shuffle once on user_id, not per side
    plan = _plan(spark, sf_dir, "join_asof")
    assert plan.count("Exchange hashpartitioning") == 1


def test_minhash_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_near_minhash")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_topk_cosine_broadcasts_probes(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sim_topk_cosine")
    # probes are the tiny side: the candidate stream must not shuffle for the join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_layout_rewrite_prunes_partitions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "layout_partition_prune")
    # the rewritten layout must let the scan skip every other event_type
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert "(event_type" in plan and "purchase" in plan


def test_prep_pipeline_two_shuffles(spark, sf_dir):
    # the composed LLM-prep pipeline must stay at exactly two exchanges
    # (dedup groupBy + final groupBy) — a regression here means a stage
    # stopped fusing
    plan = _plan(spark, sf_dir, "llm_prep_pipeline")
    assert plan.count("Exchange hashpartitioning") == 2


def test_bucketed_join_has_no_join_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "bucketed_join_no_shuffle")
    # bucketed+sorted on the join key on both sides: the SMJ needs no
    # exchange; the only allowed exchange is the final tiny aggregation
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    # the plan tree prints top-down, so everything after the SMJ node is
    # its input subtree: neither bucketed scan may re-shuffle
    below_join = plan[plan.index("SortMergeJoin") :]
    assert "Exchange" not in below_join


def test_scalar_folding_runs_no_driver_action(spark, sf_dir):
    # corpus-size scalars must be broadcast 1-row aggregates INSIDE the
    # plan, not driver-side count() pre-actions: at 100 TB a pre-action
    # is an extra full scan plus a driver sync point per query
    # the only jobs allowed during plan CONSTRUCTION are the 1-task
    # parquet footer/schema reads each spark.read.parquet issues (stage
    # name "parquet at ..."); a driver-side count() would surface as a
    # "count at ..." / "collect at ..." stage
    tracker = spark.sparkContext.statusTracker()

    for name in ("text_tfidf", "text_keywords_topk", "graph_pagerank"):
        before = set(tracker.getJobIdsForGroup())
        REGISTRY[name].fn(spark, sf_dir)  # plan construction only
        for job_id in set(tracker.getJobIdsForGroup()) - before:
            info = tracker.getJobInfo(job_id)
            for stage_id in info.stageIds if info else ():
                stage = tracker.getStageInfo(stage_id)
                assert stage is None or stage.name.startswith("parquet at"), (
                    f"{name} ran a non-scan-setup job during plan build: "
                    f"{stage.name}"
                )


def test_containment_pairs_are_token_keyed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_containment")
    # candidate generation must be the inverted-index join keyed on the
    # TOKEN posting, never a lang-blocked self-join: one lang block at
    # 100 TB is nearly the whole corpus, i.e. O(n^2) pair expansion
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    # every equi-join keyed on lang alone is forbidden; the candidate
    # join's hash keys must include the token column
    for m in re.finditer(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[([^\]]*)\]", plan):
        keys = m.group(2)
        if "lang" in keys:
            assert "token" in keys, f"lang-keyed join without token key: {m.group(0)}"


def test_embedding_dedup_is_blocked_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_embedding_cosine")
    # pair generation must stay keyed on the label block — an unkeyed
    # self-join here is O(n^2) over the whole corpus at 100 TB
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q19_disjunction_keeps_hash_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sql_api_q19")
    # the OR-of-conjunctions must stay a residual on the p_partkey equi
    # join — falling back to a nested loop is O(n*m) at 100 TB
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q4_exists_is_semi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sql_api_q4")
    # EXISTS must decorrelate to a semi join (one probe per order, no
    # duplication), never a correlated re-scan of lineitem
    assert "LeftSemi" in plan


def test_skew_join_partitions_on_salted_key(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_skew_salted")
    # the join shuffle must be keyed on (event_type, _salt) so each hot
    # key fans across _N_SALT reducers instead of landing on one
    assert "SortMergeJoin" in plan
    import re
    assert re.search(r"Exchange hashpartitioning\(event_type#\d+, _salt#\d+", plan)


def test_range_join_binned_is_equi(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_range_binned")
    # the bin quantization must turn the interval join into an equi
    # join — a nested loop here is O(n*m) with both sides big
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_injects_on_selective_dim_join(spark, sf_dir):
    """Spark's runtime bloom filter: a selective filter on the build
    side of a shuffle join is converted into a might_contain() probe
    pushed into the fact side's scan stage, pruning shuffle input at
    runtime. At 100 TB the 10 GB application-side default threshold is
    met naturally; locally we lower it to observe the plan Catalyst
    would produce there."""
    from pyspark.sql import functions as F

    from odns_dataimporter_spark.tables import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_range_cluster_pushes_ts_bounds_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "layout_range_cluster")
    # both range bounds must reach the parquet reader so row-group
    # min/max stats on the clustered layout can skip everything outside
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(ts" in plan
    assert "LessThan(ts" in plan


def test_pack_sequences_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pack_sequences")
    # the cumsum window shuffles once on source; the (source, seq_id)
    # aggregate must reuse that partitioning (hash on a subset of the
    # group keys satisfies the aggregate's clustered distribution) —
    # a second exchange here re-shuffles the whole corpus at 100 TB
    assert plan.count("Exchange hashpartitioning") == 1


def test_decontam_broadcasts_eval_grams(spark, sf_dir):
    import re

    plan = _plan(spark, sf_dir, "decontam_ngram")
    # the contamination probe must broadcast the (small) eval gram set
    # into a semi join — shuffling the exploded training corpus on gram
    # would move the full 100 TB token stream
    assert re.search(r"BroadcastHashJoin \[gram#\d+\], \[gram#\d+\], LeftSemi", plan)


def test_segment_dedup_two_shuffles(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_segment_cross")
    # one exchange on the segment digest (window count), one on doc_id
    # (per-doc stats) — anything more means the corpus moved twice
    assert plan.count("Exchange hashpartitioning") == 2


def test_quantize_has_no_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "embed_quantize_int8")
    # pure per-row array math: any exchange here means the planner
    # stopped fusing and the full embedding corpus moves at 100 TB
    assert "Exchange" not in plan


def test_source_weighted_sample_broadcasts_counts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sample_source_weighted")
    # only the tiny per-source count aggregate may shuffle; the corpus
    # side joins against it via broadcast
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_vocab_topn_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_vocab_topn")
    # the top-500 cut must collapse to TakeOrderedAndProject so the
    # global id window runs over 500 rows, never the whole vocabulary
    assert "TakeOrderedAndProject" in plan


def test_funnel_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_funnel")
    # the whole 3-stage funnel must reduce to one exchange on user_id —
    # the naive formulation scans and joins events three times
    assert plan.count("Exchange hashpartitioning") == 1


def test_sessionize_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sessionize_lag_cumsum")
    # lag window, cumsum window, and per-session aggregate all share the
    # user_id partitioning: exactly one exchange end to end
    assert plan.count("Exchange hashpartitioning") == 1


def test_zorder_pushes_both_dims_to_scan(spark, sf_dir):
    # toString() truncates long filter lists; formatted mode prints the
    # full PushedFilters line
    df = REGISTRY["layout_zorder"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # both dimensions' predicates must reach the parquet reader — the
    # z-ordered layout makes row-group min/max tight on BOTH columns,
    # so each pushed range independently skips row groups
    assert "GreaterThanOrEqual(user_id,3)" in plan
    assert "LessThanOrEqual(user_id,6)" in plan
    assert "GreaterThanOrEqual(ts" in plan
    assert "LessThan(ts" in plan


def test_join_strategy_hints_override_catalyst(spark, sf_dir):
    """The join-hint API surface: each strategy hint must win over
    Catalyst's default pick (the escape hatch when statistics mislead
    the planner at scale)."""
    from odns_dataimporter_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")

    def plan_of(hint):
        j = li.join(o.hint(hint), li.l_orderkey == o.o_orderkey)
        return j._jdf.queryExecution().executedPlan().toString()

    assert "BroadcastHashJoin" in plan_of("broadcast")
    assert "ShuffledHashJoin" in plan_of("shuffle_hash")
    assert "SortMergeJoin" in plan_of("merge")


def test_inverted_index_single_shuffle(spark, sf_dir):
    # within-doc dedup happens map-side (array_distinct before explode):
    # exactly one exchange, carrying distinct (token, doc_id) pairs
    plan = _plan(spark, sf_dir, "text_inverted_index")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_scd2_build_reuses_user_partitioning(spark, sf_dir):
    # combined (user, day) rollup + ONE user_id exchange shared by the
    # lag window, the running-sum window, and the island aggregate
    plan = _plan(spark, sf_dir, "scd2_build")
    assert plan.count("Exchange hashpartitioning") == 2


def test_scd2_lookup_range_residual_stays_equi(spark, sf_dir):
    # the validity-interval BETWEEN must ride the user_id equi-join as a
    # residual — a nested-loop here explodes at scale
    plan = _plan(spark, sf_dir, "scd2_lookup")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kmeans_assignment_is_broadcast(spark, sf_dir):
    # the k×64-float centroid table broadcasts: assignment adds no
    # shuffle; only the (cid, dim) regroup exchanges
    plan = _plan(spark, sf_dir, "ml_kmeans_step")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_gapfill_spine_never_shuffles(spark, sf_dir):
    # the hour×type grid is built broadcast-side (spine from a scalar
    # min/max agg); only the hourly aggregate and LOCF window exchange
    plan = _plan(spark, sf_dir, "ts_gapfill_locf")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_histogram_single_shuffle(spark, sf_dir):
    # per-bin counts are one map-side-combined exchange; the dense bin
    # spine joins broadcast-side
    plan = _plan(spark, sf_dir, "agg_histogram")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastHashJoin" in plan


def test_levenshtein_block_is_equi_join(spark, sf_dir):
    # blocking key turns all-pairs fuzzy matching into an equi-join
    plan = _plan(spark, sf_dir, "fn_levenshtein_block")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_iterations_never_cartesian(spark, sf_dir):
    # unrolled iterations are equi-joins over |event types|-row tables;
    # a cartesian here would explode on a bigger node set
    plan = _plan(spark, sf_dir, "graph_pagerank")
    assert "CartesianProduct" not in plan


def test_keywords_vocab_joins_broadcast(spark, sf_dir):
    # the doc-frequency (vocabulary) side joins broadcast onto the TF
    # aggregate; the per-doc top-3 window rides the doc_id partitioning
    plan = _plan(spark, sf_dir, "text_keywords_topk")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dq_fk_check_single_pass(spark, sf_dir):
    # round-6 single-pass shape: the FK probe is a LEFT OUTER join
    # against the checkpointed orders key set whose null matches are
    # counted in the SAME aggregate as the row count and qty check —
    # one lineitem scan serves all three lineitem constraints (the
    # previous anti-join formulation re-scanned per constraint).
    # Never a nested-loop NOT EXISTS.
    plan = _plan(spark, sf_dir, "dq_constraint_check")
    assert "LeftOuter" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan.replace(
        "BroadcastNestedLoopJoin BuildRight, Cross", ""
    )  # the 1-row stats-assembly cross joins are broadcast-trivial
    assert plan.count("lineitem.parquet") <= 1


def test_ohlc_is_partial_then_final_aggregate(spark, sf_dir):
    # min_by over the string order key falls back to SortAggregate, but
    # it must still be two-phase: map-side partial, shuffle at |buckets|
    plan = _plan(spark, sf_dir, "ts_resample_ohlc")
    assert "partial_" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_decimal_agg_is_hash_partial_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_decimal_exact")
    assert "partial_" in plan
    assert plan.count("HashAggregate") >= 2


def test_bpe_pairs_explode_from_vocab_not_corpus(spark, sf_dir):
    # two Generates is wrong (pairs would explode from the corpus);
    # the pair Generate must sit ABOVE the word-count aggregate
    plan = _plan(spark, sf_dir, "text_bpe_pair_stats")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange hashpartitioning") == 2  # word count + pair count


def test_interval_overlap_no_cartesian(spark, sf_dir):
    # the bin trick must keep this an equi join (hash or broadcast-hash),
    # never a nested-loop over the cross product
    plan = _plan(spark, sf_dir, "join_interval_overlap")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_graph_single_scored_shuffle(spark, sf_dir):
    # block-pair scoring shuffles on (ga, gb); the global merge window
    # shuffles the k*B survivors on src_id — nothing else
    plan = _plan(spark, sf_dir, "sim_knn_graph")
    assert "CartesianProduct" not in plan
    assert plan.count("FlatMapGroupsInPandas") == 1


def test_ks_drift_two_combined_shuffles(spark, sf_dir):
    # per-(type, cents) counts (map-side combined to the distinct-value
    # domain), then ONE event_type exchange shared by the cumulative
    # window, the full-partition totals, and the final max — never a
    # per-type totals join
    plan = _plan(spark, sf_dir, "stats_ks_drift")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "partial_" in plan
    assert "SortMergeJoin" not in plan


def test_ewma_lags_evaluate_in_one_window_pass(spark, sf_dir):
    # all 16 lag() terms + row_number share one window spec => a single
    # Window operator over a single event_type exchange
    plan = _plan(spark, sf_dir, "ts_ewma_dyadic")
    assert plan.count("Window") == 1
    assert "CartesianProduct" not in plan


def test_sequence_match_single_shuffle(spark, sf_dir):
    # journey fold is one map-side-combinable collect on user_id; all
    # regex work is per-row above it
    plan = _plan(spark, sf_dir, "events_sequence_match")
    assert plan.count("Exchange hashpartitioning") == 1


def test_welch_corpus_agg_is_partial_then_final(spark, sf_dir):
    # the corpus contributes one partial+final aggregate down to
    # |sources| rows; the pairwise join runs on that tiny table
    plan = _plan(spark, sf_dir, "stats_welch_ttest")
    assert "partial_" in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_rollup_incremental_prunes_both_scans(spark, sf_dir):
    # base and delta date predicates must reach their parquet scans so
    # the incremental refresh reads only the new partition's row groups
    plan = _plan(spark, sf_dir, "rollup_incremental")
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "partial_" in plan


# Ops whose BroadcastNestedLoopJoin is the INTENDED scale shape: a
# broadcast single-row aggregate (corpus totals / thresholds / spine
# bounds), a broadcast centroid/band table, or an explicit bounded
# cross join. Everything else must stay hash/sort-merge equi.
_BNLJ_ALLOWED = {
    "agg_histogram_equidepth",  # broadcast single-row quantile boundaries
    "dedup_minhash_recall",  # cross join of three single-row count aggregates
    "dedup_minhash_recall_prod",  # same, at the production LSH preset
    "dq_constraint_check",
    "dq_freshness_lag",  # broadcast 1-row global high-water mark
    "events_ab_assignment_srm",  # broadcast 1-row SRM totals aggregate
    "events_rfm_segments",  # broadcast 1-row anchor-day + quartile aggregates
    "events_sankey_paths",  # broadcast 1-row path-total aggregate
    "events_survival_km",  # broadcast 1-row observation-horizon aggregate
    "events_template_compression",  # broadcast 1-row totals aggregate
    "events_time_to_convert",  # final 1-row reduce
    "graph_pagerank",  # broadcast single-row |nodes| aggregate (folded scalar)
    "ml_logreg_step",  # broadcast single-row |rows| count aggregate
    "ml_naive_bayes_fit",  # broadcast single-row vocab-size aggregate
    "stats_benford_digits",  # broadcast single-row total-count aggregate
    "stats_bootstrap_ci",  # broadcast 1-row rank-picked CI bounds + totals
    "stats_mann_kendall",  # |days|^2 pairwise over the reduced series + scalars
    "stats_theil_sen",  # broadcast 1-row series-origin aggregate
    "text_boilerplate_ngrams",  # broadcast single-row corpus-size aggregate
    "ts_cusum_changepoint",  # broadcast 1-row totals aggregate
    "ts_downsample_lttb",  # broadcast 1-row span-bounds aggregate
    "ts_seasonal_hourly_profile",  # broadcast |types|-row totals rollup
    "dedup_semdedup",  # broadcast k-row centroid table (assignment stage)
    "dedup_semdedup_ann",  # broadcast 1-row governor scalar + √k coarse cells
    "sim_mmr_rerank",  # broadcast probe rows × streamed corpus (sim_topk shape)
    "graph_triangle_count",  # cross join of three single-row count aggregates
    "llm_curation_pipeline_v2",  # inherits DSIR's broadcast totals scalar
    "sample_importance_resample",  # inherits DSIR's broadcast totals scalar
    "text_importance_dsir",  # broadcast 1-row feature-totals aggregate
    "tokenizer_bpe_merges",  # broadcast 1-row best-pair argmax per round
    "tokenizer_bpe_encode",  # same trainer chain + broadcast vocab join
    "text_keywords_topk",  # broadcast single-row corpus-size aggregate
    "text_tfidf",  # broadcast single-row corpus-size aggregate
    "sim_maxsim_late_interaction",  # broadcast FIXED query-token registry
    #   (<= 32 rows by id bound) against the streaming corpus side —
    #   the designed linear late-interaction loop
    "text_bigram_kneser_ney",  # broadcast 1-row bigram-type-total aggregate
    "events_cuped_adjustment",  # broadcast 1-row theta/global-means aggregate
    "text_bm25_topk",  # broadcast 1-row corpus (N, sum_dl) stats aggregate
    "sample_balanced_classes",  # broadcast 1-row minority-class-count scalar
    "ml_confusion_thresholds",  # broadcast FIXED 3-row threshold registry
    "sim_rrf_fusion",  # broadcast 1-row probe vector + 1-row corpus stats
    "embed_matryoshka_recall",  # broadcast FIXED 4-row truncation registry
    "stats_randomization_test",  # broadcast 1-row observed-diff aggregate
    "join_cross",
    "join_global_sales_q22",
    "join_theta_range",
    "mining_assoc_rules",  # broadcast 1-row basket-count aggregate
    "ml_kmeans_step",
    "sample_coreset_kcenter",  # broadcast 1-row argmax pick per round
    "sim_ann_ivf",
    "sim_ann_ivf_multiprobe",  # broadcast centroid table (tiny)
    "stats_ks_drift",  # broadcast 1-row split-midpoint aggregate
    "stats_psi_drift",  # broadcast 1-row midpoint + totals aggregates
    "stats_welch_ttest",  # pairwise < join over the |sources|-row stats table
    "ts_autocorr_lag",  # broadcast spine bounds (same shape as ts_gapfill_locf)
    "ts_dominant_period",  # broadcast spine bounds (same shape as ts_gapfill_locf)
    "ts_ewma_dyadic",  # broadcast spine bounds (same shape as ts_gapfill_locf)
    "text_bigram_logprob",  # broadcast single-row vocab-size aggregate
    "sim_incremental_topk",  # broadcast probe set, same shape as sim_topk_cosine
    "sim_topk_cosine",
    "embed_decontaminate_cosine",  # broadcast eval slice (2% of corpus), big side streams
    "decontam_combined",  # inherits embed_decontaminate_cosine's broadcast eval NLJ
    "fn_edit_distance",  # bounded 30-key pair block (scalar-semantics pin)
    "sql_api_q11",
    "stats_chi_square",
    "stream_watermark_late",
    "text_quality_buckets",
    "text_unigram_logprob",
    "ts_gapfill_locf",
    # 1-row dense Bloom bitmap broadcast into the fact scan (round 6):
    # the nested loop is over exactly one row; the real join below it
    # is a BroadcastHashJoin (plan-pinned in test_bloom_prefilter_shape)
    "join_bloom_prefilter",
    # round 7: 1-row corpus-stats broadcast (the text_bm25_topk shape)
    "ml_ndcg_at_k",
    "ml_mrr_recall_at_k",
    # round 7: 1-row full-data variance broadcast into the |days| table
    "events_msprt_sequential",
    # round 7 waves B-E: 1-row scalar broadcasts (time midpoint /
    # stump state + totals / global uniformity row) crossJoined into
    # small aggregated tables — the same shape as ks_drift
    "stats_cvm_twosample",
    "ml_gbm_residual_step",
    "embed_alignment_uniformity",
    # 1-row weight-total broadcast into the stratum table
    "sample_neyman_allocation",
    # 1-row root-split + totals broadcasts into the |days| prefix table
    "ts_changepoint_binseg",
    # 1-row corpus-total broadcast into the bounded joint-cell table
    "stats_spearman_corr",
    # theta self-join (a < b) of the k-row GROUP table: k(k-1)/2 pairs
    # by construction, plus the 1-row pooled-variance broadcast
    "stats_tukey_hsd",
    # 1-row broadcasts: corpus total into moment cells / fitted weight
    # vector into the scoring scan / key-moment row into the top-k table
    "ml_ridge_probe",
    "profile_shuffle_skew",
    # 1-row fitted (A, B) + NLL broadcasts into the bins histogram
    "ml_platt_calibration",
    # 1-row hour-count total broadcast into the 1-row folded state
    "ts_croston_intermittent",
    # 1-row broadcast centroid-array into the assignment map (per Lloyd
    # round) — the k x d state is tiny by construction
    "ml_kmeans_lloyd3",
    # round 8: 1-row bounds broadcast crossJoined into the events scan
    # (the ts_gapfill_locf shape) for the two-period split
    "events_poisson_rate_test",
    # round 8: broadcast spine bounds via _dense_hourly_counts (same
    # shape as ts_autocorr_lag)
    "stats_ljung_box",
    # round 8: broadcast daily-spine bounds (_dense_daily_counts, the
    # ts_gapfill_locf shape)
    "stats_runs_test",
    "stats_page_hinkley",
    # round 8: broadcast ~30-row adoption curve + 1-row market-size
    # aggregate crossed into the bounded 100-combo parameter grid
    "events_bass_diffusion",
    # round 8: inequality self-joins over the bounded 64-row cumulative
    # bin table (the stats_mann_kendall |days|^2 shape)
    "ml_isotonic_calibration",
    # round 8 waves K-O (late additions, audited together): 1-row
    # scalar broadcasts — corpus totals / bounds / pooled moments —
    # crossJoined into bounded aggregated tables (the ks_drift shape)
    "embed_hamming_topk",  # 1-row probe-signature broadcast into the scan
    "events_shapley_attribution",  # bounded 2^k subset lattice crosses
    "graph_kcore",  # 1-row |nodes| scalar into the bounded peel rounds
    "graph_modularity",  # 1-row total-edge-weight scalar
    "ml_brier_decomposition",  # 1-row base-rate scalar into the bin table
    "ml_linear_shap",  # 1-row determinant/coefficient row into the scan
    "ml_quantile_regression_grid",  # bounded parameter-lattice cross
    "stats_cramers_v",  # 1-row grand-total scalar into the cell table
    "stats_mood_median",  # 1-row grand-median scalar into the group table
    "stats_qq_normal",  # 1-row (n, mean, sd) scalar into the decile table
    "text_heaps_law",  # 1-row bounds aggregate (checkpointed)
    "text_term_burstiness",  # 1-row corpus-total scalar into term moments
    "tokenizer_unigram_encode",  # broadcast learned piece-cost vocab
    "ts_ar2_yule_walker",  # 1-row lag-product sufficient-stats row
    "ts_bollinger_bands",  # 1-row band-parameter scalar into the series
    "ts_hurst_exponent",  # bounded 4-row dyadic-block R/S table crosses
    # round 8 geo wave: broadcast bounded hub table (25 rows) crossed
    # into the point scan / broadcast 5-row box table theta join —
    # the designed broadcast-refine spatial shapes
    "geo_nearest_hub",
    "geo_point_in_box",
    # round 8 nonparametrics: 1-row tie-total / span-midpoint scalar
    # broadcasts (the stats_ks_drift shape)
    "stats_kruskal_wallis",
    "stats_wilcoxon_signed_rank",
    "stats_mcnemar",
    # round 8 closing wave: 1-row scalar / bounded-table broadcasts
    "geo_dbscan_grid",  # 1-row (city-count, eps) governor row
    "stats_fisher_exact",  # 1-row corpus totals + 1-row 2x2 cell row
    "graph_hits",  # single-row gathered graph (the pagerank shape)
    "text_pmi_pairs",  # 1-row corpus-size scalar (the text_tfidf shape)
    "embed_silhouette",  # broadcast |labels|-row centroid table
    "ts_variance_ratio",  # broadcast spine bounds (ts_gapfill_locf shape)
    "ts_peak_detect",  # broadcast spine bounds + |types|-row moments
}


def test_registry_wide_join_hygiene(spark, sf_dir):
    """Every registered query's physical plan: no CartesianProduct,
    and BroadcastNestedLoopJoin only where a tiny broadcast side makes
    it the correct 100 TB shape (allowlist above). Catches the classic
    silent regression where a mistyped join key degrades an equi join
    into a nested loop that 'works' at test scale."""
    offenders = {}
    for name, spec in sorted(REGISTRY.items()):
        plan = _plan(spark, sf_dir, name)
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_ALLOWED:
            offenders[name] = "BroadcastNestedLoopJoin (not allowlisted)"
    assert not offenders, offenders


def test_link_prediction_topn_is_take_ordered_anti_join(spark, sf_dir):
    # candidate non-edges come from a LEFT ANTI join on the pair key;
    # the top-N cut collapses to TakeOrderedAndProject (no global sort)
    plan = _plan(spark, sf_dir, "graph_link_prediction")
    assert "TakeOrderedAndProject" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_attribution_single_window_pass(spark, sf_dir):
    # first_touch and last_touch share one window spec => one user_id
    # exchange and a single Window node computing both
    plan = _plan(spark, sf_dir, "events_attribution_touch")
    assert plan.count("Exchange hashpartitioning") <= 2  # window + final agg
    assert plan.count("Window") == 1


def test_rfm_quantiles_broadcast_not_sorted(spark, sf_dir):
    # quartile thresholds join back as a broadcast 1-row aggregate;
    # no global sort / single-partition window anywhere
    plan = _plan(spark, sf_dir, "events_rfm_segments")
    assert "BroadcastNestedLoopJoin" in plan  # 1-row scalar crossJoin
    assert "Window" not in plan
    assert "Sort [recency_days" not in plan


def test_boilerplate_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_boilerplate_ngrams")
    assert "CartesianProduct" not in plan


def test_logreg_partial_aggregate(spark, sf_dir):
    # per-dimension gradient sums must be map-side combined: the
    # shuffle carries |dims| keys per partition, not |rows × dims|
    plan = _plan(spark, sf_dir, "ml_logreg_step")
    assert "partial_" in plan
    assert plan.count("HashAggregate") >= 2


def test_rolling_distinct_semi_join_broadcast(spark, sf_dir):
    # the day-spine restriction is a broadcast semi join, and the 7x
    # explode amplifies the deduped per-user-day table, not raw events
    plan = _plan(spark, sf_dir, "events_rolling_distinct_7d")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_simhash_no_distinct_after_join(spark, sf_dir):
    # pair dedup is the first-matching-chunk predicate, not a DISTINCT:
    # after the bucket join there must be no further aggregate exchange
    plan = _plan(spark, sf_dir, "dedup_simhash_hamming")
    join_pos = max(plan.find("BroadcastHashJoin"), plan.find("SortMergeJoin"))
    assert join_pos >= 0
    head = plan[:join_pos]  # executed-plan text lists downstream ops first
    assert "Exchange hashpartitioning" not in head


def test_corr_matrix_single_scan(spark, sf_dir):
    # the 3 correlation pairs unfold from ONE sufficient-stats aggregate;
    # a per-pair union would triple the lineitem scan
    plan = _plan(spark, sf_dir, "stats_corr_matrix")
    assert plan.count("FileScan") == 1
    assert "partial_" in plan


def test_shuffle_hash_hint_is_honored(spark, sf_dir):
    # hints silently no-op when misapplied; pin the physical operator
    plan = _plan(spark, sf_dir, "join_shuffle_hash_hint")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semdedup_pair_join_is_cluster_keyed(spark, sf_dir):
    # the only nested-loop join is the broadcast k-row centroid table;
    # the O(cluster^2) pair stage must be an equi join keyed on cid
    plan = _plan(spark, sf_dir, "dedup_semdedup")
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin [cid" in plan or "ShuffledHashJoin [cid" in plan
            or "BroadcastHashJoin [cid" in plan)


def test_dup_span_coverage_fingerprint_keyed(spark, sf_dir):
    # df filter and join-back both key on the 60-bit ngram fingerprint;
    # no string ngrams cross the wire and nothing is a nested loop
    plan = _plan(spark, sf_dir, "text_dup_span_coverage")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dsir_bucket_table_broadcast(spark, sf_dir):
    # the 1024-row bucket-count table and the 1-row totals both join
    # back as broadcasts: the corpus side is never shuffled for them
    plan = _plan(spark, sf_dir, "text_importance_dsir")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2


def test_triangle_count_ships_adjacency_not_wedges(spark, sf_dir):
    # the closing stage must intersect shipped out-neighborhoods, not
    # materialize the wedge set through a shuffle (41M wedge rows vs
    # 1.2M edges at sf0.1 — the wedge join killed a 1 GB-heap session)
    plan = _plan(spark, sf_dir, "graph_triangle_count")
    assert "array_intersect" in plan
    assert "CartesianProduct" not in plan


def test_winnow_fingerprints_zero_shuffle(spark, sf_dir):
    # winnowing is pure per-row array work: no exchange anywhere
    plan = _plan(spark, sf_dir, "text_winnow_fingerprints")
    assert "Exchange" not in plan


def test_winnow_pairs_bucket_join(spark, sf_dir):
    # MOSS matching joins the inverted fingerprint index on the hash
    # key — an equi join, never a nested loop over doc pairs
    plan = _plan(spark, sf_dir, "dedup_winnow_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_assoc_rules_no_sort_merge_join(spark, sf_dir):
    # pairs come from a per-basket double explode over the checkpointed
    # collect_set table, and the item-count sides broadcast — the old
    # order-keyed self-join (SortMergeJoin) must not reappear
    plan = _plan(spark, sf_dir, "mining_assoc_rules")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_shard_pack_two_level_scan(spark, sf_dir):
    # the exact prefix sum is the two-level scan: one UNPARTITIONED
    # window over the tiny block table and one window PARTITIONED by
    # block over the docs — never a single global sort of the corpus
    plan = _plan(spark, sf_dir, "etl_shard_pack")
    assert plan.count("Window") == 2
    assert "CartesianProduct" not in plan


def test_dup_span_single_fingerprint_shuffle(spark, sf_dir):
    # the cross-doc dup flag is a window over the fingerprint key: the
    # gram scan (one Generate) is derived once — the groupBy+join-back
    # formulation showed two Generates and re-ran the md5 pass per side
    plan = _plan(spark, sf_dir, "text_dup_span_coverage")
    assert plan.count("Generate") == 1


def test_boilerplate_single_trigram_derivation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_boilerplate_ngrams")
    assert plan.count("Generate") == 1  # trigram explode derived once


def test_embed_decontaminate_big_side_streams(spark, sf_dir):
    # eval slice broadcasts; the training side must NOT shuffle for the
    # scoring join (the only exchange is the per-vector argmax regroup)
    plan = _plan(spark, sf_dir, "embed_decontaminate_cosine")
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_correlated_scalar_decorrelates(spark, sf_dir):
    # two correlated scalar aggregates must rewrite to grouped
    # aggregates joined back on the correlation key — a per-row
    # re-scan would plan as a nested loop
    plan = _plan(spark, sf_dir, "sql_correlated_scalar")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2


def test_lateral_topk_plans_as_join(spark, sf_dir):
    # LATERAL with an equality correlation must become a join (+ the
    # per-key limit), never a per-outer-row subquery execution
    plan = _plan(spark, sf_dir, "sql_lateral_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hash_hint_plans_shuffled_hash_join(spark, sf_dir):
    # the SHUFFLE_HASH hint must survive planning (hints are advisory:
    # a typo'd hint silently falls back to sort-merge)
    plan = _plan(spark, sf_dir, "join_shuffle_hash_hint")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_merge_hint_overrides_broadcast(spark, sf_dir):
    # the MERGE hint must beat the planner's broadcast preference for
    # the small customer side — the inverse pin of the shuffle-hash
    # test (a no-op hint would silently leave BroadcastHashJoin)
    plan = _plan(spark, sf_dir, "join_merge_hinted")
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_bloom_prefilter_shape(spark, sf_dir):
    # the Bloom stage must stay pre-shuffle: one broadcast of the 1-row
    # dense bitmap (a trivial nested loop), the bit tests inline in the
    # scan stage's filter, and never a cartesian of real cardinality
    plan = _plan(spark, sf_dir, "join_bloom_prefilter")
    assert "CartesianProduct" not in plan
    assert plan.count("lineitem.parquet") == 1
    # the exact join that kills false positives is broadcast (dim small)
    assert "BroadcastHashJoin" in plan


def test_holt_linear_single_series_shuffle(spark, sf_dir):
    # the recursion folds per-row over a collected array: after the
    # (type, day) count shuffle and the per-type collect there must be
    # no further exchange and no window
    plan = _plan(spark, sf_dir, "ts_holt_linear")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("events.parquet") == 1
