#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for the headline queries,
so the scan-pushdown/broadcast/codegen structure is reviewable without
running Spark."""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis2sse_spark.registry import all_queries
from kinesis2sse_spark.session import build_session

SHOW = [
    "q1_pricing_summary",
    "asof_replay",
    "join_broadcast_inner",
    "q5_local_supplier_volume",
    "join_asof",
    "topk_per_group",
    "dedup_ngram_jaccard",
    "sim_topk_bruteforce",
    "q6_forecast_revenue",
    "q8_market_share",
    "q19_discounted_revenue",
    "q2_min_cost_supplier",
    "q20_potential_promotion",
    "ml_kmeans_assign",
    "ingest_envelope_pipeline",
    "kpl_deaggregate",
    "sim_topk_lsh",
    "pipeline_sequence_packing",
    "dedup_span_fraction",
    "emb_quantize_int8",
    # round-5 lake/ingest additions
    "stats_column_profile",
    "stats_key_skew",
    "layout_zorder",
    "pipeline_upsert_snapshot",
    "classify_quality_linear",
    "ingest_reject_channel",
    "dedup_incremental_probe",
    "pipeline_snapshot_diff",
    "pipeline_scd2_intervals",
    # round-11 additions
    "search_prf_rocchio",
    "ml_isotonic_calibration",
    "stats_mmd_embedding_drift",
    "ml_threshold_sweep_youden",
    "join_asof_nearest",
    "privacy_t_closeness",
    "pipeline_split_leakage",
    "text_bpe_pair_counts",
    "sample_weighted_pps",
    # round-13 additions
    "ml_naive_bayes_confusion",
    "timeseries_granger_lead",
    "stats_cvm_two_sample",
    "text_heaps_law",
    "emb_cosine_histogram",
    "timeseries_ewma",
    "funnel_conversion",
    "retention_cohort",
    # round-12 additions
    "graph_hits_prebuilt",
    "text_rake_keywords",
    "ir_eval_ndcg_graded",
    "privacy_dp_mean",
    "stats_kruskal_wallis",
    "er_blocking_quality",
    "path_common_sequences",
    "stats_dq_report",
    "sim_topk_pq",
    "sim_topk_ivfpq",
    # round-5 (cont.): analytics/graph/retrieval additions
    "timeseries_interpolate",
    "timeseries_rollup_hierarchy",
    "timeseries_anomaly_zscore",
    "graph_triangle_count",
    "graph_pagerank",
    "text_bm25_search",
    "er_sorted_neighborhood",
    "join_scd2_point_in_time",
    "pipeline_negative_sampling",
    "hist_equi_depth",
    "streaming_anomaly_alert",
    "emb_gram_matrix",
    "text_cooccurrence_pmi",
    "pipeline_bpe_encode",
    "window_rolling_median",
    "mm_image_patches",
    "stats_mutual_information",
    "join_asof_tolerance",
    "stats_ks_test",
    "sessions_max_concurrency",
    "dedup_span_removal",
    "pipeline_split_by_cluster",
    "text_heavy_hitters",
    "pipeline_winsorize",
    "stats_autocorrelation",
    "stats_psi_drift",
    "stats_dataset_card",
    "text_perplexity_bigram",
    "sim_mmr_rerank",
    "dedup_select_canonical",
    "stats_cramers_v",
    "pipeline_curriculum_order",
    # round-6 additions
    "stats_js_divergence",
    "dedup_ngram_novelty",
    "graph_label_propagation",
    "pipeline_shard_assignment",
    "text_vocab_entropy",
    "text_zipf_slope",
    "sim_topk_ivf",
    "mm_video_scene_cuts",
    "timeseries_cusum_changepoint",
    "stats_benford_deviation",
    "sim_ivf_index_stats",
    "dedup_cluster_histogram",
    "sample_temperature_mix",
    # round-7 additions
    "text_readability",
    "classify_toxicity_lexicon",
    "text_boilerplate_fraction",
    "timeseries_seasonal_decompose",
    "timeseries_holt_linear",
    "dedup_cross_source_overlap",
    "pipeline_incremental_agg",
    "stats_spearman_rank",
    "stats_gini_concentration",
    "emb_pca_power_iteration",
    "ml_kmeans_train",
    "ml_ridge_probe_train",
    "ml_auc_roc",
    "ml_calibration_bins",
    "ml_auc_by_slice",
    "ir_eval_retrieval",
    "pipeline_context_chunks",
    "ml_feature_drift",
    "mm_dedup_binary",
    "ml_lift_pr_deciles",
    "stats_bootstrap_ci",
    "timeseries_pacf",
    "timeseries_theil_sen",
    "text_tokenizer_fertility",
    "stats_permutation_test",
    "sim_range_search",
    "ir_eval_average_precision",
    "stats_mann_whitney",
    "pipeline_length_bucket_batching",
    # round-8 additions
    "dedup_semantic_clusters",
    "filter_perplexity_band",
    "text_lexical_diversity",
    "sim_matryoshka_recall",
    "graph_source_modularity",
    "ml_logistic_probe_gd",
    # round-9 additions
    "filter_dsir_resample",
    "sim_topk_int8",
    "sim_topk_binary",
    "sim_topk_binary_rerank",
    "filter_gopher_rules",
    "dedup_soft_weights",
    "mine_hard_negatives",
    "search_hybrid_rrf",
    "decontaminate_embedding",
    # round-10 additions: the IVF lifecycle (the prebuilt probe's plan
    # is the round's headline — no embeddings scan, DPP on the index)
    "sim_ivf_index_build",
    "sim_topk_ivf_prebuilt",
    "sim_ivf_index_append",
    # round-10 (late) additions: MaxSim's single-scan fused double
    # loop, the prefix-filter join's candidate-bounded verification,
    # the sharded-kNN link-prediction pipeline, the one-shuffle
    # generalization ladder, and the KN model joins (AQE-picked, no
    # corpus-growing hints)
    "search_maxsim_late_interaction",
    "dedup_jaccard_prefix_filter",
    "graph_link_prediction",
    "privacy_generalization_ladder",
    "text_perplexity_kneser_ney",
    "sample_kcenter_greedy",
    "pipeline_changelog_compaction",
    "stats_fdr_bh",
]


def main() -> None:
    spark = build_session(app_name="dump_plans", shuffle_partitions=32)
    # static plans are clearer without the AQE wrapper
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = all_queries()
    out = io.StringIO()
    out.write(
        "# PLANS — physical plans of the headline queries (sf0.1, AQE off "
        "for readability)\n\nRegenerate with `python tools/dump_plans.py`. "
        "What to look for: `PushedFilters`/pruned `ReadSchema` on scans, "
        "`BroadcastHashJoin` for dims, partial→final `HashAggregate` pairs, "
        "`WindowGroupLimit` under top-k, `*(n)` whole-stage-codegen spans.\n"
    )
    for name in SHOW:
        df = qs[name](spark, "/root/testdata/sf0.1")
        plan = df._jdf.queryExecution().executedPlan().toString()
        out.write(f"\n## {name}\n\n```\n{plan}\n```\n")
        # query builders are no longer lazy: pin_cache runs an eager
        # count() at construction time, so without this each dumped
        # query leaves MEMORY_AND_DISK relations pinned for the session
        spark.catalog.clearCache()
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write(out.getvalue())
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
