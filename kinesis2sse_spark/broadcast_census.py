"""Broadcast growth-class census — the mechanical allowlist behind
PERF.md's "no forced broadcast grows with scale factor" claim.

Every ``F.broadcast()`` call site in the package must be classified
here by how the broadcast relation's size grows as the corpus grows
(the round-9/10 audit classes). ``tests/test_broadcast_census.py``
AST-scans the package and fails on any call site missing from this
table — so a new hint cannot land unclassified — and on any stale
entry whose call site no longer exists, so the table cannot rot.

Growth classes (values of :data:`CENSUS`):

- ``constant`` — size independent of corpus scale by construction:
  1-row aggregates (totals, thresholds, min/max, resolved offsets),
  fixed-parameter tables (seed/centroid sets with fixed k, fixed-B
  hashed feature models, PQ codebooks, lag ranges, band ladders,
  replica indexes), fixed query/eval sets, and the constant TPC-H
  nation (25 rows) / region (5 rows) dims.
- ``domain-bounded`` — one row per distinct value of a bounded value
  domain (event types, languages, sources, length buckets, partition
  ids): grows with the domain, not the corpus.
- ``cluster-bounded`` — near-dup graph relations (node→source maps,
  degree aggregates, cluster labels): bounded by duplicate-cluster
  mass, not corpus size.
- ``sublinear`` — corpus-adaptive but sub-linear: the SemDeDup cell
  seed set grows as the power-of-4 ladder ~sqrt(n). Documented
  headroom required (the 8 GB broadcast ceiling check lives in the
  operator's docstring).
- ``operator-demo`` — the hint IS the operator under test:
  ``join_broadcast_inner`` is the §2.3 forced-broadcast-join surface,
  so the hint is semantically required; a user applies it to a dim
  they know is bounded.

Classes deliberately ABSENT: anything linear in the corpus
(customer/part/supplier dims, corpus-derived SCD2 histories, bigram
LM models) — those hints were removed in rounds 9-10 and must not
come back (locked per-query by tests/test_plans.py hint budgets and
globally here).
"""

from __future__ import annotations

import ast
import pathlib

GROWTH_CLASSES = frozenset(
    {"constant", "domain-bounded", "cluster-bounded", "sublinear", "operator-demo"}
)

# (module filename, enclosing function, broadcast-arg source) -> class.
# The arg source is ast.unparse of the first argument, so the key is
# stable under line-number churn but breaks (loudly) when the hinted
# relation itself changes — forcing a re-classification.
CENSUS: dict[tuple[str, str, str], str] = {
    # --- event pipeline / serving ---
    ("asof.py", "replay_since", "resolved"): "constant",  # 1-row resolved offset
    ("envelope.py", "retain_last", "hi"): "constant",  # 1-row max offset
    ("event_pipeline.py", "retention_max_age", "hi"): "constant",
    # --- statistics suite ---
    ("aggregates.py", "hist_equi_depth", "total"): "constant",
    ("aggregates.py", "stats_mutual_information", "mx"): "domain-bounded",
    ("aggregates.py", "stats_mutual_information", "my"): "domain-bounded",
    ("aggregates.py", "stats_mutual_information", "tot"): "constant",
    ("aggregates.py", "stats_ks_test", "tot"): "constant",
    ("aggregates.py", "stats_psi_drift", "bounds"): "constant",
    ("aggregates.py", "stats_psi_drift", "tot"): "constant",
    ("aggregates.py", "stats_cramers_v", "mx"): "domain-bounded",
    ("aggregates.py", "stats_cramers_v", "my"): "domain-bounded",
    ("aggregates.py", "stats_cramers_v", "tot"): "constant",
    ("aggregates.py", "stats_js_divergence", "tot"): "constant",
    ("aggregates.py", "stats_spearman_rank", "rank2('a')"): "domain-bounded",
    ("aggregates.py", "stats_spearman_rank", "rank2('b')"): "domain-bounded",
    ("aggregates.py", "stats_bootstrap_ci", "reps"): "constant",  # replica index
    ("aggregates.py", "stats_bootstrap_ci", "lo"): "constant",
    ("aggregates.py", "stats_bootstrap_ci", "hi"): "constant",
    ("aggregates.py", "stats_permutation_test", "reps"): "constant",
    ("aggregates.py", "stats_permutation_test", "obs"): "constant",
    ("aggregates.py", "stats_permutation_test", "od"): "constant",
    # the permutation p-value family (shared by stats_fdr_bh and
    # stats_holm_bonferroni since r12): B replicas, 1-row totals, and
    # the |hypotheses|-row label relation (event types + 2 controls)
    ("aggregates.py", "_perm_family_ranked", "tot"): "constant",  # aob's 1-row totals
    # (r13 opt round: reps became a codegen explode and tot is fused
    # into the one broadcast hypothesis relation — domain-bounded x
    # 1-row = domain-bounded)
    (
        "aggregates.py",
        "_perm_family_ranked",
        "li.select(F.col('hypothesis').alias('hyp_t'), 'li', 'n1').crossJoin(tot)",
    ): "domain-bounded",
    # association rules: per-type counts (domain-bounded) + 1-row total
    (
        "timeseries.py",
        "mine_association_pairs",
        "n1.select(F.col('event_type').alias('ante'), F.col('na').alias('n_ante'))",
    ): "constant",
    (
        "timeseries.py",
        "mine_association_pairs",
        "n1.select(F.col('event_type').alias('cons'), F.col('na').alias('n_cons'))",
    ): "constant",
    ("timeseries.py", "mine_association_pairs", "tot"): "constant",
    # Kruskal-Wallis: the 1-row totals/tie relation
    ("aggregates.py", "stats_kruskal_wallis", "tt"): "constant",
    # Brown-Forsythe: the k-row per-group median relation
    ("aggregates.py", "stats_brown_forsythe", "med"): "constant",
    # blocking census: 1-row aggregate relations
    ("graph.py", "er_blocking_union_recall", "ca"): "constant",
    ("graph.py", "er_blocking_union_recall", "cb"): "constant",
    ("graph.py", "er_blocking_union_recall", "cj"): "constant",
    # (er_pairwise_f1's nested per-scheme builder; 1-row aggregate)
    ("graph.py", "scheme_row", "pred"): "constant",
    # sweep/RBO shared machinery: IVF_K-row centroid table, the fixed
    # N_QUERIES query set, and the nprobe-bounded probe list
    ("llm_similarity.py", "_sweep_spark_parts", "cents"): "constant",
    ("llm_similarity.py", "_sweep_spark_parts", "queries"): "constant",
    ("llm_similarity.py", "ivf_topk", "probes"): "constant",
    ("graph.py", "er_blocking_quality", "cand"): "constant",
    ("graph.py", "er_blocking_quality", "cov"): "constant",
    # --- graph (near-dup cluster mass bounds everything) ---
    ("graph.py", "pagerank", "ncnt"): "constant",  # 1-row node count
    ("graph.py", "pipeline_split_by_cluster", "labels"): "cluster-bounded",
    (
        "graph.py",
        "graph_source_modularity",
        "nodesrc.select(F.col('node').alias('a'), F.col('source').alias('src_a'))",
    ): "cluster-bounded",
    (
        "graph.py",
        "graph_source_modularity",
        "nodesrc.select(F.col('node').alias('b'), F.col('source').alias('src_b'))",
    ): "cluster-bounded",
    ("graph.py", "graph_source_modularity", "deg"): "cluster-bounded",
    ("graph.py", "graph_source_modularity", "m"): "constant",  # 1-row edge total
    # --- joins / lakeops ---
    ("joins.py", "join_broadcast_inner", "part"): "operator-demo",
    ("lakeops.py", "stats_benford_deviation", "tot"): "constant",
    ("timeseries.py", "timeseries_anomaly_mad", "med"): "domain-bounded",
    ("timeseries.py", "timeseries_anomaly_mad", "mad"): "domain-bounded",
    # --- dedup ---
    ("llm_dedup.py", "dedup_cross_source_overlap", "ca"): "cluster-bounded",
    ("llm_dedup.py", "dedup_cross_source_overlap", "cb"): "cluster-bounded",
    ("llm_dedup.py", "dedup_semantic_clusters", "k"): "constant",  # 1-row count
    # power-of-4 cell ladder: |seeds| ~ sqrt(n); ~4 MB of 64-dim
    # doubles at 100 TB — well inside the ceiling
    ("llm_dedup.py", "dedup_semantic_clusters", "seeds"): "sublinear",
    # 1-row u-statistics relation (field-cardinality-bounded sums)
    ("llm_dedup.py", "er_fellegi_sunter", "stats"): "constant",
    # --- similarity search (fixed query sets, fixed-k models) ---
    ("llm_similarity.py", "sim_topk_bruteforce", "queries"): "constant",
    ("llm_similarity.py", "sim_topk_lsh", "probes"): "constant",
    ("llm_similarity.py", "_ivf_assign", "centroids"): "constant",  # IVF_K=16
    ("llm_similarity.py", "sim_topk_ivf", "centroids"): "constant",
    ("llm_similarity.py", "sim_topk_ivf", "probes"): "constant",
    ("llm_similarity.py", "sim_topk_ivf_prebuilt", "centroids"): "constant",
    # probes = queries x IVF_PROBES rows
    ("llm_similarity.py", "sim_topk_ivf_prebuilt", "probes"): "constant",
    ("llm_similarity.py", "sim_knn_classify", "queries"): "constant",
    ("llm_similarity.py", "ml_kmeans_assign", "seeds"): "constant",  # fixed k
    ("llm_similarity.py", "ml_kmeans_update", "seeds"): "constant",
    ("llm_similarity.py", "_pq_parts", "cbrow"): "constant",  # PQ codebook
    ("llm_similarity.py", "sim_topk_pq", "queries"): "constant",
    ("llm_similarity.py", "sim_topk_ivfpq", "centroids"): "constant",
    ("llm_similarity.py", "sim_topk_ivfpq", "probes"): "constant",
    ("llm_similarity.py", "sim_mmr_rerank", "queries"): "constant",
    # dense PRF: fixed query set, PRF_VEC_FB x N_QUERIES centroid sums,
    # expanded query vectors — all query-set-bounded
    ("llm_similarity.py", "sim_prf_vector", "queries"): "constant",
    ("llm_similarity.py", "sim_prf_vector", "cent"): "constant",
    ("llm_similarity.py", "sim_prf_vector", "q2"): "constant",
    ("llm_similarity.py", "sim_ivf_index_stats", "tot"): "constant",
    ("llm_similarity.py", "emb_pca_power_iteration", "s2"): "constant",  # d-bounded
    ("llm_similarity.py", "ml_kmeans_train", "cent"): "constant",
    ("llm_similarity.py", "ml_ridge_probe_train", "ncnt"): "constant",
    ("llm_similarity.py", "ml_ridge_probe_train", "diag"): "constant",  # d x d
    ("llm_similarity.py", "ml_ridge_probe_train", "b"): "constant",
    ("llm_similarity.py", "sim_range_search", "queries"): "constant",
    ("llm_similarity.py", "sim_matryoshka_recall", "queries"): "constant",
    ("llm_similarity.py", "sim_matryoshka_recall", "qd"): "constant",
    ("llm_similarity.py", "ml_logistic_probe_gd", "w_rel"): "constant",  # d-vector
    ("llm_similarity.py", "ml_logistic_probe_gd", "nn"): "constant",
    ("llm_similarity.py", "_int8_quantized", "stats"): "constant",  # 1-row
    ("llm_similarity.py", "sim_topk_int8", "queries"): "constant",
    (
        "llm_similarity.py",
        "_binary_topn",
        "stats.select(mids.alias('mid'))",
    ): "constant",
    ("llm_similarity.py", "_binary_topn", "queries"): "constant",
    ("llm_similarity.py", "mine_hard_negatives", "queries"): "constant",
    ("llm_similarity.py", "search_hybrid_rrf", "queries"): "constant",
    ("llm_similarity.py", "search_hybrid_rrf", "qtoks"): "constant",
    ("llm_similarity.py", "decontaminate_embedding", "evalset"): "constant",
    ("llm_similarity.py", "sim_topk_binary_rerank", "queries"): "constant",
    # LI_QUERIES rows x <= LI_QUERY_TOKENS token vectors each
    # qall = the fixed query set collapsed to ONE row (r13 opt round)
    ("llm_similarity.py", "search_maxsim_late_interaction", "qall"): "constant",
    # 1-row array of <= KCG_K selected centers
    # running-min k-center: the seed and each step's argmax are 1-row
    ("llm_similarity.py", "sample_kcenter_greedy", "seed"): "constant",
    ("llm_similarity.py", "sample_kcenter_greedy", "nxt"): "constant",
    # --- text pipeline ---
    ("llm_text.py", "text_tfidf_top_terms", "n"): "constant",  # 1-row N
    # 1-row each: distinct-vocab count and (n1pt, v) totals — the KN
    # model relations themselves (cab/ctx/cont) carry NO hint (Heaps'
    # law on bigram types; AQE keeps the size-based fallback)
    ("llm_text.py", "text_perplexity_kneser_ney", "vocab"): "constant",
    ("llm_text.py", "text_perplexity_kneser_ney", "totals"): "constant",
    ("llm_text.py", "pipeline_quantile_normalize", "nn"): "constant",  # 1-row
    ("llm_text.py", "pipeline_quantile_normalize", "tr"): "constant",  # Q rows
    # QN_LEVELS rows exactly
    ("llm_text.py", "pipeline_quantile_normalize", "grid"): "constant",
    # |sources| rows
    ("llm_text.py", "pipeline_quantile_normalize", "m"): "sublinear",
    # tf pre-filtered to BM25_QUERY_TERMS -> df bounded by |Q|
    ("llm_text.py", "text_bm25_search", "df"): "constant",
    ("llm_text.py", "text_bm25_search", "stats"): "constant",
    # --- Rocchio PRF: every relation bounded by |Q|, PRF_FB, or the
    # feedback docs' vocabulary (hundreds of rows however large the
    # corpus — feedback depth is fixed, doc length is capped) ---
    ("llm_text.py", "bm25_scores", "dfrel"): "constant",  # |terms| rows
    ("llm_text.py", "bm25_scores", "stats"): "constant",  # 1-row corpus stats
    ("llm_text.py", "search_prf_rocchio", "fb"): "constant",  # PRF_FB rows
    ("llm_text.py", "search_prf_rocchio", "cand_tf.select('term')"): "domain-bounded",
    ("llm_text.py", "search_prf_rocchio", "cand_df"): "domain-bounded",
    ("llm_text.py", "search_prf_rocchio", "stats"): "constant",
    ("llm_text.py", "search_prf_rocchio", "terms2"): "constant",  # |Q|+PRF_EXP rows
    # Neyman allocation: 1-row weight total / seat shortfall
    ("llm_text.py", "sample_neyman_allocation", "t"): "constant",
    ("llm_text.py", "sample_neyman_allocation", "short"): "constant",
    ("llm_text.py", "decontaminate_ngram", "bench_sh"): "constant",  # eval-bounded
    ("llm_text.py", "decontaminate_minhash", "bench"): "constant",  # eval-bounded x BANDS
    ("llm_text.py", "select_token_budget", "offsets"): "domain-bounded",
    ("llm_text.py", "pipeline_sequence_packing", "offsets"): "domain-bounded",
    ("llm_text.py", "mix_domain_weights", "tot"): "constant",
    ("llm_text.py", "filter_quality_percentile", "p"): "constant",  # 1-row pct
    ("llm_text.py", "pipeline_negative_sampling", "n"): "constant",
    ("llm_text.py", "text_cooccurrence_pmi", "totals"): "constant",
    ("llm_text.py", "text_perplexity_bigram", "vocab"): "constant",  # 1-row |V|
    ("llm_text.py", "filter_perplexity_band", "off"): "constant",  # band offsets
    ("llm_text.py", "filter_perplexity_band", "total"): "constant",
    ("llm_text.py", "filter_perplexity_band", "bands"): "constant",
    ("llm_text.py", "filter_dsir_resample", "tt"): "constant",  # 1-row totals
    ("llm_text.py", "filter_dsir_resample", "st"): "constant",
    ("llm_text.py", "filter_dsir_resample", "model"): "constant",  # fixed-B buckets
    ("llm_text.py", "pipeline_curriculum_order", "total"): "constant",
    ("llm_text.py", "pipeline_curriculum_order", "bands"): "constant",
    # candidate set bounded by 1/support-threshold
    ("llm_text.py", "text_heavy_hitters", "candidates"): "constant",
    # CMS sketch relation: DEPTH x WIDTH cells by construction
    ("llm_text.py", "text_count_min_sketch", "sketch"): "constant",
    # Bloom bit array: <= BLOOM_BITS rows by construction
    (
        "llm_text.py",
        "text_bloom_filter",
        "bloom.withColumn('hit', F.lit(1))",
    ): "constant",
    ("llm_text.py", "text_heavy_hitters", "total"): "constant",
    ("llm_text.py", "text_vocab_entropy", "tot"): "domain-bounded",  # per-language
    ("llm_text.py", "text_zipf_slope", "sums"): "constant",
    ("llm_text.py", "sample_temperature_mix", "tot"): "domain-bounded",  # per-source
    ("llm_text.py", "sample_temperature_mix", "norm"): "constant",
    ("llm_text.py", "pipeline_length_bucket_batching", "tot"): "constant",
    ("llm_text.py", "sample_unimax_budget", "tot"): "domain-bounded",  # per-language
    ("llm_text.py", "sample_unimax_budget", "caps"): "domain-bounded",
    # --- model eval ---
    ("ml_eval.py", "_with_prefix_counts", "off"): "domain-bounded",  # per-partition
    ("ml_eval.py", "ml_calibration_bins", "mm"): "constant",  # 1-row minmax
    ("ml_eval.py", "ml_brier_ece", "mm"): "constant",
    ("ml_eval.py", "ml_isotonic_calibration", "mm"): "constant",  # 1-row minmax
    # MMD drift: 2-row group sizes, MMD_REPLICAS+1 replica ids, 2-row
    # observed stats — all literal-bounded
    ("ml_eval.py", "stats_mmd_embedding_drift", "sizes"): "constant",
    ("ml_eval.py", "stats_mmd_embedding_drift", "reps"): "constant",
    ("ml_eval.py", "stats_mmd_embedding_drift", "obs"): "constant",
    ("ml_eval.py", "ml_threshold_sweep_youden", "tot"): "constant",  # 1-row totals
    ("ml_eval.py", "ml_average_precision", "tot"): "constant",  # 1-row P
    # AUC bootstrap: replica index / 1-row CI endpoints
    ("ml_eval.py", "ml_auc_bootstrap_ci", "reps"): "constant",
    # 1-row global aggregate (r12: replaced the lo/hi rank filters so
    # the point row survives replica-starved fixtures with NULL bounds)
    ("ml_eval.py", "ml_auc_bootstrap_ci", "bounds"): "constant",
    # graded nDCG: IR_QUERIES-row query set and the 10-row label
    # histogram, broadcast once (exact) + twice (adjacent-shifted)
    ("ml_eval.py", "ir_eval_ndcg_graded", "queries"): "constant",
    ("ml_eval.py", "ir_eval_ndcg_graded", "lc"): "constant",
    (
        "ml_eval.py",
        "ir_eval_ndcg_graded",
        "adj.selectExpr('clabel AS lo_l', 'acnt AS lo_c')",
    ): "constant",
    (
        "ml_eval.py",
        "ir_eval_ndcg_graded",
        "adj.selectExpr('clabel AS hi_l', 'acnt AS hi_c')",
    ): "constant",
    # jackknife: 1-row totals / replicate mean / deviation sum
    ("aggregates.py", "stats_jackknife_variance", "tot"): "constant",
    ("aggregates.py", "stats_jackknife_variance", "mbar"): "constant",
    ("aggregates.py", "stats_jackknife_variance", "dev"): "constant",
    # agreement suite: per-category totals (4 fixed value bands)
    ("aggregates.py", "stats_krippendorff_alpha", "nc"): "domain-bounded",
    ("aggregates.py", "stats_fleiss_kappa", "nc"): "domain-bounded",
    ("aggregates.py", "stats_gwet_ac1", "mom"): "constant",  # 1-row moments
    ("aggregates.py", "stats_gwet_ac1", "pe"): "constant",  # 1-row chance term
    # block-design tests: 1-row treatment-count / moment folds
    ("aggregates.py", "stats_friedman", "kk"): "constant",
    ("aggregates.py", "stats_friedman", "mom"): "constant",
    ("aggregates.py", "stats_srm_check", "ea"): "constant",  # 1-row arm sums
    ("aggregates.py", "stats_cvm_two_sample", "nm"): "constant",  # 1-row n/m
    # Dunn: k-row group relation, 1-row tie moment, 1-row k
    ("aggregates.py", "stats_dunn_posthoc", "b"): "domain-bounded",
    ("aggregates.py", "stats_dunn_posthoc", "tt"): "constant",
    ("aggregates.py", "stats_dunn_posthoc", "kk"): "constant",
    ("aggregates.py", "stats_cochran_q", "kk"): "constant",
    (
        "aggregates.py",
        "stats_cochran_q",
        "ru.agg(F.sum(F.col('r') * F.col('r')).cast('bigint').alias('sr2'), "
        "F.count('*').cast('bigint').alias('n'))",
    ): "constant",  # 1-row row-total moments
    # mode: per-type totals (event-type domain)
    ("aggregates.py", "agg_mode", "t"): "domain-bounded",
    # Platt: 1-row class counts / per-step params / per-step moment fold
    ("ml_eval.py", "ml_platt_scaling", "nn"): "constant",
    ("ml_eval.py", "ml_platt_scaling", "params"): "constant",
    ("ml_eval.py", "ml_platt_scaling", "gsum"): "constant",
    ("ml_eval.py", "ml_ks_separation", "tot"): "constant",  # 1-row class totals
    # cosine histogram: 1-row corpus count, 1-row pair total
    ("llm_similarity.py", "emb_cosine_histogram", "n"): "constant",
    ("llm_similarity.py", "emb_cosine_histogram", "tot"): "constant",
    # class-balance cap: 1-row minority count
    ("llm_text.py", "sample_class_balance", "cap"): "constant",
    # naive Bayes: per-lang totals (language domain), 1-row vocab size /
    # doc total, lang-row prior/default table
    ("llm_text.py", "_nb_spark_model", "tl"): "domain-bounded",
    ("llm_text.py", "_nb_spark_model", "vv"): "constant",
    ("llm_text.py", "ml_naive_bayes_confusion", "dd"): "constant",
    ("llm_text.py", "ml_naive_bayes_confusion", "vv"): "constant",
    ("llm_text.py", "ml_naive_bayes_confusion", "cls_arr"): "domain-bounded",
    # Heaps: 1-row id bounds, 1-row final totals
    ("llm_text.py", "text_heaps_law", "b"): "constant",
    ("llm_text.py", "text_heaps_law", "tots"): "constant",
    # survival / stump: duration-domain hazard table, 1-row score total
    ("ml_eval.py", "ml_kaplan_meier", "h"): "domain-bounded",
    ("ml_eval.py", "ml_decision_stump", "tot"): "constant",
    # DP quantile: 101-cell lattice counts, 1-row total
    ("privacy.py", "privacy_dp_quantile", "cells"): "constant",
    ("privacy.py", "privacy_dp_quantile", "n1"): "constant",
    # daily-series suite: 1-row day bounds / per-type moment tables
    ("timeseries.py", "timeseries_cross_correlation", "bounds"): "constant",
    ("timeseries.py", "timeseries_permutation_entropy", "bounds"): "constant",
    ("timeseries.py", "timeseries_permutation_entropy", "tot"): "domain-bounded",
    ("timeseries.py", "timeseries_sax", "bounds"): "constant",
    ("timeseries.py", "timeseries_sax", "mom"): "domain-bounded",
    ("timeseries.py", "timeseries_peak_detection", "bounds"): "constant",
    ("timeseries.py", "timeseries_granger_lead", "bounds"): "constant",
    ("timeseries.py", "timeseries_page_hinkley", "bounds"): "constant",
    # --- privacy: t-closeness grid sides — sensitive-bucket relation
    # (bounded by max doc length / SENSITIVE_BUCKET) and 1-row totals
    ("privacy.py", "privacy_t_closeness", "buckets"): "domain-bounded",
    ("privacy.py", "privacy_t_closeness", "glob"): "domain-bounded",
    ("privacy.py", "privacy_t_closeness", "gt"): "constant",
    ("privacy.py", "privacy_t_closeness", "nb"): "constant",
    ("ml_eval.py", "_ir_ranked", "queries"): "constant",
    ("ml_eval.py", "_with_nrel", "lc"): "constant",  # per-query label counts
    ("ml_eval.py", "ml_feature_drift", "tot"): "constant",
    ("ml_eval.py", "ml_lift_pr_deciles", "tot"): "constant",
    # --- time series ---
    ("timeseries.py", "zscore_anomalies", "stats"): "domain-bounded",  # |types|
    ("timeseries.py", "sessions_max_concurrency", "offsets"): "domain-bounded",
    ("timeseries.py", "pipeline_winsorize", "p"): "constant",
    (
        "timeseries.py",
        "stats_autocorrelation",
        "ev.sparkSession.range(1, ACF_MAX_LAG + 1).select(F.col('id').cast('bigint').alias('lag'))",
    ): "constant",
    ("timeseries.py", "timeseries_cusum_changepoint", "tot"): "constant",
    ("timeseries.py", "timeseries_seasonal_decompose", "seasonal"): "constant",  # 7-row
    (
        "timeseries.py",
        "timeseries_pacf",
        "ev.sparkSession.range(1, PACF_MAX_LAG + 1).select(F.col('id').cast('bigint').alias('lag'))",
    ): "constant",
    ("timeseries.py", "timeseries_pacf", "tot"): "constant",
    ("timeseries.py", "timeseries_theil_sen", "med"): "constant",
    # --- TPC-H: only the constant dims survive the round-10 sweep ---
    ("tpch.py", "q5_local_supplier_volume", "n"): "constant",  # nation, 25 rows
    ("tpch.py", "q5_local_supplier_volume", "r"): "constant",  # region, 5 rows
    ("tpch.py", "q10_returned_items", "n"): "constant",
    ("tpch.py", "q7_volume_shipping", "n1"): "constant",
    ("tpch.py", "q7_volume_shipping", "n2"): "constant",
    ("tpch.py", "q8_market_share", "n1"): "constant",
    ("tpch.py", "q8_market_share", "r"): "constant",
    ("tpch.py", "q8_market_share", "n2"): "constant",
    ("tpch.py", "q9_product_type_profit", "n"): "constant",
    ("tpch.py", "q22_global_sales_opportunity", "thresh"): "constant",  # 1-row
    ("tpch.py", "q2_min_cost_supplier", "n"): "constant",
    ("tpch.py", "q2_min_cost_supplier", "r"): "constant",
    ("tpch.py", "q20_potential_promotion", "n"): "constant",
}

_PKG_ROOT = pathlib.Path(__file__).resolve().parent


def scan_broadcast_sites(root: pathlib.Path | None = None):
    """AST-scan every .py file under the package for ``*.broadcast(x)``
    / ``broadcast(x)`` calls; yield (filename, enclosing_function,
    arg_source) keys matching :data:`CENSUS`'s shape."""
    sites: list[tuple[str, str, str]] = []
    for p in sorted((root or _PKG_ROOT).rglob("*.py")):
        tree = ast.parse(p.read_text())

        class _V(ast.NodeVisitor):
            def __init__(self) -> None:
                self.stack: list[str] = []

            def visit_FunctionDef(self, n):  # noqa: N802
                self.stack.append(n.name)
                self.generic_visit(n)
                self.stack.pop()

            visit_AsyncFunctionDef = visit_FunctionDef

            def visit_Call(self, n):  # noqa: N802
                f = n.func
                name = (
                    f.attr
                    if isinstance(f, ast.Attribute)
                    else (f.id if isinstance(f, ast.Name) else None)
                )
                if name == "broadcast" and n.args:
                    sites.append(
                        (p.name, self.stack[-1] if self.stack else "<module>",
                         ast.unparse(n.args[0]))
                    )
                self.generic_visit(n)

        _V().visit(tree)
    return sites


def unclassified(sites=None) -> list[tuple[str, str, str]]:
    """Call sites present in the package but missing from CENSUS."""
    return [s for s in (scan_broadcast_sites() if sites is None else sites)
            if s not in CENSUS]


def stale_entries(sites=None) -> list[tuple[str, str, str]]:
    """CENSUS entries whose call site no longer exists (allowlist rot)."""
    live = set(scan_broadcast_sites() if sites is None else sites)
    return [k for k in CENSUS if k not in live]


def census_table() -> str:
    """Markdown census table generated from the allowlist (the artifact
    PERF.md points at; regenerate via tools/broadcast_census_table.py)."""
    by_class: dict[str, list[tuple[str, str, str]]] = {}
    for key, cls in sorted(CENSUS.items()):
        by_class.setdefault(cls, []).append(key)
    lines = [
        "# Forced-broadcast growth-class census",
        "",
        f"{len(CENSUS)} classified `F.broadcast()` call sites; no class grows",
        "linearly with the corpus (generated from",
        "`kinesis2sse_spark/broadcast_census.py`, enforced by",
        "`tests/test_broadcast_census.py`).",
        "",
        "| class | sites |",
        "|---|---|",
    ]
    for cls in sorted(by_class):
        lines.append(f"| {cls} | {len(by_class[cls])} |")
    lines += ["", "| module | function | relation | class |", "|---|---|---|---|"]
    for (mod, fn, arg), cls in sorted(CENSUS.items()):
        arg_short = arg if len(arg) <= 48 else arg[:45] + "..."
        lines.append(f"| {mod} | {fn} | `{arg_short}` | {cls} |")
    return "\n".join(lines) + "\n"
