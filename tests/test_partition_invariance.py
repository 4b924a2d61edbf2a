"""Partition-order invariance: the repo's float-determinism claims
(block folds, quantized terms, exact decimal moments) mean every
query's VALUES are identical under different shuffle partitioning —
not merely close. This battery re-runs the float-sensitive operators
with spark.sql.shuffle.partitions flipped between a prime and the
default and asserts collected results are exactly equal."""

from __future__ import annotations

import pytest

from tests.conftest import SF0001

from openlmis_distributions_etl_spark import registry

# operators whose outputs contain floats produced by the repo's
# determinism machinery (order-canonical folds, quantized terms,
# exact decimal moments) — the ones a partition change would expose
FLOAT_SENSITIVE = (
    "label_centroids",
    "embedding_dim_stats",
    "label_centroid_silhouette",
    "bm25_scores",
    "doc_token_entropy",
    "user_behavior_entropy",
    "benford_chi2_by_priority",
    "daily_revenue_autocorr",
    "event_value_mad_outliers",
    "tfidf_cosine_pairs",
    "knn_lsh_ndcg",
    "twap_user_value",
    # round-5 waves 7-15 float-bearing additions
    "trimmed_mean_by_type",
    "customer_spend_gini",
    "discount_quantity_corr_by_brand",
    "nation_supplier_hhi",
    "knn_int8_rerank",
    "vocab_coverage_curve",
    # round-6 float-bearing additions
    "mann_whitney_value_drift",
    "spearman_daily_rank_corr",
    "knn_beam",
    "knn_beam_ndcg",
    # round-7 batch beam (same cosine chain, batch-keyed)
    "knn_beam_batch",
    "knn_beam_batch_recall",
    "tokenizer_fertility_by_lang",
    "customer_spend_decile_profile",
    "payload_cdc_dedup_stats",
    "embedding_outliers_diag",
    # round-7 wave 1: quantized corpus-LM NLL, broadcast pair-cloud
    # trend tests, integer-quantized label-cohesion sums
    "unigram_logprob_quality",
    "gopher_ngram_fractions",
    "theil_sen_daily_trend",
    "mann_kendall_trend",
    "intra_inter_cosine_gap",
    # round-7 wave 2: MMR cosine chain, bootstrap replicate means,
    # DSIR quantized log-ratio sums
    "mmr_diversified_topk",
    "poisson_bootstrap_ci",
    "dsir_importance_weights",
    # round-7 wave 3: moment-chain t-test, ln-quantized A-ES keys,
    # in-row KM survival fold
    "welch_ttest_values",
    "weighted_sample_docs",
    "purchase_gap_survival",
    # round-7 wave 4: containment ratios, g3 error
    "payload_chunk_overlap_pairs",
    "functional_dependency_audit",
    # round-7 wave 5: gridded means, rank-exact conformal quantile
    "conformal_value_intervals",
    # round-7 waves 6-12: doubled-rank H fold, integer-ppb BH keys,
    # in-row chi2 folds, BQ cascade cosine, pico-nat JSD terms,
    # micro-unit trig sums, ppb-gridded JL ratios
    "kruskal_wallis_values",
    "segment_pvalues_fdr",
    "cramers_v_audit",
    "knn_bq_rerank",
    "knn_bq_recall",
    # round-8: BQ candidate-depth sweep (same cosine/recall chain)
    "bq_cand_sweep",
    "ccnet_perplexity_buckets",
    "token_js_drift",
    "weighted_price_median_by_flag",
    "ols_daily_trend",
    "daily_revenue_periodogram",
    "jl_projection_distortion",
    # round-8: the remaining round-7 float-bearing tail (VERDICT r7
    # task 5) — quantized-term sums, in-row folds, ratio chains
    "heaps_law_fit",
    "lm_heldout_perplexity",
    "embedding_dim_psi",
    "anova_f_values",
    "brown_forsythe_variance_test",
    "gopher_quality_rules",
    "hapax_share_by_source",
    "zipf_slope_topk",
    "doc_ttr_profile",
    "time_decay_attribution",
    "ushape_attribution",
    "user_retention_curve",
    "centroid_drift",
    # round-8 wave: sequential folds, tail index, PQ loss audit
    "holt_winters_daily_forecast",
    "page_hinkley_drift",
    "hill_tail_index",
    "anisotropic_pq_loss",
    "seasonal_decompose_daily",
    "ewma_control_chart",
    # round-9 wave 1: SPC / normality / portmanteau statistics
    "cusum_daily_revenue",
    "runs_test_daily",
    "grubbs_daily_outlier",
    "ljung_box_daily",
    "jarque_bera_value",
    "bartlett_variance_test",
    # round-9 wave 2: IRLS fixpoint, Croston fold, Neyman shares, MI
    "huber_mean_value",
    "croston_part_demand",
    "neyman_allocation_plan",
    "type_hour_mutual_info",
    # round-9 wave 3: ratio chains, pico-nat QL sums, greedy k-center
    "doc_readability",
    "lm_dirichlet_scores",
    "kcenter_greedy_coreset",
    "isotonic_calibration",
    # round-9 wave 4: DL prefix folds, rank changepoint, turning z
    "pacf_daily_revenue",
    "pettitt_changepoint",
    "turning_point_test",
    # round-9 wave 5: rank-sum AUC, threshold curve, kappa
    "classifier_auc",
    "classifier_pr_table",
    "langid_kappa",
    # round-9 wave 6: pooled z, log-rank folds, MCC, EVT moments
    "ab_conversion_ztest",
    "logrank_purchase_gap",
    "classifier_mcc",
    "gumbel_block_maxima",
)


def _rows(spark, name):
    df = registry.queries()[name](spark, SF0001)
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", FLOAT_SENSITIVE)
def test_partition_invariant(spark, name):
    key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(key)
    try:
        spark.conf.set(key, "7")
        a = _rows(spark, name)
        spark.conf.set(key, saved)
        b = _rows(spark, name)
    finally:
        spark.conf.set(key, saved)
    assert a == b, f"{name}: results differ across shuffle partitioning"
