#!/usr/bin/env python
"""Regenerate docs/PLANS.md — formatted physical plans for the
flagship queries at sf0.001 with AQE off (stable, shows codegen
spans). Run from the repo root: python docs/gen_plans.py"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FLAGSHIPS = (
    "q1_pricing_summary",
    "q5_regional_volume",
    "star_denormalize",
    "sessionize_events",
    "minhash_lsh_pairs",
    "knn_ivf",
    "simhash64",
    "ngram_jaccard_pairs",
    "kmeans_centroids",
    "pq_codes",
    "bloom_prefilter_dedup",
    "source_quota_sample",
    "knn_ivf_pq",
    "rfm_segments",
    "deterministic_shuffle",
    "pq_balanced_perm",
    "doc_simpson_diversity",
    "join_key_skew_audit",
    "ks_drift_value",
    "psi_value_drift",
    "dup_span_stats",
    "bpe_merge_pairs",
    "doc_chunks",
    "event_value_mad_outliers",
    "simhash_idf",
    "peak_concurrent_sessions",
    "session_type_affinity",
    "dup_graph_clustering_coef",
    "revenue_changepoint",
    # round-5 final waves
    "customer_spend_gini",
    "knn_int8_rerank",
    "trimmed_mean_by_type",
    "leakage_safe_split",
    "training_corpus_plan",
    # round-6 flagships
    "longest_repeated_substring",
    "beam_graph_edges",
    "knn_beam",
    "orders_skyline_2d",
    "mann_whitney_value_drift",
    "customer_spend_decile_profile",
    "embedding_outliers_diag",
    "token_budget_sample",
    "lsh_band_sweep",
    "rolling_7d_active_users",
    # round-7 flagships
    "unigram_logprob_quality",
    "intra_inter_cosine_gap",
    "mmr_diversified_topk",
    "dsir_importance_weights",
    "theil_sen_daily_trend",
    "purchase_gap_survival",
    "poisson_bootstrap_ci",
    # round-7 waves 6-19 flagships
    "kruskal_wallis_values",
    "knn_bq_rerank",
    "ccnet_perplexity_buckets",
    "token_js_drift",
    "weighted_price_median_by_flag",
    "daily_revenue_periodogram",
    "jl_projection_distortion",
    "payload_dedup_components",
    "lm_heldout_perplexity",
    "bbit_minhash_estimate",
    "embedding_dim_psi",
    "time_decay_attribution",
)


def main() -> None:
    from pyspark.sql import SparkSession

    from openlmis_distributions_etl_spark import registry

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "false")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    out = ["# Physical plans (flagship queries, sf0.001, AQE off to "
           "show codegen spans)", "",
           "Regenerate with `python docs/gen_plans.py`; plan-shape",
           "invariants are enforced by tests/test_plan_shapes.py.", ""]
    for name in FLAGSHIPS:
        buf = io.StringIO()
        with redirect_stdout(buf):
            qs[name](spark, "/root/testdata/sf0.001").explain("formatted")
        out += [f"## {name}", "", "```", buf.getvalue().rstrip(), "```", ""]
    Path(__file__).with_name("PLANS.md").write_text("\n".join(out))
    print(f"wrote {len(FLAGSHIPS)} plans")


if __name__ == "__main__":
    main()
