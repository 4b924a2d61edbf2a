#!/usr/bin/env python
"""Scale-up smoke: replicate the sf0.1 documents corpus N× (doc_id
offset so rows stay distinct) into a temp dir and run the heavy
curation/similarity operators against it. Exists to answer "would this
plan survive a 10×/100× corpus" with a measurement instead of an
argument — broadcast blowups, driver collects, and quadratic candidate
streams all fail loudly here long before they'd fail a cluster.

Usage: python tools/scale_smoke.py [N_COPIES] (default 10 → 50k docs)
Not part of the pytest gate (minutes, not seconds).
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from openlmis_distributions_etl_spark import registry
from openlmis_distributions_etl_spark.session import get_spark

OPS = (
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_hamming_pairs",
    "winnowing_fingerprints",
    "token_countmin_topk",
    "dedup_components",
    "curation_pipeline",
    "doc_quality_filters",
    "multimodal_shard_plan",
    "bloom_prefilter_dedup",
    "source_quota_sample",
    "deterministic_shuffle",
    "shingle_overlap_pairs",
    "doc_simpson_diversity",
    # embedding-side (replicated embeddings; identical copies make the
    # near-dup PAIR count grow ~copies² per original vector — output-
    # driven growth by construction, what the smoke is checking is
    # that the PLAN stays bucket-local with no broadcast blowup)
    "pq_balanced_perm",
    "matryoshka_prefix_eval",
    "semantic_dup_lang_matrix",
    # round-4 wave: tokenizer training, chunking, drift stats (events)
    "bpe_merge_pairs",
    "doc_chunks",
    "dup_span_stats",
    "dup_span_removal",
    "doc_novelty_rate",
    "edit_distance_pairs",
    "pagerank_dup_graph",
    "ks_drift_value",
    "psi_value_drift",
    "chi2_event_segments",
    # round-5 wave: data-proportional prefix sums, exact selection,
    # KS grid, BPE training, star-CC histogram, covariance cells
    "global_row_index",
    "exact_median_value",
    "exact_quantiles_value",
    "exact_median_by_type",
    "ks_windowed",
    "psi_windowed",
    "bpe_vocab_32",
    "dup_cluster_stats",
    "embedding_covariance",
    # round-5 third wave: grouped ECDF deciles, TF-IDF pair join,
    # LSH k-NN graph, vocab-bounded PMI, in-row entropy
    "value_deciles_by_type",
    "tfidf_cosine_pairs",
    "knn_graph",
    "token_pmi_pairs",
    "doc_token_entropy",
    "twap_user_value",
    "cumulative_distinct_users",
    # round-5 fourth wave: robust stats (two grouped ECDF passes),
    # weighted simhash (token-dictionary join), basket affinity,
    # silhouette (literal-centroid hot path), AND search, dup graph
    # clustering coef, QQ grid, decontamination
    "event_value_mad_outliers",
    "winsorized_value_stats",
    "value_qq_table",
    "simhash_idf",
    "boolean_and_search",
    "session_type_affinity",
    "label_centroid_silhouette",
    "dup_graph_clustering_coef",
    "decontaminated_corpus_stats",
    "dup_rate_by_length",
    "classifier_score_calibration",
    "random_pair_cos_histogram",
    "daily_revenue_autocorr",
    "user_interarrival_stats",
    "decayed_user_value",
    "benford_first_digit",
    "daily_revenue_control_chart",
    "session_bounce_rate",
    "knn_lsh_ndcg",
    # round-5 waves 7-8: robust trim, attribution, sliding distinct,
    # rank-machinery concentration stats, tokenizer planning
    "trimmed_mean_by_type",
    "linear_touch_attribution",
    "rolling_7d_active_users",
    "customer_spend_gini",
    "doc_truncation_loss",
    "vocab_coverage_curve",
    # round-5 waves 11-12: ANN cascade, spectral audit, span/source
    # dup reports, Zipf audit
    "knn_int8_rerank",
    "pca_explained_variance",
    "top_repeated_spans",
    "source_cross_dup_matrix",
    "token_zipf_table",
    # round-5 waves 13-20: packing planner, sentence stats, splits,
    # banding sweep, binary pairs, purity, composed plan, LTV
    "packing_efficiency_by_ctx",
    "doc_sentence_stats",
    "leakage_safe_split",
    "split_leakage_audit",
    "lsh_band_sweep",
    "payload_simhash_pairs",
    "ivf_cluster_purity",
    "training_corpus_plan",
    "cohort_ltv_curve",
    "events_hourly_heatmap",
    "dup_graph_degree_hist",
    "token_budget_sample",
    # round-6: suffix-rank LRS, graph ANN, skyline, rank stats,
    # lifecycle, fertility, winnowing pairs, magic census
    "longest_repeated_substring",
    "beam_graph_edges",
    "knn_beam",
    "orders_skyline_2d",
    "mann_whitney_value_drift",
    "spearman_daily_rank_corr",
    "user_lifecycle_stages",
    "time_to_third_purchase",
    "tokenizer_fertility_by_lang",
    "winnowing_pair_candidates",
    "payload_magic_types",
    "late_delivery_root_cause",
    "supplier_part_price_spread",
    "events_anomaly_days",
    "user_active_day_streaks",
    "customer_spend_decile_profile",
    "pq_code_utilization",
    "cume_dist_value_probes",
    "monthly_status_mix",
    "audience_bitmap_intersection",
    "payload_cdc_dedup_stats",
    # round-7: corpus-LM scorers, Gopher battery, trend/stat family,
    # label cohesion, MMR serving, CDC pairs, FD audit, conformal
    "unigram_logprob_quality",
    "gopher_ngram_fractions",
    "gopher_quality_rules",
    "hapax_share_by_source",
    "dsir_importance_weights",
    "weighted_sample_docs",
    "theil_sen_daily_trend",
    "mann_kendall_trend",
    "welch_ttest_values",
    "poisson_bootstrap_ci",
    "purchase_gap_survival",
    "intra_inter_cosine_gap",
    "mmr_diversified_topk",
    "knn_beam_batch",
    "payload_chunk_overlap_pairs",
    "functional_dependency_audit",
    "ushape_attribution",
    "conformal_value_intervals",
    # round-8: the round-7 tail (VERDICT r7 task 4) — binary-lane CC
    # dedup, CCNet LM scoring + decision table, BQ cascade, harmonic
    # scan, b-bit minhash
    "payload_dedup_components",
    "ccnet_perplexity_buckets",
    "ccnet_sampling_plan",
    "knn_bq_rerank",
    "daily_revenue_periodogram",
    "bbit_minhash_estimate",
    "bq_cand_sweep",
    # round-9 (VERDICT r8 task 5): the store maintenance queries run
    # corpus-sized MERGE commits (rebased half-batches over the full
    # fact table) — the scale-relevant §D shapes; anisotropic PQ loss
    # is a corpus-sized residual-decomposition scan
    "store_value_quantiles",
    "store_token_topk",
    "store_audience_overlap",
    "store_heavy_hitters",
    "store_skyline",
    "store_lifecycle",
    "anisotropic_pq_loss",
    # round-9: value-grid IRLS, corpus-explode QL scoring, per-row
    # readability, k-center scans, brand-day demand fold, moment sums
    "huber_mean_value",
    "lm_dirichlet_scores",
    "doc_readability",
    "kcenter_greedy_coreset",
    "croston_part_demand",
    "jarque_bera_value",
)


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-smoke", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_src = src.count()
    tmp = tempfile.mkdtemp(prefix="scale_smoke_")
    big = None
    for i in range(n_copies):
        # offset ids and perturb text so replicas aren't pure exact
        # duplicates (which would make LSH trivially collapse them)
        part = src.select(
            (F.col("doc_id") + i * n_src).alias("doc_id"),
            F.when(F.lit(i) == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(f" variant{i}")))
            .alias("text"),
            "lang", "source", "n_chars")
        big = part if big is None else big.unionByName(part)
    big.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    total = spark.read.parquet(f"{tmp}/documents.parquet").count()
    print(f"corpus: {total} docs ({n_copies}x sf0.1) at {tmp}")

    esrc = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n_vec = esrc.count()
    ebig = None
    for i in range(n_copies):
        part = esrc.select((F.col("vec_id") + i * n_vec).alias("vec_id"),
                           "embedding", "label")
        ebig = part if ebig is None else ebig.unionByName(part)
    ebig.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    print(f"embeddings: {n_vec * n_copies} vectors")

    vsrc = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    n_ev = vsrc.count()
    vbig = None
    for i in range(n_copies):
        # jitter value per copy so the drift stats see a non-degenerate
        # (not purely replicated) distribution
        part = vsrc.select(
            (F.col("event_id") + i * n_ev).alias("event_id"), "ts",
            (F.col("user_id") + i * 1000).alias("user_id"),
            "event_type",
            (F.col("value") * (1.0 + i * 0.01)).alias("value"), "props")
        vbig = part if vbig is None else vbig.unionByName(part)
    vbig.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    print(f"events: {n_ev * n_copies} rows")

    osrc = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    n_or = osrc.count()
    obig = None
    for i in range(n_copies):
        # jitter totals per copy so revenue stats see a non-degenerate
        # distribution; dates unchanged (calendar-bounded key spaces)
        part = osrc.select(
            (F.col("o_orderkey") + i * n_or).alias("o_orderkey"),
            "o_custkey", "o_orderstatus",
            (F.col("o_totalprice") * (1.0 + i * 0.01))
            .alias("o_totalprice"),
            "o_orderdate", "o_orderpriority")
        obig = part if obig is None else obig.unionByName(part)
    obig.write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    print(f"orders: {n_or * n_copies} rows")

    lsrc = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    n_li = lsrc.count()
    lbig = None
    for i in range(n_copies):
        # keys offset in lockstep with orders so the FK join holds
        part = lsrc.select(
            (F.col("l_orderkey") + i * n_or).alias("l_orderkey"),
            "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            (F.col("l_extendedprice") * (1.0 + i * 0.01))
            .alias("l_extendedprice"),
            "l_discount", "l_tax", "l_returnflag", "l_linestatus",
            "l_shipdate")
        lbig = part if lbig is None else lbig.unionByName(part)
    lbig.write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
    print(f"lineitem: {n_li * n_copies} rows")

    # dimension tables copy through unreplicated: FKs in the scaled
    # fact tables still resolve (custkeys/suppkeys unchanged), and
    # dimension cardinality is not what the smoke stresses
    for dim in ("customer", "supplier", "part", "nation", "region"):
        (spark.read.parquet(f"/root/testdata/sf0.1/{dim}.parquet")
         .write.mode("overwrite").parquet(f"{tmp}/{dim}.parquet"))
    print("dimensions copied")

    qs = registry.queries()
    start_at = sys.argv[2] if len(sys.argv) > 2 else None
    todo = OPS[OPS.index(start_at):] if start_at else OPS
    for name in todo:
        t0 = time.perf_counter()
        out = qs[name](spark, tmp)
        out.write.format("noop").mode("overwrite").save()
        print(f"{time.perf_counter() - t0:8.2f}s  {name}")


if __name__ == "__main__":
    main()
