#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec}, "sf": ...}. Each query is forced with
the noop sink (full execution, no driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from openlmis_distributions_etl_spark import registry
from openlmis_distributions_etl_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_volume",
    "q6_forecast_revenue",
    "star_denormalize",
    "monthly_sales_rollup",
    "sessionize_events",
    "latest_event_per_user",
    "windowed_event_counts",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash64",
    "curation_pipeline",
    "q21_sole_late_supplier",
    "knn_lsh",
    "doc_quality_score",
    "knn_bruteforce",
    "embedding_near_dup_pairs",
    "multimodal_features",
    # round-4 showcases
    "bloom_prefilter_dedup",
    "source_quota_sample",
    "deterministic_shuffle",
    "doc_simpson_diversity",
    "abc_classification",
    "ks_drift_value",
    "bpe_merge_pairs",
    "doc_chunks",
    "dup_span_stats",
    "psi_windowed",
    # round-5 showcases: graph/fuzzy tail + exact selection + KS grid
    "pagerank_dup_graph",
    "edit_distance_pairs",
    "triangle_counts",
    "exact_median_value",
    "exact_quantiles_value",
    "ks_windowed",
    # round-5 third wave: grouped ECDF deciles, TF-IDF pair join,
    # LSH k-NN graph, vocab-bounded PMI
    "value_deciles_by_type",
    "tfidf_cosine_pairs",
    "knn_graph",
    "token_pmi_pairs",
    # round-5 fourth wave: robust stats, weighted simhash, basket
    # affinity, silhouette eval, inverted-index AND search
    "event_value_mad_outliers",
    "daily_revenue_autocorr",
    "simhash_idf",
    "session_type_affinity",
    "label_centroid_silhouette",
    "boolean_and_search",
    # round-5 fifth wave: sweep-line concurrency, CUSUM changepoint,
    # binary-lane simhash, expectations gate
    "peak_concurrent_sessions",
    "revenue_changepoint",
    "payload_simhash",
    "orders_expectations",
    # round-5 sixth wave: graph peeling, mergeable KMV sketch,
    # positional co-occurrence, decayed trend, seasonal residuals
    "kcore_dup_graph",
    "kmv_distinct_users",
    "skipgram_pairs",
    "ewma_daily_revenue",
    "seasonal_residual_outliers",
    # round-5 seventh wave: robust trim, attribution, 3-itemsets,
    # sliding distinct
    "trimmed_mean_by_type",
    "linear_touch_attribution",
    "part_triple_affinity",
    "rolling_7d_active_users",
    # round-5 eighth wave: distributed-rank concentration stats +
    # vocabulary planning
    "customer_spend_gini",
    "vocab_coverage_curve",
    # round-5 waves 9-12: cadence median, grouped Pearson, ANN
    # cascade, span/source dup reports, Zipf audit
    "order_gap_median_by_segment",
    "discount_quantity_corr_by_brand",
    "knn_int8_rerank",
    "top_repeated_spans",
    "source_cross_dup_matrix",
    "token_zipf_table",
    # round-5 waves 14-19: composed corpus plan, banding sweep,
    # binary near-dup pairs
    "training_corpus_plan",
    "lsh_band_sweep",
    "payload_simhash_pairs",
    # round-6: exact suffix-rank LRS (iterative; ~8 doubling rounds)
    "longest_repeated_substring",
    # round-6 tail sweep: every operator family gets at least one
    # timed representative (verdict r5 item 6)
    "q9_profit_by_nation_year",
    "supplier_ontime_wilson",
    "nation_supplier_hhi",
    "benford_chi2_by_priority",
    "winsorized_value_stats",
    "hll_event_overlap",
    "global_row_index",
    "funnel_convert_time_quantiles",
    "cohort_ltv_curve",
    "user_behavior_entropy",
    "knn_ivf_pq",
    "ivf_probe_sweep",
    "semantic_dedup_keep_best",
    "leakage_safe_split",
    "sequence_packing",
    "bm25_scores",
    "multimodal_content_dedup",
    "doc_sentence_stats",
    # round-6: graph-index ANN (navigable index build + beam search)
    "beam_graph_edges",
    "knn_beam",
    # round-7: batch beam serving shape
    "knn_beam_batch",
    # round-8: BQ depth sweep, sequential-fold forecasting/drift,
    # tail index, composed store maintenance+serving
    "bq_cand_sweep",
    "holt_winters_daily_forecast",
    "page_hinkley_drift",
    "hill_tail_index",
    "store_value_quantiles",
    "store_heavy_hitters",
    "seasonal_decompose_daily",
    "ewma_control_chart",
    # round-6 waves 22-26: skyline, rank stats, curation signals,
    # deciles, PQ health
    "orders_skyline_2d",
    "mann_whitney_value_drift",
    "doc_char_entropy",
    "embedding_outliers_diag",
    "customer_spend_decile_profile",
    "user_active_day_streaks",
    # round-7 wave 1: corpus-LM quality, Gopher rule battery, robust
    # trend tests, single-pass label cohesion
    "unigram_logprob_quality",
    "gopher_ngram_fractions",
    "gopher_quality_rules",
    "theil_sen_daily_trend",
    "mann_kendall_trend",
    "intra_inter_cosine_gap",
    # round-7 wave 2
    "mmr_diversified_topk",
    "dsir_importance_weights",
    "poisson_bootstrap_ci",
    # round-7 wave 3
    "welch_ttest_values",
    "weighted_sample_docs",
    "purchase_gap_survival",
    # round-7 wave 4
    "payload_chunk_overlap_pairs",
    "functional_dependency_audit",
    # round-7 wave 5
    "ushape_attribution",
    "conformal_value_intervals",
    # round-7 waves 6-9: rank ANOVA / FDR / association, the 1-bit
    # BQ serving tier, CCNet tertiles + JS drift, OLS + periodogram
    "kruskal_wallis_values",
    "segment_pvalues_fdr",
    "cramers_v_audit",
    "knn_bq_hamming",
    "knn_bq_rerank",
    "ccnet_perplexity_buckets",
    "token_js_drift",
    "weighted_price_median_by_flag",
    "ols_daily_trend",
    "daily_revenue_periodogram",
    # round-7 waves 11-19: JL/join audits, binary-lane clusters,
    # ANOVA family, held-out LM, b-bit sketch, dim-PSI, attribution
    # closure, CCNet decision, Heaps fit, BQ recall harness
    "jl_projection_distortion",
    "join_cardinality_estimate",
    "payload_dedup_components",
    "anova_f_values",
    "brown_forsythe_variance_test",
    "lm_heldout_perplexity",
    "bbit_minhash_estimate",
    "embedding_dim_psi",
    "time_decay_attribution",
    "ccnet_sampling_plan",
    "heaps_law_fit",
    "knn_bq_recall",
    # round-9 wave: SPC/normality/portmanteau statistics, robust
    # location, intermittent demand, sampling design, MI audit,
    # readability, Dirichlet QL, k-center coreset, isotonic fit
    "cusum_daily_revenue",
    "runs_test_daily",
    "grubbs_daily_outlier",
    "ljung_box_daily",
    "jarque_bera_value",
    "bartlett_variance_test",
    "huber_mean_value",
    "croston_part_demand",
    "neyman_allocation_plan",
    "type_hour_mutual_info",
    "doc_readability",
    "lm_dirichlet_scores",
    "kcenter_greedy_coreset",
    "isotonic_calibration",
    "pacf_daily_revenue",
    "pettitt_changepoint",
    "turning_point_test",
    "classifier_auc",
    "classifier_pr_table",
    "langid_kappa",
    "ab_conversion_ztest",
    "logrank_purchase_gap",
    "classifier_mcc",
    "gumbel_block_maxima",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # contract/smoke runs (tiny sf) set RUNS=1 WARMUP=0 to stay inside
    # their subprocess timeout; driver-scale runs keep the steady-state
    # default of 1 warmup + median-of-3
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    warmup = os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    spark = get_spark("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs]

    # steady-state methodology, per query: one untimed warmup run
    # (JIT/codegen compilation, parquet footer cache, python daemon
    # spin-up) immediately followed by the timed runs. Warming and
    # timing back-to-back keeps the query's generated code hot in the
    # JIT code cache — a single global warmup pass measured ~3× worse
    # (22 queries' codegen classes evict each other before the timed
    # pass comes back around). At production scale the one-time costs
    # amortize to zero against hours of execution; the timed runs
    # measure the plans.
    # best-of-N timed runs per query (the timeit convention): this
    # host shows multi-second contention bursts that can inflate any
    # single run 5-30×; the minimum is the reproducible cost of the
    # PLAN, which is what the benchmark is for
    timings: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    for name in names:
        if warmup:
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        raw_runs[name] = [round(r, 3) for r in runs]

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # the driver keeps only the LAST ~2000 chars of stdout; a 96-query
    # map is ~3KB so the full line can never parse from the tail.
    # Full fidelity goes to bench_out.json (committed, so per-query
    # history survives every round); stdout carries the same summary
    # with as many of the SLOWEST queries as fit a conservative byte
    # budget — the parsed record keeps the headline total plus the
    # top-cost tail the plan audit reads first.
    # Per-query burst adjudication (round-9 convention): the headline
    # map carries min-of-N (the reproducible plan cost), and the full
    # artifact ALSO carries every raw timed run plus a burst flag for
    # queries whose worst run exceeded 3× the best — so a 14 s reading
    # for a 1.7 s query is visibly an ambient co-tenancy burst in the
    # committed artifact itself, not a silent regression to adjudicate
    # by hand next round (VERDICT r8 "Missing #5").
    payload["runs_sec"] = raw_runs
    payload["burst_flagged"] = sorted(
        n for n, rs in raw_runs.items()
        if len(rs) > 1 and max(rs) > 3.0 * max(min(rs), 1e-9))
    # contract/smoke runs point this at a tmp path so a full pytest
    # pass can never clobber the committed sf0.1 artifact (r8 lesson).
    # The driver also re-runs the bench at a LOWER core count to
    # measure scaling; that run must not clobber the committed 32-core
    # artifact either (r10 lesson: the repo's committed bench_out.json
    # ended up holding the 8-core run), so a non-32-core run defaults
    # to a cpu-suffixed file. stdout names whichever file was written
    # (queries_full), so the record stays self-describing.
    default_name = ("bench_out.json" if cpus == 32
                    else f"bench_out_c{cpus}.json")
    out_path = Path(os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        Path(__file__).resolve().parent / default_name))
    out_path.write_text(json.dumps(payload) + "\n")
    budget = 1700
    slowest = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
    stdout_payload = dict(payload)
    # raw run lists are full-artifact detail; the ~2000-char stdout
    # window keeps only the burst count so the parsed record still
    # says whether the totals are contention-inflated
    stdout_payload.pop("runs_sec", None)
    stdout_payload["n_burst_flagged"] = len(payload["burst_flagged"])
    stdout_payload.pop("burst_flagged", None)
    stdout_payload["queries_full"] = out_path.name
    stdout_payload["n_queries"] = len(timings)
    for keep in range(len(slowest), -1, -1):
        stdout_payload["queries"] = dict(slowest[:keep])
        stdout_payload["queries_omitted"] = len(timings) - keep
        line = json.dumps(stdout_payload, separators=(",", ":"))
        if len(line) <= budget:
            break
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
