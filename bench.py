"""Benchmark harness (driver-run per round; also the local feedback loop).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line.  Each query is forced end-to-end with the `noop` sink (full
materialization, no driver collect, no disk write skew).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The PINNED round-2 comparison set (the 45 queries BENCH_r02 measured):
# reported as its own `headline_fixed_total` every round so round-over-
# round comparability doesn't depend on recomputing common-set sums as
# the headline surface grows (verdict r4 task #9).  Do not add to or
# remove from this list — it is a frozen yardstick, not coverage.
HEADLINE_FIXED45 = [
    "q1_pricing_summary", "q5_revenue_per_nation", "hash_key_generation",
    "union_distinct", "full_outer_snapshots", "argmax_per_group",
    "global_rank_leaderboard", "scd2_merge_orders",
    "insert_only_merge_customers", "text_analysis", "dedup_exact_docs",
    "minhash_lsh_pairs", "simhash_signatures", "embedding_cosine_topk",
    "ann_lsh_bucketed", "tumbling_window_events", "session_window_events",
    "asof_join_events", "pipeline_genre_metrics", "pipeline_rating_slide",
    "rollup_orders", "scalar_parsing", "exists_semi_join",
    "salted_groupby_events", "window_frame_functions",
    "embedding_neardup_pairs", "correlated_agg_threshold",
    "exact_percentiles", "deterministic_sample_split", "scrub_documents",
    "rolling_fingerprint_docs", "neardup_clusters", "q3_shipping_priority",
    "q6_forecast_revenue", "q18_large_orders", "doc_frequency_terms",
    "grouping_sets_orders", "ann_ivf_sampled", "quality_quantile_filter",
    "profile_lineitem_numeric", "histogram_extendedprice",
    "q21_waiting_suppliers", "q16_supplier_count_distinct",
    "q2_cheapest_supplier", "incremental_mart_merge",
]

HEADLINE = [
    "q1_pricing_summary",
    "q5_revenue_per_nation",
    "hash_key_generation",
    "union_distinct",
    "full_outer_snapshots",
    "argmax_per_group",
    "global_rank_leaderboard",
    "scd2_merge_orders",
    "insert_only_merge_customers",
    "text_analysis",
    "dedup_exact_docs",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "embedding_cosine_topk",
    "ann_lsh_bucketed",
    "tumbling_window_events",
    "session_window_events",
    "asof_join_events",
    "pipeline_genre_metrics",
    "pipeline_rating_slide",
    "rollup_orders",
    "scalar_parsing",
    "exists_semi_join",
    "salted_groupby_events",
    "window_frame_functions",
    "embedding_neardup_pairs",
    "correlated_agg_threshold",
    "exact_percentiles",
    "deterministic_sample_split",
    "scrub_documents",
    "rolling_fingerprint_docs",
    "neardup_clusters",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q18_large_orders",
    "doc_frequency_terms",
    "grouping_sets_orders",
    "ann_ivf_sampled",
    "quality_quantile_filter",
    "profile_lineitem_numeric",
    "histogram_extendedprice",
    "q21_waiting_suppliers",
    "q16_supplier_count_distinct",
    "q2_cheapest_supplier",
    "incremental_mart_merge",
    # round 3: training-data ops + the real disk persistence path
    "pack_sequences_budget",
    "decontaminate_docs",
    "deterministic_global_shuffle",
    "repetition_ratio_docs",
    "warehouse_movie_data_disk",
    "warehouse_scd2_two_batch_disk",
    # retrieval + corpus-audit ops and the two remaining TPC-H shapes
    "bm25_docs",
    "dup_ngram_fraction_docs",
    "balanced_resample_docs",
    "embedding_centroid_outliers",
    "q9_product_type_profit",
    "q17_small_quantity_revenue",
    "knn_graph_embeddings",
    "select_token_budget_docs",
    "corpus_report_by_source",
    # round-3 continuation: new join/vector/sampling/persistence ops
    "interval_overlap_sessions",
    "mixture_sample_domains",
    "quantize_embeddings_int8",
    "vocab_coverage_docs",
    "semantic_dedup_keep",
    "neardup_labels_persisted",
    # round-3 continuation 2: sequence analytics, graph, exact set-join,
    # reconciliation/audit, MDM fusion, attribution
    "markov_transitions_events",
    "twap_events",
    "vocab_truncate_docs",
    "pagerank_parts_copurchase",
    "jaccard_prefix_join_docs",
    "cumulative_unique_users_daily",
    "scd2_validity_audit",
    "table_checksum_orders",
    "winsorize_lineitem_prices",
    "attribution_last_touch",
    "survivorship_golden_docs",
    "dau_wau_stickiness",
    "session_paths_events",
    # round-3 continuation 3: retrieval, experiment stats, market-basket,
    # and the end-to-end curation composition
    "hard_negative_mining",
    "mmr_rerank_topk",
    "ctr_wilson_bounds",
    "ab_test_lift",
    "skew_report_lineitem",
    "association_rules_parts",
    "user_event_entropy",
    "equidepth_bins_orders",
    "daily_revenue_trend",
    "jaccard_prefix_join_collapsed",
    "curate_corpus_end_to_end",
    # round 4: the de-scale-killed RRF fusion, the newly oracle-gated
    # sketch/multimodal paths, the standalone link-table build, and the
    # erasure/CDF disk paths (now race-free per-invocation scratch)
    "hybrid_search_rrf",
    "pipeline_movie_genre_link",
    "multimodal_features",
    "approx_sketches",
    "version_diff_orders",
    "gdpr_erasure_cascade",
    "triangle_counts_parts",
    "minhash_estimate_audit",
    "entity_clusters_parts",
    "tfidf_topk_docs",
    "bpe_train_merges_docs",
    "mad_outliers_lineitem",
    "incremental_agg_from_cdf",
    "leakage_safe_split_events",
    "cusum_changepoint_daily",
    # round-4 continuation: sketch/skyline/BFS/drift/survival batch
    "revenue_share_of_parent",
    "source_histogram_overlap",
    "neardup_cluster_sizes",
    "embedding_dim_stats",
    "crosscorr_clicks_purchases",
    "cohort_ltv_events",
    "overdispersion_events",
    "knn_recall_audit",
    "encoding_advisor_lineitem",
    "scd3_merge_customers",
    "fk_orphan_audit",
    "ewma_control_daily",
    "auc_score_docs",
    "langid_confusion_docs",
    "markov_accuracy_events",
    "zipf_slope_terms",
    "gini_revenue_customers",
    "attribution_linear_events",
    "zorder_pruning_audit",
    "spearman_price_size_parts",
    "target_encode_loo_orders",
    "recency_features_events",
    "quantile_transform_docs",
    "ppr_parts_seeded",
    "weighted_median_lineitem",
    "bpe_encode_docs",
    "cms_join_size_audit",
    "bloom_prune_audit",
    "mutual_information_events",
    "ks_drift_orders",
    "fd_audit_orders",
    "dow_seasonal_residuals_events",
    "knn_label_agreement",
    "bigram_logprob_docs",
    "hazard_table_users",
    "diff_in_diff_events",
    "gaps_islands_orders",
    "yoy_growth_monthly",
    "cms_heavy_hitters_events",
    "pareto_frontier_parts",
    "bfs_khop_parts",
    "psi_drift_orders",
    "benford_audit_lineitem",
    "moments_quantity_lineitem",
    "collocations_pmi_docs",
    "ols_trend_nation_monthly",
    "simpson_paradox_orders",
    "orc_roundtrip_lineitem",
    "rfm_segments_customers",
    "seasonal_naive_mape_monthly",
    "sprt_ab_events",
    "partitioned_overwrite_orders",
    "debounce_events",
    "ipw_estimate_docs",
    "conformal_interval_nation_monthly",
    "covariance_matrix_embeddings",
    "duplicate_payment_audit_orders",
    "totalprice_reconciliation_orders",
    "yoy_waterfall_nation",
    "jl_distortion_audit",
    "theil_sen_nation_monthly",
    "readability_docs",
    "assortativity_copurchase",
    "pareto_head_parts",
    "event_trigrams_users",
    "js_divergence_sources",
    "bootstrap_ci_lineitem",
    "tokenizer_fertility_lang",
    "bitmap_distinct_audit",
    "pii_summary_by_source",
    "kcore_parts_copurchase",
    "funnel_deadline_events",
    "incremental_join_view_cdf",
    "rollup_cascade_events",
    # round 5: sketches, inference, forecasting, graph communities,
    # warehouse temporality, mixed-media decode, exact-Gram PCA
    "hll_distinct_audit",
    "hll_incremental_merge_audit",
    "mannwhitney_u_lineitem",
    "acf_daily_revenue",
    "label_propagation_parts",
    "cuped_adjusted_lift_events",
    "holt_forecast_nation_monthly",
    "seasonal_decompose_monthly",
    "adamic_adar_parts",
    "scd4_current_history_customers",
    "bitemporal_snapshot_orders",
    "wap_publish_audit_orders",
    "mixed_media_decode_stats",
    "pca_top_component_embeddings",
    "interevent_burstiness_events",
    "welch_ttest_orders",
    "kruskal_wallis_lineitem",
    "temperature_mixture_weights_docs",
    "trimmed_mean_lineitem",
    "max_drawdown_daily_revenue",
    # round 6 (verdict task #3): EVERY reference-surface pipeline_* /
    # warehouse_* query goes under the perf gate — the engine's own
    # 12-table mart workload was the one part of the surface the bench
    # couldn't see, and the one real hotspot (pipeline_employee_data,
    # 11.6s at sf0.1 in r5) hid there.
    "pipeline_genre_hub",
    "pipeline_movie_hub",
    "pipeline_employee_hub",
    "pipeline_movie_emp_link",
    "pipeline_emp_movie_l_sat",
    "pipeline_movie_info_sat",
    "pipeline_movie_data",
    "pipeline_movie_employee_link",
    "pipeline_employee_data",
    "warehouse_emp_link_bucketed_disk",
    # round-6 wave 12: audio decode, simhash near-dup join, HLL rollup
    # lattice, cross-source leakage, RANGE frames, U-shaped attribution
    "audio_decode_stats",
    "simhash_hamming_pairs",
    "hll_rollup_lattice",
    "neardup_source_matrix",
    "rolling_revenue_range_frame",
    "attribution_position_events",
    # round-6 wave 13: vocab growth, triplet mining, dedup accounting,
    # k-anonymity, packing efficiency
    "heaps_law_vocab_growth",
    "triplet_mining_embeddings",
    "dedup_token_loss_report",
    "k_anonymity_audit_customers",
    "packing_efficiency_audit",
    "simhash_hamming_pairs_collapsed",
    "hll_overlap_audience_events",
    # round-7 wave 14
    "rerank_agreement_audit",
    "ngram_novelty_batch",
    "curriculum_mixture_schedule",
    "decontamination_split_audit",
    "cluster_purity_embeddings",
    # wave 15
    "gopher_quality_filter_docs",
    "kappa_quality_labelers_docs",
    "boilerplate_chunk_removal_docs",
    "embedding_isotropy_audit",
    "cluster_safe_split_docs",
    "cdc_apply_multi_clause_orders",
    # wave 16
    "asof_forward_tolerance_events",
    "semiadditive_balance_monthly",
    "reliability_diagram_docs",
    # wave 17
    "hierarchy_rollup_parts",
    "l_diversity_audit_customers",
    "ndcg_retrieval_audit",
    "t_closeness_audit_customers",
    # wave 18
    "fair_interleave_topk_docs",
    "median_ci_lineitem",
    # wave 19
    "hits_suppliers_parts",
    "modularity_brand_copurchase",
    "item_cf_cosine_parts",
    # wave 20
    "winnowing_fingerprints_docs",
    "dsir_selection_docs",
    "naive_bayes_lang_docs",
    "spell_candidates_docs",
    "cdc_chunk_dedup_docs",
    # wave 21
    "ecod_outliers_embeddings",
    "textrank_keywords_docs",
    # wave 22
    "wasserstein_drift_orders",
    "hill_tail_index_orders",
    "mrr_retrieval_audit",
    "shapley_source_valuation_docs",
    # wave 23
    "isotonic_calibration_docs",
    "bradley_terry_brands",
    "frequent_triples_parts",
    # wave 24
    "km_survival_users",
    "page_hinkley_daily",
    "linear_interp_user_hours",
    "quantile_normalize_embeddings",
    # wave 25
    "logrank_test_users",
    "holt_winters_daily",
    # wave 26
    "cka_quantization_audit",
    "seasonal_anomaly_monthly",
    "neardup_cluster_tightness",
    # wave 27
    "negative_sampling_table_docs",
    "feature_hashing_audit_docs",
    # wave 28
    "incremental_join_view_orders",
    "blocking_quality_audit_docs",
    # wave 29 (r8)
    "substring_dup_spans_docs",
    "prd_divergence_embeddings",
    "tokenizer_fertility_drift",
    # wave 30 (r8)
    "kcenter_coreset_embeddings",
    "domain_reweight_step_docs",
    "retraction_ivm_orders",
    # wave 31 (r8)
    "horvitz_thompson_docs",
    "bh_fdr_sources",
    "mann_kendall_daily",
    # wave 32 (r8)
    "char_entropy_docs",
    "length_bucketing_audit_docs",
    # wave 33 (r8)
    "brier_decomposition_docs",
    "acf_ljungbox_daily",
    "mcnemar_rules_docs",
    # wave 34 (r8)
    "ab_power_sample_size_events",
]

# Pathologically heavy queries run LAST (verdict r5 task #6): one heavy
# query's GC pressure poisons the shared bench JVM for every query after
# it (NOTES.md: the 45s all-pairs AA inflated the common set 2×; the r5
# graph batch made three untouched queries read 2-3× slower).  Keeping
# the iterative-graph + disk-path batch at the tail bounds the blast
# radius to other heavy queries.
RUN_LAST = {
    "pagerank_parts_copurchase",
    "ppr_parts_seeded",
    "hits_suppliers_parts",
    "modularity_brand_copurchase",
    "item_cf_cosine_parts",
    "kcore_parts_copurchase",
    "label_propagation_parts",
    "adamic_adar_parts",
    "triangle_counts_parts",
    "bfs_khop_parts",
    "assortativity_copurchase",
    "warehouse_movie_data_disk",
    "warehouse_scd2_two_batch_disk",
    "warehouse_emp_link_bucketed_disk",
    "gdpr_erasure_cascade",
    "pipeline_employee_data",
    "jaccard_prefix_join_docs",
    "cluster_safe_split_docs",
    # ADVICE r9: registry-minus-HEADLINE extras append to the LIGHT
    # section unless listed here, so heavy newcomers (the lcs pair
    # joins: corpus gram explode + self-join + per-pair interval merge)
    # would otherwise run mid-sequence and contaminate neighbors.
    "lcs_doc_pairs_docs",
    "lcs_doc_pairs_collapsed",
    "jaccard_prefix_join_collapsed",
    "simhash_hamming_pairs_collapsed",
    "substring_dup_spans_docs",
}


def _plan_fingerprint(df) -> str:
    """Stable hash of the optimized logical plan, so a bench regression
    can be attributed: same fingerprint + slower time = host noise; new
    fingerprint = the plan actually changed.  Normalizes the volatile
    bits (expression ids `#123`, plan ids, temp paths, in-memory RDD
    numbers) out of `explain` output before hashing.
    """
    import hashlib
    import re

    raw = df._jdf.queryExecution().optimizedPlan().toString()
    norm = re.sub(r"#\d+", "#", raw)
    norm = re.sub(r"\[plan_id=\d+\]", "", norm)
    norm = re.sub(r"file:[^\s,\]]+", "file:", norm)
    norm = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[]", norm)
    norm = re.sub(r"LogicalRDD \[[^\]]*\]", "LogicalRDD []", norm)
    return hashlib.md5(norm.encode()).hexdigest()[:12]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as ent
    from imdb_metacritic_data_warehouse_spark.session import get_spark

    spark = get_spark("bench")
    qs = ent.queries()

    # Heavy batch at the tail (see RUN_LAST) — stable order otherwise.
    # Registry queries not yet in the curated HEADLINE list append after
    # it (sorted, so the order is stable) — the clean record must cover
    # the FULL current surface, and a hand-maintained list drifts as
    # waves land (verdict r8 task #3: the r8 record missed waves 32-34).
    extra = sorted(set(qs) - set(HEADLINE))
    order = (
        [n for n in HEADLINE if n not in RUN_LAST]
        + [n for n in extra if n not in RUN_LAST]
        + [n for n in HEADLINE if n in RUN_LAST]
        + [n for n in extra if n in RUN_LAST]
    )

    # Prior round's record (if committed): plan fingerprints let us
    # separate "plan changed" from "JVM poisoning / host noise" when a
    # timing moves round-over-round.
    prior_timings: dict[str, float] = {}
    prior_plans: dict[str, str] = {}
    prior_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    try:
        with open(prior_path) as fh:
            prior = json.load(fh)
        # cross-SF timings are not comparable — only audit same-SF runs
        if str(prior.get("sf")) == str(
            float(sf) if sf.replace(".", "").isdigit() else sf
        ):
            prior_timings = prior.get("queries", {})
            prior_plans = prior.get("plan_fingerprints", {})
    except Exception:
        pass

    # Queries that themselves leave heavy checkpoint/scratch state —
    # collect BEFORE each so the measurement starts from a clean heap
    # (pipeline_movie_info_sat has read 2-3x its clean floor in three
    # driver benches while never reproducing locally, even same-JVM
    # directly after this family: r10 forensics, NOTES.md).
    GC_BEFORE = {
        "pipeline_movie_emp_link",
        "pipeline_emp_movie_l_sat",
        "pipeline_movie_info_sat",
        "pipeline_movie_data",
        "pipeline_movie_employee_link",
        "pipeline_employee_data",
    }

    def _gc():
        # Checkpoint-heavy queries (the employee pipeline, the disk
        # paths) leave localCheckpoint blocks that the ContextCleaner
        # frees only after a JVM GC; across 221×3 executions the
        # accumulated pressure inflated UNTOUCHED mid-list queries up
        # to 9× (round-6 forensics: conformal 0.8→7.6s in-sequence,
        # 1.6s clean).  An explicit collection between queries keeps
        # the sequence honest for ~0.1s each.
        try:
            spark._jvm.System.gc()
        except Exception:
            pass

    # Unmeasured warm-up pass: JIT/codegen compile, parquet footer and
    # JVM warm-up dominate first executions (measured 2-3× steady state
    # on the heavy queries), so report steady-state latency.
    for i, name in enumerate(order):
        if name in qs:
            if name in GC_BEFORE:
                _gc()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            if name in RUN_LAST or i % 10 == 9:
                _gc()

    # best-of-2 per query: single-shot timings at this scale carry
    # ±1-2s host/GC noise (one observed run was 3× off on untouched
    # queries); the min is the standard noise-robust latency estimate
    timings: dict[str, float] = {}
    plans: dict[str, str] = {}
    total = 0.0
    for i, name in enumerate(order):
        if name not in qs:
            continue
        if name in GC_BEFORE:
            _gc()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        try:
            plans[name] = _plan_fingerprint(df)
        except Exception:
            plans[name] = "err"
        del df
        timings[name] = round(best, 3)
        total += timings[name]
        if name in RUN_LAST or i % 10 == 9:
            _gc()

    # The frozen yardstick must stay comparable: a renamed/removed query
    # or a partial run would silently shrink the sum (ADVICE r5) — record
    # any missing names alongside the total instead of hiding them.
    fixed_missing = sorted(set(HEADLINE_FIXED45) - set(timings))
    fixed_total = round(
        sum(timings[n] for n in HEADLINE_FIXED45 if n in timings), 3
    )

    # Contention audit (verdict r5 task #6): a query >2× slower than a
    # prior run whose plan fingerprint is UNCHANGED is JVM poisoning or
    # host noise, not a regression — name them so round-over-round
    # deltas are explained by plan changes only.
    contention_suspects = sorted(
        n
        for n, t in timings.items()
        if n in prior_timings
        and prior_plans.get(n) == plans.get(n)
        and plans.get(n) not in (None, "err")
        and t > 2.0 * prior_timings[n]
        and t > 1.0  # sub-second flutter is not contention
    )

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full record (timings + plan fingerprints) goes to BENCH_LOCAL.json
    # in-repo: the driver keeps only the last ~2000 chars of stdout, and
    # round 3's timings were truncated away behind the fingerprint dict.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"), "w") as fh:
        json.dump(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "headline_fixed_total": fixed_total,
                "headline_fixed_missing": fixed_missing,
                "contention_suspects": contention_suspects,
                "unit": "sec",
                "queries": timings,
                "plan_fingerprints": plans,
                "sf": sf_val,
            },
            fh,
            indent=1,
        )
    # Stdout stays ONE JSON line, ordered so the informative tail
    # (slowest queries, total) survives truncation: fingerprints are
    # file-only, per-query timings first, slowest-10 + value LAST.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "queries": timings,
                "slowest10": slowest,
                "contention_suspects": contention_suspects,
                "headline_fixed_missing": fixed_missing,
                "headline_fixed_total": fixed_total,
                "value": round(total, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
