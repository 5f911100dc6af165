#!/usr/bin/env python
"""Scale probe: materialize a 10x copy of sf0.1 (6M lineitem rows, 20k
embeddings, 50k documents) in /tmp and measure headline operators at both
scales. The point is the SHAPE of the scaling curve, not absolute time: a
partition-parallel operator should grow roughly linearly in data (or
better, while overhead still dominates); any super-linear jump is a scale
bug the 100 TB claim can't survive.

Fact keys are shifted per copy so fact-fact joins keep 1:N fan-out
(l_orderkey/o_orderkey/event_id/doc_id/vec_id += i*BASE); dimension tables
stay 1x, as at 100 TB (dims grow with entities, facts with activity).
Repeated documents/embeddings make the near-dup operators face a 10x
duplicate corpus — the hot-bucket guard and tile paths get exercised for
real (20k vectors = 5 GEMM blocks, 15 tile pairs vs 1 at sf0.1).

Usage: python tools/scale_probe.py [n_copies]   (default 10)
Writes nothing outside /tmp; prints one result line per (query, scale).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lambdatotheslaughter_spark import registry
from lambdatotheslaughter_spark.session import get_spark
from lambdatotheslaughter_spark.tables import load_table

SRC = "/root/testdata/sf0.1"
KEY_BASE = 10_000_000

# (table, key columns to shift per copy)
SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # customer scales ONLY for the queries that declare it below (the
    # entity-grain geo/ER probes, where the customer table IS the fact):
    # everywhere else it stays a 1x dim via the DIMS loop
    "customer": ["c_custkey"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

PROBE_QUERIES = [
    "agg_pricing_summary",      # scan+agg: pure map-side scaling
    "topk_global",              # join + TakeOrdered
    "join_multiway_star",       # star join, dims broadcast
    "agg_distinct",             # Expand distinct
    "win_topk_per_group",       # window
    "llm_dedup_exact",          # corpus-wide groupBy
    "llm_dedup_fuzzy_minhash",  # LSH + hot-bucket guard under 10x dups
    "llm_sim_knn_bruteforce",   # multi-tile GEMM (5 blocks, 15 tiles)
    "llm_sim_radius_search",    # same scaffold, dense output
    "llm_dedup_ngram_jaccard",  # vocab-dictionary GEMM at 50k docs / 78 tiles
    "llm_dedup_cluster",        # iterative CC over a 10x duplicate graph
    "llm_dedup_incremental_fuzzy",  # batch-vs-history LSH (round 3)
    "join_interval_binned",     # binned equi interval join (round 3)
    "scd2_dimension_merge",     # shared-shuffle double window (round 3)
    "llm_dedup_span_exact",     # span inventory + hash groupBy (round 3)
    "llm_dedup_bloom_prefilter",  # broadcast bloom + confirm joins (round 3)
    "join_asof_nearest_tolerance",  # 3-bin probe + min_by argmin (round 3)
    "llm_embedding_pca_project",  # int64 partial Gram + HOF projection (round 3)
    "llm_fingerprint_winnow",   # per-doc windowed min selection (round 4)
    "llm_cooccurrence_pmi",     # two word-count shuffles + vocab joins (round 4)
    "llm_index_inverted_postings",  # term-keyed combinable groupBy (round 4)
    "graph_triangle_count",     # degree-ordered wedge probe (round 4)
    "llm_embedding_centroids",  # fixed-point (label, dim) partial sums (round 4)
    "ts_mom_growth",            # broadcast-dim rollup + lag window (round 4)
]


# fact tables each probe query actually scans — lets a high-copy tier
# (100x documents = 500k docs) skip materializing 60M lineitem rows it
# will never read. Unknown queries fall back to "all tables".
QUERY_TABLES = {
    "agg_pricing_summary": {"lineitem"},
    "topk_global": {"lineitem", "orders"},
    "join_multiway_star": {"lineitem", "orders"},
    "agg_distinct": {"events"},
    "win_topk_per_group": {"orders"},
    "llm_dedup_exact": {"documents"},
    "llm_dedup_fuzzy_minhash": {"documents"},
    "llm_sim_knn_bruteforce": {"embeddings"},
    "llm_sim_radius_search": {"embeddings"},
    "llm_dedup_ngram_jaccard": {"documents"},
    "llm_dedup_cluster": {"documents"},
    "llm_dedup_incremental_fuzzy": {"documents"},
    "llm_dedup_containment": {"documents"},
    "llm_dedup_survivorship": {"documents"},
    "llm_sim_knn_quantized": {"embeddings"},
    "llm_pipeline_end_to_end": {"documents"},
    "join_interval_binned": {"events"},
    "scd2_dimension_merge": {"events"},
    "llm_dedup_span_exact": {"documents"},
    "llm_dedup_bloom_prefilter": {"documents"},
    "join_asof_nearest_tolerance": {"events"},
    "llm_embedding_pca_project": {"embeddings"},
    "llm_fingerprint_winnow": {"documents"},
    "llm_cooccurrence_pmi": {"documents"},
    "llm_index_inverted_postings": {"documents"},
    "graph_triangle_count": {"lineitem"},
    "llm_embedding_centroids": {"embeddings"},
    "ts_mom_growth": {"orders"},
    "graph_bfs_distance": {"lineitem"},
    "graph_degree_histogram": {"lineitem"},
    "graph_pagerank_fixed": {"lineitem"},
    "join_fuzzy_levenshtein_blocked": set(),  # customer is a 1x dim
    "graph_connected_components": {"lineitem"},
    "graph_jaccard_neighbors": {"lineitem"},
    "llm_dedup_bag_of_words": {"documents"},
    "llm_eval_ngram_recall": {"documents"},
    "llm_rank_fusion_rrf": {"documents"},
    "llm_corpus_report": {"documents"},
    "ts_rolling_corr": {"events"},
    "ts_downsample_stride": {"events"},
    "llm_sample_fixed_k_per_group": {"documents"},
    "llm_hard_negative_mining": {"embeddings"},
    "agg_gini_impurity": {"events"},
    "ts_trend_slope": {"events"},
    "llm_format_chat_template": {"documents"},
    "llm_dpo_pair_builder": {"documents"},
    "graph_k_core": {"lineitem"},
    "llm_ngram_novelty": {"documents"},
    "ts_gap_detection": {"events"},
    "ts_forward_fill": {"events"},
    "win_range_between_numeric": {"orders"},
    "sql_scalar_function_ddl": {"lineitem"},
    "sql_session_variables": {"orders"},
    "str_hash_functions": {"orders"},
    "llm_style_fingerprint": {"documents"},
    "llm_boilerplate_share": {"documents"},
    "llm_span_corruption": {"documents"},
    "graph_label_propagation_sync": {"lineitem"},
    "llm_eval_chrf": {"documents"},
    "dq_cross_field_consistency": {"lineitem", "orders", "events"},
    "seq_interpurchase_quantiles": {"events"},
    "ml_mcc_threshold_sweep": {"events"},
    "stat_durbin_watson": {"events"},
    "ts_hurst_rs": {"events"},
    "graph_local_bridges": {"lineitem"},
    "seq_user_path_entropy": {"events"},
    "llm_cross_lang_leakage": {"documents"},
    "stat_cronbach_alpha": {"events"},
    "llm_retrieval_bm25_topk": {"documents"},
    "ts_cumulative_distinct_users": {"events"},
    "date_business_days": {"orders"},
    "set_union_by_name": {"lineitem", "orders"},
    "sql_group_by_all": {"lineitem"},
    "sql_window_clause_named": {"orders"},
    "llm_html_strip": {"documents"},
    "llm_embedding_truncate_renorm": {"embeddings"},
    "llm_fim_transform": {"documents"},
    "sink_csv_roundtrip_quotes": {"documents"},
    "sql_values_inline_table": {"orders"},
    "sql_lateral_view_explode": {"documents"},
    "sql_distribute_sort_by": {"events"},
    "sql_join_hints": {"orders"},
    "date_iso_week_quarter": {"orders"},
    "ts_time_weighted_avg": {"events"},
    "sql_join_hint_merge": {"orders"},
    "llm_minhash_bbit": {"documents"},
    "win_topk_with_ties": {"orders"},
    "sql_identifier_clause": {"orders"},
    "sql_column_defaults": {"orders"},
    "llm_lsh_tuning_report": {"documents"},
    "sql_star_except": {"orders"},
    "agg_filter_clause": {"orders"},
    "scan_nested_predicate_pushdown": {"events"},
    "source_partition_discovery_types": {"events"},
    "scan_aggregate_pushdown": {"orders"},
    "llm_dedup_cross_shard_merge": {"documents"},
    "sql_table_function_range": {"orders"},
    "stat_crosstab": {"orders"},
    "sql_pivot_clause": {"events"},
    "sql_unpivot_clause": {"orders"},
    "sql_hint_rebalance": {"orders"},
    "scan_fieldid_rename_evolution": {"orders"},
    "sink_max_records_per_file": {"orders"},
    "agg_regr_builtins": {"events"},
    "win_lag_ignore_nulls": {"events"},
    "sql_semi_anti_join_syntax": {"orders"},
    "udtf_sql_registered": {"orders"},
    "stream_rate_source_resume": set(),  # source generates its own data
    "ts_downsample_lttb": {"events"},
    # round-6 additions
    "explode_outer_nulls": {"documents"},
    "ts_outlier_iqr": {"events"},
    "stat_chi_square_independence": {"events"},
    "graph_bipartite_copurchase": {"lineitem"},
    "llm_dedup_paragraph": {"documents"},
    "llm_rag_context_pack": {"documents"},
    "llm_curriculum_schedule": {"documents"},
    "llm_minhash_jaccard_estimate": {"documents"},
    "llm_readability_score": {"documents"},
    "llm_label_agreement_kappa": {"documents"},
    "ts_autocorr_lag": {"events"},
    "llm_zipf_fit": {"documents"},
    "type_map_pack": {"events"},
    "math_bround_even": {"orders"},
    "date_tz_convert": {"events"},
    "sql_global_temp_view": {"orders"},
    "ts_dow_hour_profile": {"events"},
    "llm_sim_mmr_rerank": {"embeddings"},
    "sql_order_by_all": {"orders"},
    "llm_embedding_pq_quantize": {"embeddings"},
    # round-6 second ring (§2.16)
    "stat_welch_ttest": {"events"},
    "stat_ks_two_sample": {"events"},
    "stat_mutual_information": {"events"},
    "stat_benford_first_digit": {"orders"},
    "stat_gini_coefficient": {"orders"},
    "graph_clustering_coefficient": {"lineitem"},
    "graph_assortativity_degree": {"lineitem"},
    "ts_peak_detect_local": {"events"},
    "win_percent_rank_cume_dist": {"orders"},
    "llm_code_detect_heuristic": {"documents"},
    "type_try_cast_surface": {"events"},
    "join_mark_exists_flag": {"orders"},
    "stat_bootstrap_poisson_ci": {"events"},
    "stat_ols_two_feature": {"events"},
    "ts_theil_sen_slope": {"events"},
    "ts_acf_multi_lag": {"events"},
    "llm_lm_score_kneser_ney": {"documents"},
    "ts_xcorr_lead_lag": {"events"},
    "ts_burstiness_fano": {"events"},
    "graph_reciprocity": {"lineitem"},
    "llm_sample_temperature_weights": {"documents"},
    "llm_cluster_topic_terms": {"documents", "embeddings"},
    "sql_scripting_block": {"orders"},
    "agg_theta_sketch_algebra": {"events"},
    "stat_runs_test_wald_wolfowitz": {"events"},
    "stat_kendall_tau": {"events"},
    "stat_spearman_rho": {"events"},
    "graph_modularity_brand": {"lineitem"},
    "llm_eval_token_f1": {"documents"},
    "stream_chained_window_agg": {"events"},
    "seq_markov_transitions": {"events"},
    "er_sorted_neighborhood_pairs": set(),  # customer is a 1x dim
    "win_cumsum_reset_on_flag": {"events"},
    "stat_anova_oneway_f": {"events"},
    "llm_embedding_matryoshka_recall": {"embeddings"},
    "graph_hits_fixed": {"lineitem"},
    "udtf_arrow_optimized": {"documents"},
    "dq_expectations_report": {"orders"},
    "agg_weighted_median": {"lineitem"},
    "stat_two_proportion_z": {"events"},
    "win_rolling_slope": {"events"},
    "llm_loss_mask_spans": {"documents"},
    "llm_sim_lsh_mllib": {"embeddings"},
    "llm_sim_ann_ivf": {"embeddings"},
    "llm_sim_lsh_approx": {"embeddings"},
    "ts_forecast_eval_wape": {"events"},
    "ts_hampel_filter": {"events"},
    "ts_pinball_loss_eval": {"events"},
    "dq_column_entropy_profile": {"events"},
    "ts_dtw_banded_pairs": {"events"},
    "agg_bitmap_distinct_rollup": {"events"},
    # round-6 third ring (§2.17)
    "stat_mann_whitney_u": {"events"},
    "stat_cohens_d": {"events"},
    "stat_cramers_v": {"events"},
    "stat_brown_forsythe": {"events"},
    "graph_adamic_adar_linkpred": {"lineitem"},
    "ts_sax_symbolize": {"events"},
    "seq_funnel_time_to_convert": {"events"},
    "llm_sentiment_lexicon": {"documents"},
    "llm_eval_rouge2": {"documents"},
    "stat_permutation_test": {"events"},
    "llm_eval_retrieval_mrr": {"embeddings"},
    "dq_distribution_drift_psi": {"events"},
    "geo_grid_neighbor_join": {"customer"},  # entity probe: customer IS the fact
    "geo_knn_within_radius": {"customer"},  # entity probe: customer IS the fact
    "stat_bh_fdr_permutation": {"events"},
    "llm_feature_hashing": {"documents"},
    "ml_target_encode_kfold": {"orders"},
    "ml_roc_auc_exact": {"events"},
    "ml_confusion_threshold_sweep": {"events"},
    "seq_path_topk": {"events"},
    "ml_cv_auc_per_fold": {"events"},
    "ts_seasonal_strength": {"events"},
    "source_jsonl_gzip": {"documents"},
    "stat_chi_square_gof_dow": {"orders"},
    "agg_cms_width_audit": {"events"},
    "llm_safety_pattern_filter": {"documents"},
    "llm_pipeline_curation_v2": {"documents"},
    "ts_bitemporal_asof_revision": {"events"},
    "udtf_table_argument": {"events"},
    "ml_lift_gains_table": {"events"},
    "llm_pack_budget_sweep": {"documents"},
    "stat_mde_power_binary": {"events"},
    "date_fiscal_quarter": {"orders"},
    "seq_attribution_first_last": {"events"},
    "seq_growth_accounting_weekly": {"events"},
    "win_interval_union_length": {"events"},
    "agg_concentration_hhi_crk": {"orders"},
    "ts_haar_energy_levels": {"events"},
    "stat_entropy_rate_markov": {"events"},
    "stat_diff_in_diff_2x2": {"events"},
    "llm_multimodal_interleaved_pack": {"documents"},
    "scan_partition_spec_evolution": {"events"},
    "llm_uncertainty_sampling": {"documents"},
    "ts_gap_log_histogram": {"events"},
    "sql_incremental_mv_refresh": {"events"},
    "er_blocking_quality_report": {"customer"},  # entity probe: customer IS the fact
    "agg_hierarchy_share_rollup": {"orders"},
    "stat_proportion_ci_wilson": {"events"},
    "ml_brier_score_rank": {"events"},
    "llm_rag_groundedness_eval": {"documents"},
    "stream_drift_bucket_counts": {"events"},
    "seq_window_funnel_strict": {"events"},
    "seq_rfm_segments": {"events"},
    "stat_interrupted_time_series": {"events"},
    "date_retail_445_calendar": {"orders"},
    "seq_bounce_rate_daily": {"events"},
    "agg_pareto_cutoff": {"orders"},
    "agg_new_vs_returning_daily": {"events"},
    "win_max_drawdown": {"events"},
    "agg_cohort_ltv_curve": {"events"},
    "stat_ljung_box_q": {"events"},
    "ml_learning_curve_auc": {"events"},
    "graph_personalized_pagerank": {"lineitem"},
    "agg_abc_classification": {"lineitem"},
    "ts_yoy_growth": {"orders"},
    "stat_g_test_cells": {"events"},
    "win_peer_group_zscore": set(),   # customer is a 1x dim
    "win_ytd_running_total": {"orders"},
    "ts_seasonal_index_monthly": {"orders"},
    "seq_reorder_cadence": {"orders"},
    "agg_repeat_purchase_rate": {"orders"},
    "stat_sign_test_paired": {"events"},
    "stat_wilcoxon_signed_rank": {"events"},
    "stat_friedman_test": {"events"},
    "ts_permutation_entropy": {"events"},
    "stat_kruskal_wallis": {"events"},
    "win_skyline_2d": {"orders"},
    "stat_mood_median_test": {"events"},
    "graph_disparity_backbone": {"lineitem"},
    "stat_fisher_z_corr_ci": {"events"},
    # round-7 ring (§2.18)
    "ml_pr_auc_exact": {"events"},
    "ml_calibration_reliability": {"events"},
    "stat_jarque_bera": {"events"},
    "stat_mcnemar_paired": {"events"},
    "stat_hodges_lehmann_shift": {"events"},
    "stat_cliffs_delta": {"events"},
    "stat_dunn_posthoc_bh": {"events"},
    "ts_spectral_dft_energy": {"events"},
    "seq_survival_km": {"events"},
    "dq_referential_integrity": {"lineitem", "orders", "events"},
    "dq_freshness_lag": {"events"},
    # round-9 probe additions (VERDICT r8 ask #7: the r7b shapes without
    # a probe row)
    "stat_meta_fixed_effect_pool": {"events"},
    "dq_schema_drift_report": {"events"},  # parquet-footer metadata read
    "dq_volume_anomaly_daily": {"events"},
    "ml_cost_curve_threshold": {"events"},
    "llm_eval_bleu_corpus": {"documents"},
    "llm_sample_ares_topk": {"documents"},
    "llm_eval_pairwise_winrate": {"documents"},
    "graph_katz_centrality_fixed": {"lineitem"},
    "sql_group_by_ordinal": {"lineitem"},
    # round-7 second ring
    "scan_txlog_snapshot": {"orders"},
    "llm_tool_call_parse": {"documents"},
    "llm_vocab_growth_heaps": {"documents"},
    "ts_mase_eval": {"events"},
    "stat_cochran_q": {"events"},
    "ml_roc_auc_delong_ci": {"events"},
    "dq_pk_uniqueness": {"lineitem", "orders", "events", "documents"},
    "agg_trimmed_winsorized_mean": {"events"},
    # round-7 third ring
    "seq_market_basket_rules": {"lineitem"},
    "llm_topic_coherence_umass": {"documents"},
    "llm_self_bleu_diversity": {"documents"},
    "stat_ks_uniform_md5_audit": {"events"},
    "stat_poisson_dispersion": {"events"},
    "dq_reconciliation_orders_lineitem": {"lineitem", "orders"},
    "sql_natural_using_join": {"orders"},
    "agg_median_builtin": {"events"},
    "ts_bollinger_bands": {"events"},
    # round-7 fourth ring
    "stat_tost_equivalence": {"events"},
    "stat_sprt_daily": {"events"},
    "ml_optimal_f1_threshold": {"events"},
    "llm_eval_ece": {"events"},
    "llm_dedup_whitespace_casefold": {"documents"},
    "graph_rich_club_coefficient": {"lineitem"},
    # round-7 fifth ring
    "stream_sprt_monitor": {"events"},
    "llm_sample_ares_per_group": {"documents"},
    "seq_hazard_rate_daily": {"events"},
    # round-7 sixth ring
    "llm_mixture_kl_report": {"documents"},
    "llm_dedup_template_prefix": {"documents"},
    "llm_eval_distinct_n": {"documents"},
    # round-7 rings 10-16 risky shapes (VERDICT r7 ask #6, 100x tier)
    "graph_closeness_harmonic_3hop": {"lineitem"},
    "llm_select_top_quality_budget": {"documents"},
    "er_fellegi_sunter_scores": {"customer"},  # entity probe: customer IS the fact
    "llm_watermark_greenlist_detect": {"documents"},
    "graph_avg_neighbor_degree": {"lineitem"},
    # round-8 rewritten plans (probe the NEW shapes)
    "llm_eval_ndcg_at10": {"embeddings"},
    "dq_cardinality_drift_report": {"events"},
}


def tables_needed(queries) -> set[str]:
    need: set[str] = set()
    for q in queries:
        need |= QUERY_TABLES.get(q, set(SHIFTS))
    return need


def materialize(spark, n_copies: int, tables: set[str] | None = None) -> str:
    out = f"/tmp/lts_scale_{n_copies}x"
    os.makedirs(out, exist_ok=True)
    for t, keys in SHIFTS.items():
        if tables is not None and t not in tables:
            continue
        if t == "customer" and tables is None:
            continue  # customer shifts only on explicit request
        dst = os.path.join(out, f"{t}.parquet")
        if t == "customer" and not os.path.exists(
                os.path.join(out, ".customer_scaled")):
            # an earlier run may have left the 1x dim copy here — a
            # scaled run must not silently reuse it
            import shutil
            shutil.rmtree(dst, ignore_errors=True)
            open(os.path.join(out, ".customer_scaled"), "w").write("1")
        if os.path.exists(os.path.join(dst, "_SUCCESS")):
            continue  # per-table resume: a later run can add more tables
        src = load_table(spark, t, SRC)  # ns-timestamp shim lives here
        if t == "events":
            # write ts as TIMESTAMP_NTZ micros like the real testdata:
            # a plain TimestampType write comes out INT96, whose footer
            # pyarrow reports as ns — events_ts_unit would then take the
            # nanosAsLong path and fail the read back
            src = src.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        copies = []
        for i in range(n_copies):
            c = src
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * KEY_BASE))
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.write.mode("overwrite").parquet(dst)
    for t in DIMS:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(os.path.join(dst, "_SUCCESS")):
            load_table(spark, t, SRC).write.mode("overwrite").parquet(dst)
    return out


def drain(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sel = sys.argv[2:]  # optional: probe only the named queries
    # force llm_dedup_cluster onto the distributed pointer-jumping path:
    # the probe's job is the at-scale algorithm's curve, not the bounded
    # driver union-find fastpath a 10x candidate graph would still fit
    os.environ.setdefault("SPARK_GRAFT_CC_FASTPATH_MAX", "0")
    spark = get_spark("lts-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    big = materialize(spark, n_copies, tables_needed(sel or PROBE_QUERIES))
    qs = registry.all_queries()
    print(f"scale probe: sf0.1 vs {n_copies}x ({big})")
    for name in (sel or PROBE_QUERIES):
        fn = qs[name]
        row = [name]
        for sf_dir in (SRC, big):
            drain(fn(spark, sf_dir))               # cold
            warm = []
            for _ in range(2):
                t0 = time.perf_counter()
                drain(fn(spark, sf_dir))
                warm.append(time.perf_counter() - t0)
            row.append(round(min(warm), 3))
        ratio = round(row[2] / row[1], 1) if row[1] else float("nan")
        print(f"RESULT {row[0]}: sf0.1={row[1]}s {n_copies}x={row[2]}s "
              f"ratio={ratio}")


if __name__ == "__main__":
    main()
