"""Operator/query registry — the single source of truth behind
``__spark_entry__.py``'s ``queries()`` / ``oracle_sql()`` (driver contract).

Each operator from SURVEY.md §2 registers itself here with a Spark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, the equivalent
DuckDB oracle SQL over the pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings). Ops without an oracle get the driver's weaker rows-only check
(streaming semantics, approx algorithms).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Registered:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


_REGISTRY: dict[str, Registered] = {}

# operator modules; importing them populates the registry
_MODULES = (
    "lambdatotheslaughter_spark.operators.scans",
    "lambdatotheslaughter_spark.operators.filters",
    "lambdatotheslaughter_spark.operators.joins",
    "lambdatotheslaughter_spark.operators.aggregates",
    "lambdatotheslaughter_spark.operators.windows",
    "lambdatotheslaughter_spark.operators.sorts",
    "lambdatotheslaughter_spark.operators.setops",
    "lambdatotheslaughter_spark.operators.functions",
    "lambdatotheslaughter_spark.operators.streaming_twins",
    "lambdatotheslaughter_spark.operators.llm",
    "lambdatotheslaughter_spark.operators.udfs",
    "lambdatotheslaughter_spark.operators.extras",
    "lambdatotheslaughter_spark.operators.skew",
    "lambdatotheslaughter_spark.operators.graph",
    "lambdatotheslaughter_spark.operators.corpus",
)

_loaded = False

# Driver-slot ordering. The driver's CORRECTNESS report verifies the FIRST
# 50 entries of ``queries()`` (dict insertion order) per round. Rounds 1-4
# rotated four disjoint windows: the relational core (r1), the
# streaming/udf/llm families (r2), SS2.12's round-2 additions (r3), and the
# first fifty of the round-3 additions (r4) -- 192 distinct keys
# driver-verified across r1-r4 with ZERO hash failures. ROUND 5 (this list)
# closes the coverage story: the 46 oracled keys that have never held a
# driver slot -- the 11 round-3 spill keys first, then the three most
# algorithmically novel round-4 families (survivorship / semantic dedup /
# triangle count) per VERDICT r4 #5, then the remaining 32 round-4
# additions -- followed by 4 re-confirmation backfill slots on the
# most-touched r1-era paths (agg_pricing_summary, join_multiway_star,
# llm_dedup_fuzzy_minhash, join_asof_event_order). After this window EVERY
# oracled key in the repo owns at least one hard CORRECTNESS row.
# ROUND 6 ROTATION PLAN: the 30 round-5 additions (all oracled) become
# the never-slotted set once this window lands — rotate them in next:
# sub_any_all_rewrite, agg_count_if_any_value, ts_rolling_corr,
# ts_downsample_stride, graph_connected_components,
# graph_jaccard_neighbors, llm_sample_fixed_k_per_group,
# llm_eval_ngram_recall, llm_dedup_bag_of_words,
# sink_parquet_bloom_filter, scan_bucket_pruning,
# scan_nested_struct_pruning, sql_execute_immediate, llm_rank_fusion_rrf,
# llm_corpus_report, agg_gini_impurity, ts_trend_slope,
# llm_hard_negative_mining, llm_format_chat_template,
# llm_dpo_pair_builder, graph_k_core, llm_ngram_novelty,
# ts_gap_detection, ts_forward_fill, sql_scalar_function_ddl,
# win_range_between_numeric, catalog_analyze_stats,
# scan_csv_permissive_corrupt, sql_session_variables,
# str_hash_functions, llm_style_fingerprint, llm_boilerplate_share,
# llm_span_corruption, llm_retrieval_bm25_topk,
# ts_cumulative_distinct_users, date_business_days, set_union_by_name,
# sql_group_by_all, sql_window_clause_named, llm_html_strip,
# llm_embedding_truncate_renorm, llm_fim_transform,
# sink_csv_roundtrip_quotes, sql_values_inline_table,
# sql_lateral_view_explode, sql_distribute_sort_by, sql_join_hints,
# date_iso_week_quarter, ts_time_weighted_avg, sql_join_hint_merge,
# llm_minhash_bbit, win_topk_with_ties, sql_identifier_clause,
# sql_column_defaults, llm_lsh_tuning_report, sql_star_except,
# agg_filter_clause, scan_nested_predicate_pushdown,
# source_partition_discovery_types, scan_aggregate_pushdown,
# llm_dedup_cross_shard_merge, sql_table_function_range, stat_crosstab,
# sql_pivot_clause, sql_unpivot_clause, sql_hint_rebalance,
# scan_fieldid_rename_evolution, sink_max_records_per_file,
# agg_regr_builtins, win_lag_ignore_nulls, sql_semi_anti_join_syntax,
# udtf_sql_registered, stream_rate_source_resume
# (73 names — the 50-slot window takes the first 50 in this order; the
# twenty-three spills roll to round 7 with the re-confirmation backfill,
# the same pattern the round-3 spill keys followed). Update
# tests/test_survey_coverage.py's pinned window when rotating.
# Rows-only-by-design ops (llm_sim_lsh_approx, llm_sim_ann_ivf,
# llm_multimodal_decode, agg_approx_distinct, agg_distinct_sketch_rollup,
# scan_metadata_columns, llm_tokenizer_bpe_train, llm_tokenizer_bpe_apply,
# agg_quantile_sketch, agg_sketch_set_intersection,
# llm_embedding_pca_project, agg_sliding_distinct_hll,
# ts_downsample_lttb) are deliberately NOT
# listed -- a driver slot adds nothing over their pytest
# determinism/recall/tolerance gates.
# Update tests/test_survey_coverage.py's pinned window when rotating.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # --- the 11 round-3 spill keys (never slotted; oldest debt first) ---
    "udtf_dynamic_schema", "source_python_datasource_stream",
    "stream_session_window_dynamic_gap", "sql_parameterized",
    "df_transpose", "source_binary_files", "scan_ignore_corrupt_files",
    "llm_split_train_val_test", "scan_vacuum_orphan_files",
    "sink_stream_to_table", "llm_dedup_url_canonical",
    # --- highest-risk round-4 families first (VERDICT r4 #5) ---
    "llm_dedup_survivorship", "llm_dedup_semantic", "graph_triangle_count",
    # --- remaining 32 round-4 additions, registration order ---
    "llm_fingerprint_winnow", "llm_index_inverted_postings",
    "llm_ngram_topk_per_lang", "llm_vocab_coverage", "llm_cooccurrence_pmi",
    "llm_embedding_centroids", "ts_mom_growth", "udf_cogrouped_map",
    "join_asof_forward", "ts_seasonal_decompose_ma", "win_pct_of_total",
    "llm_sample_importance_weighted", "agg_mad_robust",
    "sink_jsonl_roundtrip", "llm_prompt_template_detect",
    "agg_skew_kurt_exact", "agg_hist_fixed_buckets", "udf_pandas_iter",
    "udaf_grouped_agg_pandas", "udf_sql_registered",
    "llm_shuffle_deterministic", "llm_mix_epoch_upsample",
    "llm_embedding_dim_stats", "graph_bfs_distance", "agg_weighted_stats",
    "ts_cusum_drift", "llm_filter_blocklist", "llm_sample_fixed_k",
    "join_fuzzy_levenshtein_blocked", "graph_degree_histogram",
    "udf_apply_in_arrow", "agg_percentile_disc_exact",
    # --- 4 re-confirmation backfill slots (r1-era rows on the
    #     most-touched code paths since; VERDICT r4 #8) ---
    "agg_pricing_summary", "join_multiway_star", "llm_dedup_fuzzy_minhash",
    "join_asof_event_order",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under SURVEY.md §2's key naming."""
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query key {name!r}")
        _REGISTRY[name] = Registered(name=name, fn=fn, oracle=oracle,
                                     doc=(fn.__doc__ or "").strip())
        return fn
    return deco


def _load() -> None:
    global _loaded
    if not _loaded:
        for mod in _MODULES:
            importlib.import_module(mod)
        _loaded = True


def _ordered() -> list[Registered]:
    """Registry entries with _DRIVER_PRIORITY names first (in list order),
    then everything else in registration order."""
    _load()
    prio = [_REGISTRY[n] for n in _DRIVER_PRIORITY if n in _REGISTRY]
    listed = set(_DRIVER_PRIORITY)
    rest = [r for n, r in _REGISTRY.items() if n not in listed]
    return prio + rest


def all_queries() -> dict[str, QueryFn]:
    return {r.name: r.fn for r in _ordered()}


def all_oracles() -> dict[str, str]:
    return {r.name: r.oracle for r in _ordered() if r.oracle is not None}


def get(name: str) -> Registered:
    _load()
    return _REGISTRY[name]
