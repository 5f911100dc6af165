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
    "lambdatotheslaughter_spark.operators.stats",
)

_loaded = False

# Driver-slot ordering. The driver's CORRECTNESS report verifies the FIRST
# 50 entries of ``queries()`` (dict insertion order) per round. Rounds 1-5
# rotated five disjoint windows -- 238 distinct keys driver-verified with
# ZERO hash failures. ROUND 6 (this list): 46 first-time slots drawn from
# the 75 oracled keys that have never held a driver slot (the 73 round-5
# additions plus scan_metadata_columns and agg_distinct_sketch_rollup,
# both promoted from rows-only to value-exact oracles this round per
# VERDICT r5 #5) + 4 re-confirmation backfill slots on the EXACT paths
# changed this round: the LSH candidate-verify join grew a size dispatch
# (llm.py _verified_near_dup_pairs), touching llm_dedup_fuzzy_minhash,
# llm_pipeline_end_to_end, llm_dedup_cluster and
# llm_dedup_incremental_fuzzy. First-time ordering per VERDICT r5 #1: the
# four families a user hits first (cross-shard merge, ngram recall, hard
# negatives, LSH tuning), then the three keys CHANGED this round
# (sql_column_defaults sf_tag fix + the two oracle promotions), then the
# remaining never-slotted keys in round-5 registration order.
# ROUND 7 ROTATION PLAN -- the 29 spills, in this order:
# llm_fim_transform, sink_csv_roundtrip_quotes, sql_values_inline_table,
# sql_lateral_view_explode, sql_distribute_sort_by, sql_join_hints,
# date_iso_week_quarter, ts_time_weighted_avg, sql_join_hint_merge,
# llm_minhash_bbit, win_topk_with_ties, sql_identifier_clause,
# sql_star_except, agg_filter_clause, scan_nested_predicate_pushdown,
# source_partition_discovery_types, scan_aggregate_pushdown,
# sql_table_function_range, stat_crosstab, sql_pivot_clause,
# sql_unpivot_clause, sql_hint_rebalance, scan_fieldid_rename_evolution,
# sink_max_records_per_file, agg_regr_builtins, win_lag_ignore_nulls,
# sql_semi_anti_join_syntax, udtf_sql_registered,
# stream_rate_source_resume
# (29 names; plus the round-6 additions in registration order -- the 23
# §2.15 keys (22 oracled + llm_embedding_pq_quantize rows-only), then
# the 49 §2.16 keys (47 oracled + llm_sim_lsh_mllib and
# ts_dtw_banded_pairs rows-only; see the SURVEY tables for the
# authoritative order), then the 80 §2.17 keys (all oracled):
# 29 + 22 + 47 + 80 = 178 never-slotted oracled keys --
# the round-7 window takes the first 50 (the 29 spills + the oldest 21
# §2.15 keys), the rest roll to round 8 with any round-7 additions).
# Update tests/test_survey_coverage.py's pinned window when rotating.
# Rows-only-by-design ops (the 14: llm_sim_lsh_approx, llm_sim_ann_ivf,
# llm_embedding_pq_quantize,
# llm_multimodal_decode, agg_approx_distinct, llm_tokenizer_bpe_train,
# llm_tokenizer_bpe_apply, agg_quantile_sketch,
# agg_sketch_set_intersection, llm_embedding_pca_project,
# agg_sliding_distinct_hll, ts_downsample_lttb, llm_sim_lsh_mllib,
# ts_dtw_banded_pairs) are deliberately NOT
# listed -- a driver slot adds nothing over their pytest
# determinism/recall/tolerance gates.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # --- 4 priority families (VERDICT r5 #1 names these first) ---
    "llm_dedup_cross_shard_merge", "llm_eval_ngram_recall",
    "llm_hard_negative_mining", "llm_lsh_tuning_report",
    # --- 3 keys changed this round (ADVICE fix + oracle promotions) ---
    "sql_column_defaults", "scan_metadata_columns",
    "agg_distinct_sketch_rollup",
    # --- 39 more never-slotted keys, round-5 registration order ---
    "sub_any_all_rewrite", "agg_count_if_any_value", "ts_rolling_corr",
    "ts_downsample_stride", "graph_connected_components",
    "graph_jaccard_neighbors", "llm_sample_fixed_k_per_group",
    "llm_dedup_bag_of_words", "sink_parquet_bloom_filter",
    "scan_bucket_pruning", "scan_nested_struct_pruning",
    "sql_execute_immediate", "llm_rank_fusion_rrf", "llm_corpus_report",
    "agg_gini_impurity", "ts_trend_slope", "llm_format_chat_template",
    "llm_dpo_pair_builder", "graph_k_core", "llm_ngram_novelty",
    "ts_gap_detection", "ts_forward_fill", "sql_scalar_function_ddl",
    "win_range_between_numeric", "catalog_analyze_stats",
    "scan_csv_permissive_corrupt", "sql_session_variables",
    "str_hash_functions", "llm_style_fingerprint", "llm_boilerplate_share",
    "llm_span_corruption", "llm_retrieval_bm25_topk",
    "ts_cumulative_distinct_users", "date_business_days",
    "set_union_by_name", "sql_group_by_all", "sql_window_clause_named",
    "llm_html_strip", "llm_embedding_truncate_renorm",
    # --- 4 re-confirmation backfill slots: every key whose plan changed
    #     with this round's LSH verify-join size dispatch ---
    "llm_dedup_fuzzy_minhash", "llm_pipeline_end_to_end",
    "llm_dedup_cluster", "llm_dedup_incremental_fuzzy",
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
