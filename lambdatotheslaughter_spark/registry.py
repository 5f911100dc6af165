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
# 50 entries of ``queries()`` (dict insertion order) per round. Rounds 1-3
# rotated three disjoint windows through the relational core, the
# streaming/udf/llm families, and §2.12's round-2 additions — 143 distinct
# keys driver-verified across r1-r3 with zero hash failures. ROUND 4 (this
# list) rotates in the first FIFTY of the sixty-one oracled keys that were
# registered during round 3 and have never held a driver slot, in
# registration order. Everything else follows in registration order and
# stays covered by tests/test_oracle_parity.py, the in-repo replica of the
# driver's DuckDB check. Rows-only-by-design ops (llm_sim_lsh_approx,
# llm_sim_ann_ivf, llm_multimodal_decode, agg_approx_distinct,
# agg_distinct_sketch_rollup, scan_metadata_columns, llm_tokenizer_bpe_train,
# llm_tokenizer_bpe_apply, agg_quantile_sketch, agg_sketch_set_intersection,
# llm_embedding_pca_project, agg_sliding_distinct_hll) are deliberately NOT
# listed — a driver slot adds nothing over their pytest
# determinism/recall/tolerance gates.
#
# ROUND 5 ROTATION PLAN: the 11 round-3 keys that overfilled this window —
# udtf_dynamic_schema, source_python_datasource_stream,
# stream_session_window_dynamic_gap, sql_parameterized, df_transpose,
# source_binary_files, scan_ignore_corrupt_files, llm_split_train_val_test,
# scan_vacuum_orphan_files, sink_stream_to_table, llm_dedup_url_canonical —
# go first, then the NINE oracled round-4 additions (operators/corpus.py:
# llm_dedup_survivorship, llm_fingerprint_winnow,
# llm_index_inverted_postings, llm_ngram_topk_per_lang,
# llm_vocab_coverage, llm_cooccurrence_pmi, llm_embedding_centroids,
# plus graph_triangle_count and ts_mom_growth), then the EIGHT later
# round-4 keys (udf_cogrouped_map, join_asof_forward,
# ts_seasonal_decompose_ma, win_pct_of_total,
# llm_sample_importance_weighted, llm_dedup_semantic, agg_mad_robust,
# sink_jsonl_roundtrip, llm_prompt_template_detect, agg_skew_kurt_exact,
# agg_hist_fixed_buckets, udf_pandas_iter, udaf_grouped_agg_pandas,
# udf_sql_registered), then the SIX round-4 batch-3 keys
# (llm_shuffle_deterministic, llm_mix_epoch_upsample,
# llm_embedding_dim_stats, graph_bfs_distance, agg_weighted_stats,
# ts_cusum_drift), then the FOUR batch-4 keys (llm_filter_blocklist,
# llm_sample_fixed_k, join_fuzzy_levenshtein_blocked,
# graph_degree_histogram, udf_apply_in_arrow,
# agg_percentile_disc_exact), then re-confirmation backfill from the
# r1/r2 windows. After r5 every oracled key in the repo has at least one
# hard CORRECTNESS row (11 + 35 round-4 keys = 46, leaving 4 backfill
# slots).
# Update tests/test_survey_coverage.py's pinned window when rotating.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # sources / sinks / physical layout (round-3 additions)
    "sink_compaction_small_files", "scan_time_travel_manifest",
    "agg_sliding_distinct_users", "type_struct_nested",
    "llm_dedup_incremental", "ts_ohlc_resample", "scan_observe_quality",
    "scd2_dimension_merge", "sub_exists_not_exists",
    "llm_dedup_incremental_fuzzy", "join_runtime_bloom_filter",
    "str_collation_lcase", "join_interval_binned", "cdc_apply_changelog",
    "agg_listagg_ordered", "win_moving_median", "str_url_parse",
    "sub_in_not_in", "join_lateral_topn", "ts_ewma_bounded",
    "math_try_arith", "llm_lm_score_bigram", "source_text_lines",
    "win_nth_value", "sql_report_cte_chain", "llm_multimodal_pipeline",
    # late-round-3 additions
    "scan_position_deletes", "sink_zorder_interleave",
    "graph_pagerank_fixed", "agg_freq_sketch_cms", "llm_dedup_containment",
    "ts_anomaly_zscore", "llm_embed_quantize_int8", "llm_sim_knn_quantized",
    "stream_topk_per_window", "llm_dedup_span_exact",
    "llm_dedup_bloom_prefilter", "stream_interval_join_outer",
    "scan_incremental_manifest_diff", "join_asof_nearest_tolerance",
    "scan_count_metadata_only", "scan_cached_view_reuse",
    "join_scd2_point_in_time", "llm_quality_filter_stack",
    "scan_dynamic_partition_pruning", "llm_lang_id_confusion",
    "sql_recursive_cte", "sql_pipe_syntax", "source_python_datasource",
    "udf_map_in_arrow",
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
