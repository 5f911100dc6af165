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
)

_loaded = False

# Driver-slot ordering. The driver's CORRECTNESS report verifies the FIRST
# 50 entries of ``queries()`` (dict insertion order) per round. Round 1
# covered the relational core (scans/filters/joins/aggs/windows/sorts/
# setops/functions head) — all green. This list rotates the OTHER 50
# oracled queries (functions tail, streaming, udfs, llm, skew, extras)
# into the verified window for round 2; everything else follows in
# registration order and stays covered by tests/test_oracle_parity.py,
# the in-repo replica of the driver's DuckDB check. The three
# rows-only-by-design ops (llm_sim_lsh_approx, llm_sim_ann_ivf,
# llm_multimodal_decode) are deliberately NOT listed — a driver slot adds
# nothing over their pytest determinism/recall gates.
#
# ROUND 3 ROTATION PLAN: swap this list for the queries that have never
# held a driver slot — everything registered during round 2: source_jsonl,
# source_csv, source_orc, sink_sorted_data_skipping, type_decimal_arith,
# type_map_aggregate, type_interval_arith, stream_interval_join,
# stream_upsert_latest, agg_cube_grouping_id, agg_rollup, agg_minmax_by,
# agg_corr_covar, agg_bitwise, agg_boolean, win_range_interval,
# explode_posexplode, str_regexp_extract_all, llm_sample_stratified,
# llm_contamination_ngram, llm_pack_sequences, llm_pii_scrub,
# llm_repetition_score, llm_domain_mix, llm_length_buckets,
# llm_sim_radius_search, llm_lm_score, llm_embedding_outliers,
# llm_bm25_rank, agg_boolean, set_intersect_all, set_except_all,
# type_variant_json, llm_token_entropy, llm_chunk_overlap,
# agg_multi_distinct, scan_schema_evolution,
# sink_dynamic_partition_overwrite, llm_multimodal_embed,
# join_null_safe_eq, udf_arrow_optimized, ts_interpolate_linear,
# win_streaks_islands, seq_pattern_match (~43 slots; backfill the rest
# with round-1 relational keys for re-confirmation). Update the pinned
# window test when rotating.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # functions tail (§2.7 collection/json ops)
    "array_ops", "arr_higher_order", "map_ops", "json_extract",
    "str_pad_translate",
    # streaming twins (§2.9 + §2.1 memory sink)
    "stream_tumbling_agg", "stream_sliding_agg", "stream_session_window",
    "stream_dedup", "stream_stateful_running", "stream_join_enrich",
    "stream_watermark_late", "sink_stream_console_memory",
    "stream_stateful_state_op",
    # UDF surface (§2.11)
    "udf_python_scalar", "udf_pandas_vectorized", "udaf_pandas_grouped",
    "udtf_explode_sessions",
    # LLM-data-pipeline family (§2.10 + training-data additions)
    "llm_dedup_exact", "llm_dedup_fuzzy_minhash", "llm_dedup_ngram_jaccard",
    "llm_dedup_simhash", "llm_dedup_embedding_cosine",
    "llm_sim_knn_bruteforce", "llm_text_stats", "llm_text_tfidf_top_terms",
    "llm_lang_partition_skew", "llm_multimodal_schema", "llm_lang_id",
    "llm_quality_score", "llm_token_count", "llm_fingerprint",
    "llm_sim_knn_per_query", "llm_pipeline_end_to_end", "llm_dedup_cluster",
    "llm_multimodal_frames",
    # physical-layout joins
    "join_skew_salted", "join_bucketed_colocated",
    # beyond-§2 extras
    "agg_percentiles", "agg_mode_deterministic", "pivot_wide",
    "unpivot_long", "sub_scalar", "sub_correlated", "win_percent_rank_cume",
    "ts_resample_gapfill", "ts_moving_avg", "sql_api_entry",
    "funnel_view_click_purchase", "retention_cohorts",
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
