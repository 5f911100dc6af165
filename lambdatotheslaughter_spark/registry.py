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
    "lambdatotheslaughter_spark.operators.round7",
    "lambdatotheslaughter_spark.operators.round7b",
)

_loaded = False

# Driver-slot ordering. The driver's CORRECTNESS report verifies the FIRST
# 50 entries of ``queries()`` (dict insertion order) per round. Rounds 1-6
# rotated six disjoint windows -- 285 keys driver-checked, zero hash
# failures. This list is NOT hand-counted (the r5/r6 bookkeeping nit):
# ``python tools/rotation.py`` derives the never-slotted oracled pool from
# the CORRECTNESS_r*.json union, and ``tools/rotation.py --check`` (run by
# tests/test_survey_coverage.py) fails if any slot below wastes a round on
# an already-verified key.
#
# ROUND 9 window -- drain window #2 (VERDICT r8 ask #1): 50 slots, ALL
# first-time, cut straight from ``python tools/rotation.py``'s 162-key
# never-slotted pool in registration order (oldest rings first: the r5/r6
# sql/er/win/agg/ts/seq rings, the graph analytics ring, then the oldest
# llm-curation ring). Addition freeze stays in force — zero new keys this
# round. After this window drains, ~112 oracled keys remain unslotted
# (~2.2 more windows at 50/round); regenerate with tools/rotation.py when
# rotating.
# Rows-only-by-design ops (12; each pytest-gated in test_llm_quality.py /
# test_survey_coverage.py's allowlist) are deliberately never listed -- a
# driver slot adds nothing over their determinism/recall/tolerance gates.
_DRIVER_PRIORITY: tuple[str, ...] = (
    'sql_scripting_block', 'er_sorted_neighborhood_pairs',
    'win_cumsum_reset_on_flag', 'agg_weighted_median', 'win_rolling_slope',
    'ts_forecast_eval_wape', 'ts_hampel_filter', 'ts_pinball_loss_eval',
    'dq_column_entropy_profile', 'ts_sax_symbolize',
    'seq_funnel_time_to_convert', 'seq_path_topk', 'ts_seasonal_strength',
    'ts_bitemporal_asof_revision', 'seq_attribution_first_last',
    'seq_growth_accounting_weekly', 'win_interval_union_length',
    'ts_haar_energy_levels', 'stat_entropy_rate_markov',
    'ts_gap_log_histogram', 'sql_incremental_mv_refresh',
    'er_blocking_quality_report', 'agg_hierarchy_share_rollup',
    'seq_bounce_rate_daily', 'agg_new_vs_returning_daily',
    'win_max_drawdown', 'agg_cohort_ltv_curve', 'stat_ljung_box_q',
    'ts_yoy_growth', 'win_peer_group_zscore', 'win_ytd_running_total',
    'ts_seasonal_index_monthly', 'agg_repeat_purchase_rate',
    'ts_permutation_entropy', 'graph_bipartite_copurchase',
    'graph_clustering_coefficient', 'graph_assortativity_degree',
    'graph_reciprocity', 'graph_modularity_brand', 'graph_hits_fixed',
    'graph_adamic_adar_linkpred', 'graph_personalized_pagerank',
    'llm_fim_transform', 'llm_dedup_paragraph', 'llm_rag_context_pack',
    'llm_minhash_jaccard_estimate', 'llm_readability_score',
    'llm_label_agreement_kappa', 'llm_zipf_fit', 'llm_sim_mmr_rerank',
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
