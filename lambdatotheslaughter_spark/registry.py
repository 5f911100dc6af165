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
# ROUND 11 window -- drain window #4 (VERDICT r10 ask #1): 50 slots, ALL
# first-time oracled keys, cut straight from ``python tools/rotation.py``'s
# 65-key never-slotted pool in registration order. NO rows-only slots this
# round -- VERDICT r10 wrong #1 ("the artifact cannot distinguish 'clean
# rows-only' from 'broken' ... don't seat the remaining nine; finish the
# oracled drain first"), so _ROWS_ONLY_SLOTS is empty and the r10 trio is
# retired from tools/rotation.py BACKFILL. Targets: CORRECTNESS_r11 50/50
# green all-first-time, union >= 531 oracled driver-green, never-slotted
# backlog = 15 (the remainder listed by tools/rotation.py; round 12
# finishes the drain). Addition freeze stays in force -- zero new keys.
_ROWS_ONLY_SLOTS: tuple[str, ...] = ()

_DRIVER_PRIORITY: tuple[str, ...] = (
    'seq_survival_km', 'dq_referential_integrity', 'dq_freshness_lag',
    'llm_sample_ares_topk', 'llm_eval_pairwise_winrate',
    'graph_katz_centrality_fixed', 'sql_group_by_ordinal',
    'llm_tool_call_parse', 'llm_vocab_growth_heaps', 'ts_mase_eval',
    'stat_cochran_q', 'dq_pk_uniqueness', 'agg_trimmed_winsorized_mean',
    'seq_market_basket_rules', 'llm_topic_coherence_umass',
    'llm_self_bleu_diversity', 'stat_ks_uniform_md5_audit',
    'stat_poisson_dispersion', 'dq_reconciliation_orders_lineitem',
    'sql_natural_using_join', 'agg_median_builtin', 'ts_bollinger_bands',
    'stat_tost_equivalence', 'stat_sprt_daily', 'ml_optimal_f1_threshold',
    'llm_eval_ece', 'llm_dedup_whitespace_casefold',
    'graph_rich_club_coefficient', 'llm_sample_ares_per_group',
    'seq_hazard_rate_daily', 'llm_mixture_kl_report',
    'llm_dedup_template_prefix', 'llm_eval_distinct_n',
    'stat_cochran_armitage_trend', 'stat_bartlett_test',
    'stat_durbin_watson', 'ts_changepoint_cusum_argmax',
    'ml_mcc_threshold_sweep', 'dq_cross_field_consistency',
    'seq_interpurchase_quantiles', 'ts_hurst_rs',
    'graph_label_propagation_sync', 'stat_breusch_pagan',
    'ts_dickey_fuller_unit_root', 'graph_closeness_harmonic_3hop',
    'llm_hapax_ratio_per_source', 'agg_geometric_harmonic_mean',
    'dq_schema_drift_report', 'ts_granger_lag1', 'ml_cost_curve_threshold',
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
