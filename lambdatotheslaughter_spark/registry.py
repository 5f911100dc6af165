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
# ROUND 10 window -- drain window #3 (VERDICT r9 asks #1 + #6): 50 slots,
# 47 first-time oracled keys cut straight from ``python
# tools/rotation.py``'s 112-key never-slotted pool in registration order
# (oldest rings first: the llm-curation/eval ring, then the stats ring),
# PLUS 3 rows-only-by-design slots (VERDICT r9 ask #6: "ensure the next
# window includes agg_approx_distinct and a couple of the 11 other
# rows-only keys so the driver log shows green rows-only rows instead of
# the stale r01 no_oracle line"). Asks #1 and #6 conflict at 50 slots —
# #1's "union >= 484 / backlog <= 62" arithmetic assumes all 50 slots are
# first-time oracled; honoring #6's explicit instruction costs 3 oracled
# slots, so the r10 targets become union >= 481 / backlog <= 65 (still
# two windows from fully drained). Addition freeze stays in force — zero
# new keys this round.
# The 3 rows-only slots are declared in _ROWS_ONLY_SLOTS below and in
# tools/rotation.py BACKFILL so both waste-checks stay generated, not
# hand-waved.
_ROWS_ONLY_SLOTS: tuple[str, ...] = (
    'agg_approx_distinct', 'agg_quantile_sketch', 'ts_downsample_lttb',
)

_DRIVER_PRIORITY: tuple[str, ...] = (
    'llm_code_detect_heuristic', 'llm_sample_temperature_weights',
    'llm_cluster_topic_terms', 'llm_eval_token_f1', 'llm_loss_mask_spans',
    'llm_sentiment_lexicon', 'llm_eval_rouge2', 'llm_feature_hashing',
    'ml_target_encode_kfold', 'llm_safety_pattern_filter',
    'llm_pack_budget_sweep', 'llm_uncertainty_sampling',
    'llm_rag_groundedness_eval', 'stat_ks_two_sample',
    'stat_mutual_information', 'stat_benford_first_digit',
    'stat_bootstrap_poisson_ci', 'ts_theil_sen_slope',
    'stat_runs_test_wald_wolfowitz', 'stat_spearman_rho',
    'stat_anova_oneway_f', 'stat_two_proportion_z', 'stat_cohens_d',
    'stat_cramers_v', 'stat_brown_forsythe', 'stat_bh_fdr_permutation',
    'ml_confusion_threshold_sweep', 'stat_chi_square_gof_dow',
    'stat_mde_power_binary', 'stat_diff_in_diff_2x2',
    'stat_proportion_ci_wilson', 'ml_brier_score_rank',
    'stat_interrupted_time_series', 'ml_learning_curve_auc',
    'stat_g_test_cells', 'stat_sign_test_paired', 'stat_friedman_test',
    'stat_kruskal_wallis', 'stat_mood_median_test',
    'stat_fisher_z_corr_ci', 'ml_calibration_reliability',
    'stat_jarque_bera', 'stat_mcnemar_paired', 'stat_hodges_lehmann_shift',
    'stat_cliffs_delta', 'stat_dunn_posthoc_bh', 'ts_spectral_dft_energy',
    'agg_approx_distinct', 'agg_quantile_sketch', 'ts_downsample_lttb',
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
