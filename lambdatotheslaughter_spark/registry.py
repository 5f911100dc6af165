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
# ROUND 8 window -- 50 slots, ALL first-time (212-key oracled pool at
# rotation; VERDICT r7 ask #3 — drain, don't add):
#   [0:10]  the keys VERDICT r7 names first: the stats/ML-eval third ring
#           (permutation test, PR-AUC, DeLong CI), the txlog pair
#           (snapshot + checkpoint), the round-7 eval ring (BLEU, NDCG@10,
#           chrF), llm_sim_lsh_mllib (value-oracled since r7), and
#           dq_cardinality_drift_report (rewritten this round to the
#           one-scan multi-distinct shape — the slot doubles as
#           post-change confirmation);
#   [10:50] the 40 oldest remaining never-slotted keys in registration
#           order (streaming monitors, the r6 llm/udtf/sql-surface ring,
#           ts/window/stat shapes).
# After this window drains, ~162 oracled keys remain unslotted (~3-4 more
# windows at 50/round with additions FROZEN per VERDICT r7 #3); regenerate
# with tools/rotation.py when rotating.
# Rows-only-by-design ops (12; each pytest-gated in test_llm_quality.py /
# test_survey_coverage.py's allowlist) are deliberately never listed -- a
# driver slot adds nothing over their determinism/recall/tolerance gates.
_DRIVER_PRIORITY: tuple[str, ...] = (
    "stat_permutation_test", "ml_pr_auc_exact", "ml_roc_auc_delong_ci",
    "scan_txlog_snapshot", "scan_txlog_checkpoint", "llm_eval_bleu_corpus",
    "llm_eval_ndcg_at10", "llm_eval_chrf", "llm_sim_lsh_mllib",
    "dq_cardinality_drift_report", "stream_sprt_monitor",
    "stream_changepoint_monitor", "llm_multimodal_decode",
    "llm_minhash_bbit", "llm_lm_score_kneser_ney",
    "llm_embedding_matryoshka_recall", "llm_eval_retrieval_mrr",
    "llm_multimodal_interleaved_pack", "udtf_sql_registered",
    "udtf_arrow_optimized", "udtf_table_argument",
    "sql_values_inline_table", "sql_lateral_view_explode",
    "sql_distribute_sort_by", "sql_join_hints", "ts_time_weighted_avg",
    "sql_join_hint_merge", "win_topk_with_ties", "sql_identifier_clause",
    "sql_star_except", "agg_filter_clause", "sql_table_function_range",
    "stat_crosstab", "sql_pivot_clause", "sql_unpivot_clause",
    "sql_hint_rebalance", "win_lag_ignore_nulls",
    "sql_semi_anti_join_syntax", "explode_outer_nulls", "ts_outlier_iqr",
    "stat_chi_square_independence", "ts_autocorr_lag", "sql_order_by_all",
    "sql_global_temp_view", "ts_dow_hour_profile", "ts_peak_detect_local",
    "win_percent_rank_cume_dist", "ts_acf_multi_lag", "ts_xcorr_lead_lag",
    "ts_burstiness_fano",
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
