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
# ROUND 7 window -- 50 slots, ALL first-time (178-key pool at rotation):
#   [0:15]  the 15 keys whose PLAN or VALUES changed this round (the
#           bucketed_order sweep + the four ADVICE semantics fixes) --
#           first-time slots that double as post-change confirmation;
#   [15:25] the families VERDICT r6 #1 names first: stats/ML-eval
#           (welch, roc_auc, mann_whitney, dq_expectations, dq_psi),
#           sequence/funnel (window_funnel_strict, markov; rfm is already
#           in the changed set), new sources (xml, recursive_glob,
#           jsonl_gzip);
#   [25:50] the oldest remaining never-slotted keys in registration order
#           (r5 spill sinks/scans, geo joins, aggregate/date/type surface,
#           streaming twins).
# After this window drains, ~128 pre-round-7 keys plus the 82 round-7
# additions (all registered behind the window, replica-parity-gated on
# arrival) remain unslotted — ~3-4 more windows at 50/round; regenerate
# with tools/rotation.py when rotating.
# Rows-only-by-design ops (12 after round 7 promoted llm_multimodal_decode
# and llm_sim_lsh_mllib to value-exact oracles; each pytest-gated in
# test_llm_quality.py / test_survey_coverage.py's allowlist) are
# deliberately never listed -- a driver slot adds nothing over their
# determinism/recall/tolerance gates.
_DRIVER_PRIORITY: tuple[str, ...] = (
    "ml_lift_gains_table", "seq_reorder_cadence", "llm_curriculum_schedule",
    "llm_pipeline_curation_v2", "stat_gini_coefficient", "agg_pareto_cutoff",
    "agg_abc_classification", "seq_rfm_segments", "win_skyline_2d",
    "agg_concentration_hhi_crk", "ml_cv_auc_per_fold", "stat_kendall_tau",
    "stat_wilcoxon_signed_rank", "stat_ols_two_feature",
    "graph_disparity_backbone", "stat_welch_ttest", "ml_roc_auc_exact",
    "stat_mann_whitney_u", "dq_expectations_report",
    "dq_distribution_drift_psi", "seq_window_funnel_strict",
    "seq_markov_transitions", "source_xml", "source_recursive_glob",
    "source_jsonl_gzip", "sink_csv_roundtrip_quotes",
    "scan_nested_predicate_pushdown", "source_partition_discovery_types",
    "scan_aggregate_pushdown", "scan_fieldid_rename_evolution",
    "sink_max_records_per_file", "source_json_multiline",
    "scan_partition_spec_evolution", "join_mark_exists_flag",
    "geo_grid_neighbor_join", "geo_knn_within_radius", "agg_regr_builtins",
    "agg_theta_sketch_algebra", "agg_bitmap_distinct_rollup",
    "agg_cms_width_audit", "date_iso_week_quarter", "math_bround_even",
    "type_map_pack", "date_tz_convert", "type_try_cast_surface",
    "date_fiscal_quarter", "date_retail_445_calendar",
    "stream_rate_source_resume", "stream_chained_window_agg",
    "stream_drift_bucket_counts",
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
