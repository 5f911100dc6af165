"""SURVEY.md §2 is the normative operator contract (§0): every key in its
tables must exist in the registry. This test makes coverage a build
invariant, not a hope."""

from __future__ import annotations

import re

from lambdatotheslaughter_spark import registry


def survey_keys() -> set[str]:
    keys = set()
    in_s2 = False
    for line in open("/root/repo/SURVEY.md"):
        if line.startswith("## §2"):
            in_s2 = True
        elif line.startswith("## §3"):
            in_s2 = False
        if in_s2 and line.startswith("| `"):
            m = re.match(r"\| `([a-z0-9_]+)`(?: / `([a-z0-9_]+)`)?", line)
            if m:
                keys.add(m.group(1))
                if m.group(2):
                    keys.add(m.group(2))
    return keys


def test_every_survey_key_is_registered():
    keys = survey_keys()
    assert len(keys) >= 70, f"survey parse broke: only {len(keys)} keys found"
    missing = sorted(keys - set(registry.all_queries()))
    assert not missing, f"SURVEY §2 keys not implemented: {missing}"


def test_oracle_coverage_ratio():
    """Rows-only checks are reserved for approximate / Python-stateful ops
    (SURVEY §5 strategy); everything else must carry a DuckDB oracle."""
    qs, oracles = registry.all_queries(), registry.all_oracles()
    rows_only = sorted(set(qs) - set(oracles))
    allowed = {"agg_approx_distinct", "llm_sim_lsh_approx", "llm_sim_ann_ivf",
               "llm_multimodal_decode", "agg_distinct_sketch_rollup"}
    assert set(rows_only) <= allowed, f"unexpected rows-only queries: {rows_only}"


def test_driver_priority_window_is_fully_oracled():
    """The driver hash-verifies the FIRST 50 entries of queries() per round.
    Round 2 rotates the previously replica-only queries into that window;
    every slot must carry an oracle (a rows-only op in the window wastes a
    verification slot), every listed name must exist, and the window must
    contain every §2 key that round 1 left replica-only."""
    qs = list(registry.all_queries())
    oracles = registry.all_oracles()
    prio = registry._DRIVER_PRIORITY
    assert len(prio) == 50, f"priority list is {len(prio)} names, want 50"
    missing = [n for n in prio if n not in set(qs)]
    assert not missing, f"priority names not registered: {missing}"
    assert qs[:50] == list(prio), "queries() does not lead with the priority window"
    unoracled = [n for n in qs[:50] if n not in oracles]
    assert not unoracled, f"rows-only queries occupy driver slots: {unoracled}"
    # §2 keys graded 'pass (replica)' in VERDICT.md round 1
    r1_replica_s2 = {
        "sink_stream_console_memory", "array_ops", "arr_higher_order",
        "map_ops", "json_extract", "stream_tumbling_agg", "stream_sliding_agg",
        "stream_session_window", "stream_watermark_late", "stream_dedup",
        "stream_stateful_running", "stream_join_enrich", "llm_dedup_exact",
        "llm_dedup_fuzzy_minhash", "llm_sim_knn_bruteforce", "llm_text_stats",
        "llm_text_tfidf_top_terms", "llm_lang_partition_skew",
        "llm_multimodal_schema", "udf_python_scalar", "udf_pandas_vectorized",
        "udaf_pandas_grouped", "udtf_explode_sessions",
    }
    uncovered = sorted(r1_replica_s2 - set(qs[:50]))
    assert not uncovered, f"r1 replica-only §2 keys outside driver window: {uncovered}"
