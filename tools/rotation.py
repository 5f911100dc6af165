"""Driver-window rotation bookkeeping (VERDICT r6 'What's wrong #2': the
rotation list must be GENERATED from the correctness artifacts, not
hand-counted).

The grading driver hash-verifies the FIRST 50 entries of ``queries()`` per
round. This tool reads every ``CORRECTNESS_r*.json`` in the repo root,
takes the union of keys that ever held a driver slot, and prints the
oracled keys that have NEVER been slotted, in registry registration order
— the exact pool the next ``_DRIVER_PRIORITY`` window should draw from.

Usage:
    python tools/rotation.py            # summary + the never-slotted pool
    python tools/rotation.py --check    # exit 1 if _DRIVER_PRIORITY holds a
                                        # key that is neither never-slotted
                                        # nor a declared backfill
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambdatotheslaughter_spark import registry  # noqa: E402

# keys whose PLAN changed this round and deliberately re-occupy a slot
# even if already driver-green. Round 12 (VERDICT r11 ask #2): the
# never-slotted pool is exactly 15 keys — the window's remaining 35 slots
# deliberately RE-verify the keys optimized in r11/r12 after their last
# driver verification, plus the most expensive headline residents for
# regression visibility. Must stay a superset of
# registry._ROWS_ONLY_SLOTS (asserted in tests/test_survey_coverage.py).
BACKFILL: tuple[str, ...] = (
    'graph_adamic_adar_linkpred', 'llm_sim_lsh_mllib',
    'stat_bh_fdr_permutation', 'stat_bootstrap_poisson_ci',
    'stat_permutation_test', 'graph_triangle_count',
    'graph_jaccard_neighbors', 'graph_clustering_coefficient',
    'sql_scripting_block', 'graph_pagerank_fixed',
    'graph_personalized_pagerank', 'graph_hits_fixed',
    'graph_bfs_distance', 'llm_sim_knn_quantized', 'ml_lift_gains_table',
    'llm_pipeline_curation_v2', 'llm_repetition_score',
    'llm_dedup_survivorship', 'llm_dedup_containment',
    'llm_lsh_tuning_report', 'graph_closeness_harmonic_3hop',
    'source_python_datasource_stream', 'graph_katz_centrality_fixed',
    'graph_label_propagation_sync', 'ts_hurst_rs', 'llm_eval_chrf',
    'llm_dedup_fuzzy_minhash', 'llm_dedup_cluster',
    'llm_pipeline_end_to_end', 'seq_rfm_segments',
    'llm_dedup_ngram_jaccard', 'graph_bipartite_copurchase',
    'llm_fingerprint_winnow', 'scd2_dimension_merge',
    'llm_eval_bleu_corpus',
)


def artifact_paths(repo_root: str) -> list[str]:
    return sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")))


def slotted_union(repo_root: str, exclude_newest: bool = False) -> set[str]:
    """Union of keys that ever held a driver slot.

    ``exclude_newest=True`` drops the single newest ``CORRECTNESS_r*.json``
    from the union. The WASTE check must use this mode (VERDICT r7 wrong
    #1): the driver writes the newest artifact AFTER the final commit, by
    draining the very window under test — keys that appear ONLY in the
    newest artifact are the window's success, not wasted slots. Window
    GENERATION uses the full union (the newest artifact is completed
    history when a new window is being cut)."""
    paths = artifact_paths(repo_root)
    if exclude_newest and paths:
        paths = paths[:-1]
    seen: set[str] = set()
    for path in paths:
        seen.update(json.load(open(path)))
    return seen


def never_slotted(repo_root: str, exclude_newest: bool = False) -> list[str]:
    """Oracled keys with no driver row yet, in registration order (the
    _DRIVER_PRIORITY window reorders the head; registration order is the
    stable tail order)."""
    seen = slotted_union(repo_root, exclude_newest=exclude_newest)
    oracles = registry.all_oracles()
    # all_queries() leads with _DRIVER_PRIORITY; use raw registration order
    registry._load()
    return [name for name in registry._REGISTRY
            if name in oracles and name not in seen]


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen = slotted_union(root)
    pool = never_slotted(root)
    prio = list(registry._DRIVER_PRIORITY)
    print(f"driver-slotted union: {len(seen)} keys")
    print(f"oracled, never-slotted pool: {len(pool)} keys")
    if "--check" in sys.argv:
        # exclude the newest artifact: a key verified ONLY there was just
        # drained by this very window — success, not waste
        allowed = set(never_slotted(root, exclude_newest=True)) | set(BACKFILL)
        bad = [k for k in prio if k not in allowed]
        if bad:
            print(f"WINDOW WASTES SLOTS on already-verified keys: {bad}")
            return 1
        first_time = [k for k in prio if k in allowed and k not in BACKFILL]
        print(f"window: {len(prio)} slots, {len(first_time)} first-time, "
              f"{len(prio) - len(first_time)} backfill — OK")
        return 0
    for name in pool:
        print(name)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
