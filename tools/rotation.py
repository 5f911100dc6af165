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
# even if already driver-green. Round 11: EMPTY — VERDICT r10 wrong #1
# retired the rows-only seating experiment ("don't seat the remaining
# nine; finish the oracled drain first"), and no oracled key's plan
# changed in a way that needs re-confirmation, so all 50 slots are
# first-time draws from the never-slotted pool. Must stay a superset of
# registry._ROWS_ONLY_SLOTS (asserted in tests/test_survey_coverage.py).
BACKFILL: tuple[str, ...] = ()


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
