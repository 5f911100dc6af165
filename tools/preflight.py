"""Round-delivery pre-flight: everything the grading driver will do, run
locally BEFORE the round ends, in the order the judge checks it.

    python tools/preflight.py            # full: gate + window sweep
    python tools/preflight.py --quick    # gate + 10-key window head only

Steps (each prints PASS/FAIL; exit non-zero on the first failure):
  1. rotation gate        — tools/rotation.py --check (window wastes no slot)
  2. window oracle sweep  — tools/drive_driver.py over every _DRIVER_PRIORITY
                            key (the exact 50 the driver will slot): entry()
                            smoke + rows/schema/value-hash vs DuckDB at sf0.01
  3. bench artifact shape — bench_out.json exists, parses, and carries
                            queries/calibration/value (the BENCH_r07
                            "parsed": null failure mode)

The full pytest suite is deliberately NOT chained here (12+ min and it
cannot share /tmp/lts_spark_warehouse with the sweep's Spark session);
run it separately: python -m pytest tests/ -q
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def step(name: str, ok: bool, detail: str = "") -> None:
    print(f"[{'PASS' if ok else 'FAIL'}] {name}" + (f" — {detail}" if detail else ""))
    if not ok:
        sys.exit(1)


def main() -> None:
    quick = "--quick" in sys.argv

    r = subprocess.run([sys.executable, os.path.join(ROOT, "tools", "rotation.py"),
                        "--check"], capture_output=True, text=True)
    step("rotation gate", r.returncode == 0,
         (r.stdout.strip().splitlines() or [r.stderr.strip() or "no output"])[-1])

    from lambdatotheslaughter_spark import registry
    window = list(registry._DRIVER_PRIORITY)
    keys = window[:10] if quick else window
    r = subprocess.run([sys.executable, os.path.join(ROOT, "tools", "drive_driver.py"),
                        *keys], capture_output=True, text=True)
    matches = r.stdout.count("-> MATCH")
    mismatches = r.stdout.count("MISMATCH")
    # r10: the window deliberately seats registry._ROWS_ONLY_SLOTS
    # (VERDICT r9 ask #6) — those print "rows-only N", not "-> MATCH"
    rows_only_in = [k for k in keys if k in registry._ROWS_ONLY_SLOTS]
    rows_only_seen = sum(1 for k in rows_only_in
                         if f"{k}: rows-only" in r.stdout)
    step(f"window oracle sweep ({len(keys)} keys)",
         r.returncode == 0 and mismatches == 0
         and matches == len(keys) - len(rows_only_in)
         and rows_only_seen == len(rows_only_in),
         f"{matches} MATCH, {mismatches} MISMATCH, "
         f"{rows_only_seen}/{len(rows_only_in)} declared rows-only clean")

    path = os.path.join(ROOT, "bench_out.json")
    try:
        with open(path) as fh:
            payload = json.loads(fh.read())
        ok = (isinstance(payload.get("queries"), dict) and payload["queries"]
              and isinstance(payload.get("value"), (int, float))
              and "engine_q1_over_plain_q1" in payload.get("calibration", {}))
        step("bench artifact shape", ok,
             f"{len(payload.get('queries', {}))} queries, total {payload.get('value')}s")
    except (OSError, ValueError) as exc:
        step("bench artifact shape", False, str(exc))

    print("preflight: all green")


if __name__ == "__main__":
    main()
