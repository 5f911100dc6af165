#!/usr/bin/env python
"""Regenerate PLANS.md: post-execution (AQE-final) physical plan skeletons
for the bench headline queries — the artifact that shows pushdown, broadcast,
bucketing, and codegen at a glance."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from lambdatotheslaughter_spark import registry  # noqa: E402
from lambdatotheslaughter_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def skeleton(plan: str, max_lines: int = 28) -> str:
    out = []
    for line in plan.splitlines():
        if "== Initial Plan ==" in line:
            break
        # strip expression ids and long argument tails, keep the tree shape
        line = re.sub(r"#\d+L?", "", line)
        if len(line) > 110:
            line = line[:107] + "..."
        out.append(line.rstrip())
        if len(out) >= max_lines:
            out.append("   ...")
            break
    return "\n".join(out)


def main() -> None:
    spark = get_spark("plan-dump")
    parts = [
        "# PLANS — AQE-final physical plans of the bench headline queries\n",
        "Regenerate with `python tools/dump_plans.py` (runs at sf0.01).",
        "Things to look for: `PushedFilters`/pruned `ReadSchema` on scans,",
        "`BroadcastHashJoin` on dims, `Bucketed: true` + zero `Exchange` on",
        "the bucketed join, `TakeOrderedAndProject` under LIMIT, `*(n)`",
        "whole-stage-codegen spans.\n",
    ]
    for name in HEADLINE:
        df = registry.get(name).fn(spark, SF_DIR)
        df.collect()  # finalize THIS DataFrame's AQE plan (a sink write
        # would execute a copy and leave df's own plan non-final)
        plan = df._jdf.queryExecution().executedPlan().toString()
        parts.append(f"## {name}\n\n```\n{skeleton(plan)}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(parts))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
