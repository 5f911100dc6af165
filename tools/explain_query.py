#!/usr/bin/env python
"""Dump `.explain("formatted")` for one or more registry keys to
plans/<round>/<key>_<tag>.txt (the optimization-round plan artifact).

Usage: python tools/explain_query.py <tag> <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_PLANS_ROUND (default r12).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambdatotheslaughter_spark import registry
from lambdatotheslaughter_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12"))

tag = sys.argv[1]
os.makedirs(OUT, exist_ok=True)
spark = get_spark("lts-explain")
for name in sys.argv[2:]:
    df = registry.all_queries()[name](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    path = os.path.join(OUT, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan.splitlines())} lines)")
