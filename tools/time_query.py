#!/usr/bin/env python
"""Ad-hoc single-query warm timer at sf0.1 (min-of-2 protocol, noop drain).
Usage: python tools/time_query.py <query> [<query> ...]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambdatotheslaughter_spark import registry
from lambdatotheslaughter_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("lts-timer")
for name in sys.argv[1:]:
    fn = registry.all_queries()[name]
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    warm = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        warm.append(time.perf_counter() - t0)
    print(f"{name}: min_warm={min(warm):.3f}s runs={[round(w, 3) for w in warm]}")
