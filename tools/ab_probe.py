#!/usr/bin/env python
"""Fresh-process single-measurement probe for r12 A/B experiments.

Runs under the driver's protocol: one fresh JVM, a plain-q1 receipt, then
for each named key one cold run + min-of-2 warm (noop sink). Variant
selection is via env (LTS_TMP_* knobs read by the operators); core count
via SPARK_GRAFT_CPUS. Prints one JSON line.

Usage: python tools/ab_probe.py <key> [<key> ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambdatotheslaughter_spark import registry
from lambdatotheslaughter_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _drain(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("lts-ab-probe")
    from pyspark.sql import functions as F
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))

    def q1():
        _drain(li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
               .groupBy("l_returnflag", "l_linestatus")
               .agg(F.sum("l_quantity"), F.avg("l_discount"),
                    F.count(F.lit(1))))

    q1()
    t0 = time.perf_counter(); q1(); receipt = time.perf_counter() - t0

    queries = registry.all_queries()
    out = {"receipt_plain_q1": round(receipt, 3),
           "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
           "knobs": {k: v for k, v in os.environ.items()
                     if k.startswith("LTS_TMP_")}}
    import gc
    for name in sys.argv[1:]:
        fn = queries[name]
        _drain(fn(spark, SF))  # cold
        warm = []
        for _ in range(2):
            t0 = time.perf_counter()
            _drain(fn(spark, SF))
            warm.append(time.perf_counter() - t0)
        out[name] = round(min(warm), 3)
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    print("ABPROBE " + json.dumps(out, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
