"""Mimic the driver: import __spark_entry__, smoke entry(), then run each
queries()[k] at sf0.01 vs oracle_sql()[k] in DuckDB (count+schema+value hash).

Usage: python tools/drive_driver.py [name ...] — with args, only queries
whose key equals (or contains) an arg are run; no args = the full sweep.
"""
import sys, hashlib, math
sys.path.insert(0, "/root/repo")
import duckdb, pandas as pd
import __spark_entry__ as e
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

rows = e.entry(spark).collect()
print(f"SMOKE entry(): {len(rows)} rows; first: {rows[0]}")

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")

def vhash(df):
    cols = sorted(df.columns)
    cells = []
    for r in df[cols].itertuples(index=False, name=None):
        cells.append(tuple(repr(x) if not isinstance(x, float) else repr(round(x,9)) for x in r))
    cells.sort()
    return hashlib.md5(str(cells).encode()).hexdigest()

qs, os_ = e.queries(), e.oracle_sql()
sel = sys.argv[1:]
if sel:
    qs = {k: v for k, v in qs.items()
          if any(s == k or s in k for s in sel)}
print(f"{len(qs)} queries, {len(os_)} oracles")
bad = 0
for k, fn in qs.items():
    sp = fn(spark, "/root/testdata/sf0.01").toPandas()
    if k in os_:
        dk = con.execute(os_[k]).df()
        ok = (len(sp)==len(dk)) and sorted(sp.columns)==sorted(dk.columns) and vhash(sp)==vhash(dk)
        bad += 0 if ok else 1
        print(f"{k}: rows {len(sp)}/{len(dk)} hash_match={vhash(sp)==vhash(dk)} -> {'MATCH' if ok else 'MISMATCH'}")
    else:
        print(f"{k}: rows-only {len(sp)}")
sys.exit(1 if bad else 0)
