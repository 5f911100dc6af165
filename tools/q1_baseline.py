"""Plain-PySpark TPC-H Q1 baseline, min-of-2 warm, configurable master."""
import sys, time
from pyspark.sql import SparkSession, functions as F
cpus, shuf = sys.argv[1], sys.argv[2]
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", shuf)
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
def q1():
    df = (li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(F.sum("l_quantity").alias("sum_qty"),
               F.sum("l_extendedprice").alias("sum_base_price"),
               F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
               F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("sum_charge"),
               F.avg("l_quantity").alias("avg_qty"),
               F.avg("l_extendedprice").alias("avg_price"),
               F.avg("l_discount").alias("avg_disc"),
               F.count(F.lit(1)).alias("count_order"))
          .orderBy("l_returnflag", "l_linestatus"))
    df.write.format("noop").mode("overwrite").save()
t0 = time.perf_counter(); q1(); cold = time.perf_counter() - t0
warm = []
for _ in range(2):
    t0 = time.perf_counter(); q1(); warm.append(time.perf_counter() - t0)
print(f"local[{cpus}] shuffle={shuf}: cold={cold:.3f} warm_min2={min(warm):.3f} warms={[round(w,3) for w in warm]}")
