"""Sort / limit / top-k operators (SURVEY.md §2.6).

Top-k fuses to TakeOrderedAndProject (per-partition heap + driver merge of k
rows) — the only sane global-sort shape at 100 TB. A full global sort is a
range-partitioned exchange; we only do it bounded by LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambdatotheslaughter_spark.determinism import (
    disc_price_csum, oracle_disc_price_csum)
from lambdatotheslaughter_spark.registry import register
from lambdatotheslaughter_spark.tables import load_table


@register("sort_multi_key_nulls", oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal,
       c_mktsegment
FROM customer
ORDER BY bal DESC NULLS LAST, c_mktsegment ASC, c_custkey
LIMIT 200
""")
def sort_multi_key_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort with explicit null placement; LIMIT
    makes the selected set (not just its order) depend on the sort, and the
    trailing unique key makes that set deterministic."""
    c = load_table(spark, "customer", sf_dir)
    bal = F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double")) \
        .otherwise(F.col("c_acctbal"))
    return (
        c.select("c_custkey", bal.alias("bal"), "c_mktsegment")
        .orderBy(F.col("bal").desc_nulls_last(),
                 F.col("c_mktsegment").asc(),
                 F.col("c_custkey"))
        .limit(200)
    )


_TOPK_ORACLE = f"""
SELECT l_orderkey,
       {oracle_disc_price_csum('l_extendedprice', 'l_discount')} AS revenue,
       o_orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("topk_global", oracle=_TOPK_ORACLE)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + global top-10 by revenue.
    orderBy().limit() → TakeOrderedAndProject; revenue is decimal-summed so
    the top-10 cut is the same set in both engines."""
    c = load_table(spark, "customer", sf_dir).where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(disc_price_csum("l_extendedprice", "l_discount").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register("limit_offset", oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
ORDER BY c_custkey
LIMIT 50 OFFSET 100
""")
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination slice — only deterministic after a total order, so the
    sort key is the unique primary key."""
    c = load_table(spark, "customer", sf_dir)
    return (
        c.select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
        .offset(100)
        .limit(50)
    )
