"""Aggregation operators (SURVEY.md §2.4).

All float aggregates go through the decimal-space helpers in
:mod:`..determinism` so results are bit-identical regardless of partition
count / aggregation order — the property the DuckDB oracle hash requires and
the property a 1000-executor run needs for reproducibility.

Physical shape: every groupBy here compiles to partial (map-side) + final
hash aggregation with whole-stage codegen; no extra shuffles beyond the one
exchange on the grouping keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambdatotheslaughter_spark.determinism import davg, dsum, oracle_davg, oracle_dsum
from lambdatotheslaughter_spark.registry import register
from lambdatotheslaughter_spark.tables import load_table

_Q1_CUTOFF = "2001-09-02"

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_dsum('l_quantity')} AS sum_qty,
  {oracle_dsum('l_extendedprice')} AS sum_base_price,
  {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {oracle_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {oracle_davg('l_quantity')} AS avg_qty,
  {oracle_davg('l_extendedprice')} AS avg_price,
  {oracle_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("agg_pricing_summary", oracle=_Q1_ORACLE)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary (SURVEY.md §2.4).

    Scan → filter (pushed to parquet row groups) → hash agg on the 6-group
    key. At 100 TB this is the canonical map-side-combine query: the shuffle
    carries only (2-key × partial-agg) rows, a few KB per task.
    """
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
