"""Projection & filter operators (SURVEY.md §2.2).

Pure narrow transformations — no shuffle at any scale; Catalyst folds them
into the scan stage (single WholeStageCodegen span over the parquet reader).
Per-row double arithmetic is IEEE-identical across engines, so these results
hash-match without any decimal tricks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambdatotheslaughter_spark.registry import register
from lambdatotheslaughter_spark.tables import load_table


@register("project_compute", oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS disc_price,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
       l_quantity * 2.0 + 1.0 AS qty_scaled
FROM lineitem
""")
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic derived columns; stays inside the scan's codegen stage."""
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey", "l_linenumber",
        disc_price.alias("disc_price"),
        (disc_price * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * F.lit(2.0) + F.lit(1.0)).alias("qty_scaled"),
    )


@register("filter_conjunctive", oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE (l_discount > 0.05 AND l_quantity < 25.0) OR NOT (l_returnflag = 'A')
""")
def filter_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT predicate tree, null-safe three-valued logic."""
    li = load_table(spark, "lineitem", sf_dir)
    pred = ((F.col("l_discount") > 0.05) & (F.col("l_quantity") < 25.0)) | \
        (~(F.col("l_returnflag") == "A"))
    return li.where(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@register("filter_in_between_like", oracle="""
SELECT p_partkey, p_brand, p_size, p_name
FROM part
WHERE p_brand IN ('Brand#1', 'Brand#7', 'Brand#13')
  AND p_size BETWEEN 10 AND 30
  AND p_name LIKE 'red%'
""")
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list, BETWEEN range, LIKE prefix — all pushdown-eligible."""
    p = load_table(spark, "part", sf_dir)
    return p.where(
        F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#13")
        & F.col("p_size").between(10, 30)
        & F.col("p_name").like("red%")
    ).select("p_partkey", "p_brand", "p_size", "p_name")


@register("filter_null_semantics", oracle="""
SELECT c_custkey,
       NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
       (NULLIF(c_mktsegment, 'BUILDING') IS NULL) AS is_building,
       (NULLIF(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM
        NULLIF(c_mktsegment, 'AUTOMOBILE')) AS null_safe_eq
FROM customer
WHERE NULLIF(c_mktsegment, 'BUILDING') IS NULL
   OR NULLIF(c_mktsegment, 'AUTOMOBILE') IS NOT NULL
""")
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL / null-safe equality (<=>), nulls manufactured
    via NULLIF since the master data is null-free (FIXTURES.md)."""
    c = load_table(spark, "customer", sf_dir)
    a = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    b = F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE"))
    return (
        c.where(a.isNull() | b.isNotNull())
        .select(
            "c_custkey",
            a.alias("seg_or_null"),
            a.isNull().alias("is_building"),
            a.eqNullSafe(b).alias("null_safe_eq"),
        )
    )


@register("project_case_when", oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS price_tier,
       CASE o_orderstatus WHEN 'F' THEN 'finished'
                          WHEN 'O' THEN 'open'
                          ELSE 'pending' END AS status_label
FROM orders
""")
def project_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bucketing: searched CASE and simple CASE forms."""
    o = load_table(spark, "orders", sf_dir)
    tier = (F.when(F.col("o_totalprice") < 50000, "small")
            .when(F.col("o_totalprice") < 200000, "medium")
            .otherwise("large"))
    status = (F.when(F.col("o_orderstatus") == "F", "finished")
              .when(F.col("o_orderstatus") == "O", "open")
              .otherwise("pending"))
    return o.select("o_orderkey", tier.alias("price_tier"), status.alias("status_label"))
