"""Window-function operators (SURVEY.md §2.5).

Each window spec = one shuffle on the partition key + one sort within
partitions. Specs are chosen so every query is a single window exchange;
running sums use decimal space (DuckDB evaluates windowed SUM with a
segment tree, i.e. a different summation order — doubles would drift).
All orderings include a unique tie-break column so ranks are total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lambdatotheslaughter_spark.determinism import DEC
from lambdatotheslaughter_spark.registry import register
from lambdatotheslaughter_spark.tables import load_table


@register("win_topk_per_group", oracle="""
SELECT * FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 3
""")
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment: row_number + filter. At scale this
    beats global sort — each group's heap lives inside its partition."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice",
                F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


@register("win_rank_dense_ntile", oracle="""
SELECT s_suppkey, s_acctbal,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile
FROM supplier
WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
""")
def win_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over a total order (unique key tie-break
    keeps ntile bucket boundaries deterministic)."""
    s = load_table(spark, "supplier", sf_dir)
    w = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return s.select(
        "s_suppkey", "s_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register("win_lag_lead", oracle="""
SELECT event_id, user_id, ts,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
       LEAD(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts)
""")
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap (lag) and next event type (lead). Gap in
    integer microseconds — exact, no float drift."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    ts_us = F.unix_micros("ts")
    return ev.select(
        "event_id", "user_id", "ts",
        (ts_us - F.lag(ts_us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register("win_running_frame", oracle=f"""
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
            OVER (PARTITION BY o_custkey
                  ORDER BY date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS trailing_7d_spend
FROM orders
""")
def win_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer (ROWS frame) + 7-day trailing sum
    (RANGE frame over a day-number order key). Decimal space: DuckDB's
    segment-tree window sum would otherwise differ in the last float bits."""
    o = load_table(spark, "orders", sf_dir)
    day_num = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
    w_rows = Window.partitionBy("o_custkey") \
        .orderBy("o_orderdate", "o_orderkey") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_range = Window.partitionBy("o_custkey").orderBy(day_num.cast("long")) \
        .rangeBetween(-6, Window.currentRow)
    price_dec = F.col("o_totalprice").cast(DEC)
    return o.select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.sum(price_dec).over(w_rows).cast("double").alias("running_spend"),
        F.sum(price_dec).over(w_range).cast("double").alias("trailing_7d_spend"),
    )


@register("win_first_last", oracle="""
SELECT DISTINCT user_id, date_trunc('day', ts) AS day,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER w AS last_type
FROM events
WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts) ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""")
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event type per user-day via full-frame window + distinct.
    (ts is unique per user, so first/last are well-defined.)"""
    ev = load_table(spark, "events", sf_dir)
    day = F.date_trunc("day", "ts")
    w = Window.partitionBy("user_id", day).orderBy("ts") \
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id", day.alias("day"),
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    ).distinct()
