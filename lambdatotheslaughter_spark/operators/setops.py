"""Set operations (SURVEY.md §2.7).

UNION ALL is a zero-shuffle concatenation; UNION/INTERSECT/EXCEPT hash-shuffle
on the full row — at scale prefer pre-aggregated (distinct user_id) inputs,
which is how these queries are shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambdatotheslaughter_spark.registry import register
from lambdatotheslaughter_spark.tables import load_table


def _slice(spark, sf_dir, etype):
    ev = load_table(spark, "events", sf_dir)
    return ev.where(F.col("event_type") == etype).select("user_id", "event_type", "value")


@register("set_union_all", oracle="""
SELECT user_id, event_type, value FROM events WHERE event_type = 'click'
UNION ALL
SELECT user_id, event_type, value FROM events WHERE event_type = 'purchase'
""")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two slices — unionByName, duplicates preserved."""
    return _slice(spark, sf_dir, "click").unionByName(_slice(spark, sf_dir, "purchase"))


@register("set_union_distinct", oracle="""
SELECT user_id, event_type FROM events WHERE event_type = 'click'
UNION
SELECT user_id, event_type FROM events WHERE event_type = 'purchase'
""")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (dedup across both inputs)."""
    a = _slice(spark, sf_dir, "click").select("user_id", "event_type")
    b = _slice(spark, sf_dir, "purchase").select("user_id", "event_type")
    return a.unionByName(b).distinct()


@register("set_intersect", oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who both clicked and purchased (set semantics)."""
    a = _slice(spark, sf_dir, "click").select("user_id")
    b = _slice(spark, sf_dir, "purchase").select("user_id")
    return a.intersect(b)


@register("set_except", oracle="""
SELECT user_id FROM events
WHERE event_type = 'view' AND ts < TIMESTAMP '2024-01-03 00:00:00'
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-03 00:00:00'
""")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who viewed but hadn't purchased in the first two days (set
    difference). Time-sliced so the result is non-empty at sf0.01 — every
    user eventually does everything in the synthetic stream."""
    ev = load_table(spark, "events", sf_dir)
    cutoff = F.lit("2024-01-03").cast("timestamp")
    a = ev.where((F.col("event_type") == "view") & (F.col("ts") < cutoff)).select("user_id")
    b = ev.where((F.col("event_type") == "purchase") & (F.col("ts") < cutoff)).select("user_id")
    return a.subtract(b)


@register("set_intersect_all", oracle="""
SELECT user_id FROM events
WHERE event_type = 'click' AND ts < TIMESTAMP '2024-01-05 00:00:00'
INTERSECT ALL
SELECT user_id FROM events
WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-05 00:00:00'
""")
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (INTERSECT ALL): each user_id appears
    min(count_left, count_right) times — the multiplicity-aware form both
    engines implement by hashing full rows with counters; one shuffle."""
    ev = load_table(spark, "events", sf_dir)
    cutoff = F.lit("2024-01-05").cast("timestamp")
    a = ev.where((F.col("event_type") == "click") & (F.col("ts") < cutoff)).select("user_id")
    b = ev.where((F.col("event_type") == "purchase") & (F.col("ts") < cutoff)).select("user_id")
    return a.intersectAll(b)


@register("set_except_all", oracle="""
SELECT user_id FROM events
WHERE event_type = 'view' AND ts < TIMESTAMP '2024-01-05 00:00:00'
EXCEPT ALL
SELECT user_id FROM events
WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-05 00:00:00'
""")
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (EXCEPT ALL): multiplicities subtract instead of the
    set form's all-or-nothing — views in excess of purchases per user."""
    ev = load_table(spark, "events", sf_dir)
    cutoff = F.lit("2024-01-05").cast("timestamp")
    a = ev.where((F.col("event_type") == "view") & (F.col("ts") < cutoff)).select("user_id")
    b = ev.where((F.col("event_type") == "purchase") & (F.col("ts") < cutoff)).select("user_id")
    return a.exceptAll(b)
