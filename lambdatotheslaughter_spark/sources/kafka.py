"""Kafka-envelope source shape (SURVEY.md §2.1 / §3 entry 2).

In production the speed layer consumes ``readStream.format("kafka")`` and
sees (key, value, timestamp, ...) rows. This module owns the envelope
contract — serialize events into that shape, parse them back — so batch
(driver-checkable) and streaming paths share one implementation. Timestamps
travel as epoch-micros: events.ts carries µs precision and a JSON ISO round
trip would truncate to milliseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_SCHEMA = T.StructType([
    T.StructField("ts_us", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def to_envelope(events: DataFrame) -> DataFrame:
    """events → Kafka-style (key, json-value) rows."""
    return events.select(
        F.col("event_id").cast("string").alias("key"),
        F.to_json(F.struct(
            F.unix_micros("ts").alias("ts_us"),
            "user_id", "event_type", "value", "props",
        )).alias("value"),
    )


def parse_envelope(envelope: DataFrame) -> DataFrame:
    """(key, json-value) rows → typed event columns, exactly as a streaming
    Kafka consumer's from_json projection would."""
    j = envelope.select(F.from_json("value", ENVELOPE_SCHEMA).alias("j"))
    return j.select(
        F.timestamp_micros(F.col("j.ts_us")).alias("ts"),
        F.col("j.user_id").alias("user_id"),
        F.col("j.event_type").alias("event_type"),
        F.col("j.value").alias("value"),
        F.get_json_object(F.col("j.props"), "$.k").cast("bigint").alias("prop_k"),
    )
