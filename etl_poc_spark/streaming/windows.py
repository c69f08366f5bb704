"""Structured Streaming variants of the event analytics (SURVEY.md §2.10).

The reference has no streaming runtime; the engine provides the standard
Spark building blocks over the same events schema the batch queries use —
batch-first on the same DataFrame code (§7 phase 5):

- tumbling window counts (`F.window`) with a watermark for late data
- sliding window averages
- session windows (`F.session_window`) with a 30-minute gap, matching the
  batch `events_sessionize` query semantics

All builders take a streaming DataFrame (from `read_events_stream` or any
source with the same schema) and return transformed streaming DataFrames;
callers pick the sink/trigger. Tests drive them with Trigger.AvailableNow
over a file source and assert equality with the batch formulation.

Scale notes: watermarks bound state store size (without one, windowed
state grows forever); session windows shuffle by (user_id) and merge
per-key intervals — the same key-skew considerations as any keyed stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, dir_path: str, fmt: str = "parquet") -> DataFrame:
    """File-based stream over an events-shaped directory (new files = new
    micro-batch input — the standard landing-zone pattern)."""
    return spark.readStream.schema(EVENTS_STREAM_SCHEMA).format(fmt).load(dir_path)


def hourly_event_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_value_avg_stream(events: DataFrame, window: str = "1 hour", slide: str = "15 minutes",
                             watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "avg_value",
        )
    )


def session_window_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )
