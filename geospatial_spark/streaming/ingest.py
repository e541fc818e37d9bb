"""Structured Streaming ingestion of the pages/events feed.

The reference is a batch library (SURVEY.md §2.6 N7 — streaming not
required by the north rule), but a web-scale crawl feed is naturally a
stream, so the engine ships the standard Spark-idiomatic pipeline:

  readStream (parquet dir, fixed schema) → withWatermark → tumbling-window
  aggregation / streaming dedup → sink.

Everything here is the stock Structured Streaming operator set — watermarks
bound state, windows are pre-shuffle partial-aggregated, and
``dropDuplicatesWithinWatermark`` is the streaming analogue of the batch
``dedup_exact`` operator.  Tests drive it with ``trigger(availableNow)``
against the static events fixture and compare against the equivalent batch
query (exactly-once replay makes them equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture (one parquet file = one
    micro-batch replay; on a cluster this is the Kafka/Iceberg-CDC tap)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def windowed_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window per-event-type counts + value sums with late-data
    tolerance `watermark` (state is bounded: window x event_type)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("value_sum"),
        )
    )


def windowed_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """The batch-equivalent plan (exactly-once replay ⇒ equal results)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("value_sum"),
        )
    )


def stream_dedup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact-dedup on event_id within the watermark horizon —
    the streaming analogue of operators.dedup.dedup_exact."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
