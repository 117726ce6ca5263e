"""Structured Streaming jobs over the events log.

The batch window queries in :mod:`windows` become incremental
streaming jobs by swapping the source for ``readStream`` and adding a
watermark — the transformations are shared, which is the point of
expressing them with Spark's native window operators.

These run with the file source (a directory of parquet) and
``trigger(availableNow=True)`` in tests; in production the source is
Kafka/queue and the trigger a processing interval. State (session
windows, late data) is handled by Spark's state store — per-key,
partitioned, checkpointed; nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prisma_migrator_spark.streaming.windows import session_windows, tumbling_windows


def read_events_stream(
    spark: SparkSession, path: str, schema=None, watermark: str = "1 hour"
) -> DataFrame:
    """File-source stream of the events table with an event-time
    watermark (bounds state; late rows beyond it are dropped)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    return stream.withWatermark("ts", watermark)


def streaming_event_counts(events: DataFrame, size: str = "1 hour") -> DataFrame:
    """Incremental tumbling counts per event_type."""
    return tumbling_windows(
        events,
        "ts",
        size,
        keys=["event_type"],
        aggs=[F.count("*").alias("n_events"), F.sum("value").alias("total_value")],
    )


def streaming_sessions(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Incremental gap-sessionization per user (stateful)."""
    return session_windows(
        events,
        "ts",
        gap,
        keys=["user_id"],
        aggs=[F.count("*").alias("n_events")],
    )


def streaming_dedup_events(events: DataFrame, id_col: str = "event_id") -> DataFrame:
    """Exactly-once event stream via
    ``dropDuplicatesWithinWatermark``: re-deliveries of an event id
    within the watermark horizon are dropped, and state for ids older
    than the watermark is EVICTED — plain ``dropDuplicates`` on a
    non-watermark key keeps its seen-set forever, which is what makes
    this variant the bounded-state scale path."""
    return events.dropDuplicatesWithinWatermark([id_col])


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drain the stream into an in-memory table (tests/demos): one
    availableNow pass over everything currently in the source."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
