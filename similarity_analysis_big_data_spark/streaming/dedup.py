"""Streaming deduplication (north-star dedup, streaming flavor).

``dropDuplicates`` on a watermarked stream is Spark's built-in stateful
exact dedup: state holds one digest per seen document inside the watermark
horizon, late duplicates beyond it age out of state. The batch twin is
operators/dedup.exact_dedup_survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_event_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop duplicate events by (user_id, event_type, value-digest) within
    the watermark horizon — the streaming exact-dedup shape: digest the
    dedup key, watermark bounds the state store."""
    keyed = events.withColumn(
        "digest", F.md5(F.concat_ws("|", "user_id", "event_type", F.col("value").cast("string")))
    )
    return keyed.withWatermark("ts", watermark).dropDuplicates(["digest"])


def dedup_event_stream_within_watermark(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` flavor: unlike ``dropDuplicates``
    (which keys state on the exact dedup columns forever unless an event-time
    column is part of the key), this guarantees dedup only for duplicates
    arriving within the watermark delay of each other — and in exchange can
    EVICT state as the watermark advances even though ``ts`` is not part of
    the dedup key. That is the production shape for at-least-once sources
    (kafka redeliveries land seconds apart, not hours)."""
    keyed = events.withColumn(
        "digest", F.md5(F.concat_ws("|", "user_id", "event_type", F.col("value").cast("string")))
    )
    return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["digest"])


def dedup_hourly_key_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Idempotency-key dedup: one event per (user_id, event_type, hour
    bucket) survives. The key is built from event-time, so a duplicate
    delivery (same user doing the same thing in the same hour) collapses;
    survivor VALUES are not part of the contract — consumers must read
    only key-determined columns, which is why the driver-visible twin
    aggregates over the key columns alone.

    State boundedness: ``dropDuplicates`` only evicts state when the
    WATERMARKED event-time column itself is in the key subset — a derived
    ``date_trunc('hour', ts)`` column carries no watermark metadata, so
    watermarking ``ts`` and keying on the bucket would grow state forever.
    The watermark is therefore declared ON ``hour_bucket`` (a legal
    event-time column: truncation shifts each event's time down by <1h,
    which the delay absorbs), making the watermarked column part of the
    dedup key; Spark then drops each (user, type, hour) entry once the
    watermark passes that hour — the bounded-state contract a production
    deployment needs."""
    keyed = events.withColumn("hour_bucket", F.date_trunc("hour", F.col("ts")))
    return (
        keyed.withWatermark("hour_bucket", watermark)
        .dropDuplicates(["user_id", "event_type", "hour_bucket"])
        .select("user_id", "event_type", "hour_bucket")
    )
