"""Event-time + watermark hardening (SURVEY.md §7 step 5).

The reference runs pure processing-time with NO late-data policy
(T7, StructuredStreaming.scala:84,94): a late event is processed as
if on time. Here the streaming aggs run on event time with an
explicit watermark — late rows beyond the bound are dropped by the
engine and state for closed windows is reclaimed, which is what makes
unbounded-stream aggregation viable at 100 TB/day ingest (state size
is bounded by watermark horizon × key cardinality, not by stream
length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_WATERMARK = "10 minutes"
DEFAULT_WINDOW = "5 minutes"


def with_event_time(events: DataFrame, ts_sec_col: str = "ts_sec") -> DataFrame:
    """Attach an event-time TIMESTAMP column derived from integer epoch
    seconds (the engine's canonical time representation)."""
    return events.withColumn(
        "event_time", F.to_timestamp(F.from_unixtime(F.col(ts_sec_col)))
    )


def windowed_event_counts(
    events: DataFrame,
    watermark: str = DEFAULT_WATERMARK,
    window: str = DEFAULT_WINDOW,
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type.

    Works identically over batch and streaming frames; under
    ``readStream`` the watermark drops events later than the bound and
    finalizes (emits + evicts) windows older than it.
    """
    ev = with_event_time(events)
    if events.isStreaming:
        ev = ev.withWatermark("event_time", watermark)
    return (
        ev.groupBy(
            F.window("event_time", window).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("win_start_sec"),
            F.col("w.end").cast("long").alias("win_end_sec"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def watermarked_session_agg(
    events: DataFrame,
    watermark: str = DEFAULT_WATERMARK,
    gap: str = "30 minutes",
) -> DataFrame:
    """session_window aggregation under a watermark — the native
    streaming sessionizer with bounded state (gap-closed sessions are
    emitted once the watermark passes their end)."""
    ev = with_event_time(events)
    if events.isStreaming:
        ev = ev.withWatermark("event_time", watermark)
    return (
        ev.groupBy(F.session_window("event_time", gap).alias("sw"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("sw.start").cast("long").alias("start_sec"),
            F.col("sw.end").cast("long").alias("end_sec"),
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key's fingerprint only
    until the watermark passes it — at-least-once sources (Kafka
    redelivery, file re-drops) become effectively exactly-once without
    unbounded state. Batch frames fall back to plain dropDuplicates
    (same semantics, no state concern)."""
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    ev = with_event_time(events).withWatermark("event_time", watermark)
    return ev.dropDuplicatesWithinWatermark(keys).drop("event_time")


def ohlc_candles(
    events: DataFrame,
    watermark: str = DEFAULT_WATERMARK,
    window: str = "1 hour",
) -> DataFrame:
    """Watermarked OHLC candles per (event_type, window) — the
    STREAMING twin of the batch ``resample_ohlc_hourly`` registry
    query (same open/close semantics, same struct-ordering
    determinism; the batch/stream parity is pinned in
    tests/test_watermark.py).

    Open and close ride min/max over a (ts_sec, event_id, value)
    struct — both are map-combinable AND mergeable across
    micro-batches, so a candle stays correct no matter how its events
    split over batches; first()/last() would depend on batch arrival
    order. In append mode a candle emits exactly once, when the
    watermark passes its window end, and its state is then evicted —
    bounded by (horizon x active types), not stream length.
    """
    ev = with_event_time(events)
    if events.isStreaming:
        ev = ev.withWatermark("event_time", watermark)
    stamp = F.struct(
        F.col("ts_sec").alias("t"),
        F.col("event_id").alias("e"),
        F.col("value").alias("v"),
    )
    return (
        ev.groupBy(F.window("event_time", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.min(stamp).getField("v").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(stamp).getField("v").alias("close"),
        )
        .select(
            F.col("w.start").cast("long").alias("win_start_sec"),
            "event_type",
            "n_events",
            "open",
            "high",
            "low",
            "close",
        )
    )
