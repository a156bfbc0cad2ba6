"""Event-time streaming operators (north-star scope, SURVEY §2.10/§7-E).

The reference has no stream operators — its only streaming semantic is the
1-minute index freshness SLO. These are the extensions a training-data
pipeline needs, over an ``events(event_id, ts, user_id, event_type, value,
props)`` stream:

- tumbling / sliding window aggregation with watermarked late-data drop
- session windows (both the built-in ``session_window`` for streams and a
  gaps-and-islands batch form whose semantics a SQL oracle can replicate)
- JSON property extraction from the ``props`` column

Each transformation is expressed on a generic DataFrame so the *same
function* serves batch (testable, oracle-comparable) and streaming
(readStream input) — the Structured Streaming contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def with_watermark(events: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Late-data bound; on a batch DataFrame this is a no-op passthrough
    (Spark ignores watermarks in batch), so the same plan runs both modes."""
    return events.withWatermark(ts_col, delay) if events.isStreaming else events


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", ts_col: str = "ts", delay: str = "10 minutes"
) -> DataFrame:
    """Per-type counts/sums in tumbling event-time windows. ``delay`` is
    the watermark's late-data bound (streaming inputs only — batch
    inputs pass through ``with_watermark`` unchanged)."""
    return (
        with_watermark(events, ts_col, delay)
        .groupBy(F.window(ts_col, width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes", ts_col: str = "ts") -> DataFrame:
    return (
        with_watermark(events, ts_col)
        .groupBy(F.window(ts_col, width, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_windows_stream(events: DataFrame, gap: str = "30 minutes", ts_col: str = "ts") -> DataFrame:
    """Streaming-native session windows (merge events within ``gap``)."""
    return (
        with_watermark(events, ts_col)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"), F.col("w.end").alias("session_end"), "user_id", "n_events")
    )


def session_windows_batch(events: DataFrame, gap_minutes: int = 30, ts_col: str = "ts") -> DataFrame:
    """Batch gaps-and-islands sessionization — identical session boundaries
    to ``session_window`` and expressible in ANSI SQL for the oracle:
    a new session starts when the gap from the previous event exceeds
    ``gap_minutes``; session id = running count of starts per user."""
    w_user = Window.partitionBy("user_id").orderBy(F.col(ts_col), F.col("event_id"))
    # integer epoch-micros (session tz is UTC) — gap compare is exact, no
    # float rounding at session boundaries
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    flagged = events.withColumn(
        "new_session",
        F.when(us - F.lag(us).over(w_user) > gap_minutes * 60_000_000, 1).otherwise(0).cast("long"),
    ).withColumn("session_id", F.sum("new_session").over(w_user.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        flagged.groupBy("user_id", "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def extract_props(events: DataFrame, keys: tuple[str, ...] = ("k",), props_col: str = "props") -> DataFrame:
    """JSON property extraction (phase E): one typed column per key."""
    out = events
    for k in keys:
        out = out.withColumn(k, F.get_json_object(F.col(props_col), f"$.{k}"))
    return out
