"""Stream-stream interval joins (north-star extension).

The reference joins only static tables (SURVEY §2.3); a streaming
pipeline additionally needs event-to-event correlation within a time
bound — the canonical case is attribution: join each purchase to the
clicks that preceded it within a window. One implementation serves both
batch DataFrames (range join, DuckDB-oracle-checkable) and streams
(watermarks bound the join state on both sides; without them
stream-stream inner joins buffer forever).

Scale notes (100 TB): the join shuffles both sides on user_id; the
interval predicate rides along as a post-probe filter, so the shuffle
volume is per-key, not per-pair. In streaming, state per side is
(arrival rate x watermark horizon) — the interval condition lets Spark
evict click state once purchase-side event time passes
click_ts + max_delay + watermark.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Join each purchase to every click by the same user in the
    preceding ``max_delay``. Returns
    (user_id, click_id, click_ts, purchase_id, purchase_ts, purchase_value).

    Works on batch DataFrames as a plain range join; on streaming inputs
    both sides get event-time watermarks (required for state cleanup —
    Spark rejects unbounded stream-stream inner joins on event time
    otherwise)."""
    c = clicks.select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("__p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("__p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    return c.join(p, cond).select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value"
    )
