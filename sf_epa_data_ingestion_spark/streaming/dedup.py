"""Streaming deduplication with bounded state (north-star extension).

The reference's incremental discipline is batch anti-joins against
already-processed metadata (epa_ingestion.py:454-456); the streaming
analog must drop duplicates ON THE WAY IN without unbounded state. Two
tiers:

- ``dedup_stream``: ``dropDuplicatesWithinWatermark`` on a content key —
  exact within the watermark horizon, state evicted as event time
  advances. This is the 100 TB shape: state is partitioned by key across
  executors and bounded by (arrival rate x watermark), not corpus size.
- ``dedup_stream_exact``: plain ``dropDuplicates`` — exact forever but
  state grows with distinct keys; only for bounded key domains.

The content key defaults to ``md5`` of the normalized text, matching the
batch ``operators/dedup.exact_dedup`` digest, so a backfill (batch) and
the live stream dedupe identically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from sf_epa_data_ingestion_spark.operators.dedup import normalized_text


def with_content_key(
    df: DataFrame, text_col: str = "text", key_col: str = "text_hash"
) -> DataFrame:
    """Attach the batch-identical dedup digest (md5 of normalized text)."""
    return df.withColumn(key_col, F.md5(normalized_text(F.col(text_col))))


def dedup_stream(
    stream: DataFrame,
    ts_col: str,
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked streaming dedup: keep ONE representative per content
    digest (the first across micro-batches; arbitrary within a batch);
    duplicates arriving within ``watermark`` of the original are
    dropped, and the key's state is evicted once the watermark passes it.
    Late duplicates beyond the horizon are NOT caught — that is the
    bounded-state trade; pair with a periodic batch ``exact_dedup``
    backfill for the long tail."""
    return (
        with_content_key(stream, text_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def dedup_stream_exact(
    stream: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Unbounded-state streaming dedup (exact forever). State is
    O(distinct digests) in the state store — use only when the key domain
    is bounded; prefer ``dedup_stream`` at scale."""
    return with_content_key(stream, text_col).dropDuplicates(["text_hash"])
