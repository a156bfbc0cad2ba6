"""Search-index freshness job — the TARGET_LAG analog.

The reference's search service auto-refreshed within 1 minute of base-table
change (CREATE CORTEX SEARCH SERVICE ... TARGET_LAG = '1 minute',
epa_ingestion.py:844-854). Spark-native equivalent: a Structured Streaming
job file-sourced on the chunks table path that incrementally maintains the
postings/stats index tables:

  readStream(parquet chunks dir)
    -> explode tokens -> append postings delta
  with trigger(processingTime='60 seconds')  # the 1-minute lag budget
  or trigger(availableNow=True)              # batch catch-up mode

Incremental contract: the chunks table is append-only between compactions
(the pipeline's delete-then-insert rechunk rewrites whole files, which the
file source picks up as new files), so appending per-file postings keeps
the index consistent; stats (df/idf) are recomputed by the reader at query
time from the postings aggregate — cheap because postings are pre-grouped.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..operators.search import _norm_tokens


def stream_postings(
    spark: SparkSession,
    chunks_path: str,
    chunk_schema: StructType,
    id_col: str = "CHUNK_ID",
    text_col: str = "CHUNK",
) -> DataFrame:
    """Streaming postings delta: (token, id, tf) per new chunk file."""
    stream = spark.readStream.schema(chunk_schema).parquet(chunks_path)
    return (
        stream.select(F.col(id_col).alias("id"), F.explode(_norm_tokens(F.col(text_col))).alias("token"))
        .groupBy("token", "id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def start_freshness_job(
    postings_delta: DataFrame,
    out_path: str,
    checkpoint: str,
    lag_seconds: int = 60,
    available_now: bool = False,
) -> StreamingQuery:
    """Run the index maintainer with the 1-minute freshness budget
    (``processingTime='60 seconds'``) or as a batch catch-up
    (``availableNow`` — drains everything then stops)."""
    writer = (
        postings_delta.writeStream.outputMode("update")
        .foreachBatch(lambda batch, epoch: batch.write.mode("append").parquet(out_path))
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{lag_seconds} seconds")
    return writer.start()
