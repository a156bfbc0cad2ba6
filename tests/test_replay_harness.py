"""Pins for the graded-replay harness helpers in ``__spark_entry__``:
the deterministic micro-batch feed writer and the scoped state-partition
override. These carry four graded rows (late_data_replay,
running_user_stats_replay, dedup_stream_replay, and the feed pattern
generally), so their invariants get their own regression net."""

import glob
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402


def test_arrival_feed_orders_batches_by_mtime(spark, tmp_path):
    """One file per batch, strictly increasing mtimes 10 s apart —
    the property FileStreamSource's ms-granular ordering needs for the
    replay's batch identity to be deterministic."""
    feed = str(tmp_path / "feed")
    b = [
        spark.createDataFrame([(i,)], "v long") for i in range(3)
    ]
    entry._arrival_feed(b, feed)
    files = glob.glob(os.path.join(feed, "*.parquet"))
    assert len(files) == 3
    mtimes = sorted(os.path.getmtime(f) for f in files)
    assert mtimes[1] - mtimes[0] == pytest.approx(10.0, abs=0.1)
    assert mtimes[2] - mtimes[1] == pytest.approx(10.0, abs=0.1)
    # batch content follows mtime order: the oldest file is batch 0
    ordered = sorted(files, key=os.path.getmtime)
    vals = [spark.read.parquet(f).first()["v"] for f in ordered]
    assert vals == [0, 1, 2]


def test_replay_shuffle_partitions_scoped_restore(spark):
    """The override must restore the session default on exit AND on
    exception — a leaked 8 would silently shrink every later query's
    shuffle fan-out for the rest of the session."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    with entry._replay_shuffle_partitions(spark):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
    assert spark.conf.get("spark.sql.shuffle.partitions") == old

    with pytest.raises(RuntimeError, match="boom"):
        with entry._replay_shuffle_partitions(spark):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_replay_shuffle_partitions_scale_aware(spark, tmp_path):
    """r14: the pin derives from feed bytes on disk — fixture-sized
    feeds (<= 4 MB) keep the measured-optimal 8; larger feeds take the
    session's default parallelism (the production posture; the fixed 8
    was the sf1 sweep's worst derivative). Values are unaffected — this
    only sizes state/shuffle fan-out."""
    small = tmp_path / "small"
    small.mkdir()
    (small / "a.parquet").write_bytes(b"x" * 1024)
    with entry._replay_shuffle_partitions(spark, str(small)):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "8"

    big = tmp_path / "big"
    big.mkdir()
    (big / "a.parquet").write_bytes(b"x" * (5 * 1024 * 1024))
    with entry._replay_shuffle_partitions(spark, str(big)):
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(
            spark.sparkContext.defaultParallelism
        )
