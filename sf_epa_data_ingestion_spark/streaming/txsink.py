"""Exactly-once Structured Streaming sink into a txlog table.

Structured Streaming's foreachBatch gives at-least-once: after a crash
between "batch written" and "checkpoint advanced", the engine REPLAYS the
last micro-batch. A plain parquet-append sink duplicates those rows; the
reference's warehouse MERGE absorbed them idempotently. The txlog sink
restores exactly-once the way Delta's streaming sink does (public design:
the txn/appId action): every commit carries an idempotence marker
``{"app": <query id>, "batch": <micro-batch id>}``, and a replayed batch
id <= the highest committed one is acknowledged without writing.

The marker and the data files land in the SAME atomic commit, so there is
no window where data is visible but the marker is not (or vice versa) —
the dedup decision and the append are one linearization point.

Scale notes: ``last_txn`` is a driver-side scan of the JSON log
(metadata-scale); the data write is a normal distributed job. A
``ConcurrentCommitError`` (another writer advanced the log between
version resolution and publish) is retried after re-reading the log,
re-checking the marker so a concurrent replica of the same query that
already committed our batch turns the retry into a no-op.
"""

from __future__ import annotations

from sf_epa_data_ingestion_spark.storage.txlog import (
    ConcurrentCommitError,
    TxTable,
)


def append_once(
    table: TxTable, df, app_id: str, batch_id: int, max_retries: int = 5
) -> None:
    """Append ``df`` to ``table`` exactly once for ``(app_id, batch_id)``:
    a batch id at or below the table's recorded marker is acknowledged
    without writing; a ``ConcurrentCommitError`` re-reads the log and
    re-checks the marker (a concurrent replica that already committed our
    batch turns the retry into a no-op). The ONE copy of the replay
    protocol — every foreachBatch sink in this package
    (``exactly_once_appender``, streaming/ingest.py, streaming/neardup.py)
    routes through it so the semantics cannot drift."""
    for _ in range(max_retries):
        last = table.last_txn(app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch: already durable, acknowledge
        try:
            table.append(df, txn={"app": app_id, "batch": int(batch_id)})
            return
        except ConcurrentCommitError:
            continue  # log advanced under us: re-check marker, retry
    raise ConcurrentCommitError(
        f"gave up appending batch {batch_id} for {app_id!r} "
        f"after {max_retries} conflicts"
    )


def commit_staged_once(
    table: TxTable, staged: dict, app_id: str, batch_id: int, max_retries: int = 5
) -> None:
    """The ``append_once`` protocol for a pre-staged append
    (``TxTable.stage_for_append``): same marker check, same conflict
    retry — but a retry only re-publishes the already-staged files, it
    never re-runs the distributed write."""
    for _ in range(max_retries):
        last = table.last_txn(app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch: already durable, acknowledge
        try:
            table.commit_staged(staged, txn={"app": app_id, "batch": int(batch_id)})
            return
        except ConcurrentCommitError:
            continue  # log advanced under us: re-check marker, retry
    raise ConcurrentCommitError(
        f"gave up committing staged batch {batch_id} for {app_id!r} "
        f"after {max_retries} conflicts"
    )


def maybe_compact_state(
    table: TxTable,
    files_threshold: int | None,
    cluster_by=None,
    target_files: int = 4,
    small_bytes: int = 64 << 20,
    vacuum_keep: int | None = None,
) -> bool:
    """In-monitor state maintenance (single-writer discipline: call this
    from the SAME foreachBatch that owns the table, after its commit for
    the batch). Every txlog append adds files, so a long-running stream
    degrades two ways without maintenance: file-listing cost grows with
    batch count, and — for cell/bucket-probed state — per-file bounds
    sprawl until the skipping read degenerates to a full scan.

    Triggers when the table's live SMALL-file count (< ``small_bytes``)
    reaches ``files_threshold``, then bin-packs only those small files
    (``only_small_bytes``), clustered by ``cluster_by`` so probe columns
    get tight per-file bounds again. Change-proportional by
    construction: compacted generations exceed the size threshold and
    are never rewritten, so maintenance cost follows recent append
    volume, not corpus size. Compaction is idempotent maintenance
    OUTSIDE the exactly-once protocol — it rewrites bytes, never rows,
    so a crash before/after it changes nothing about replay, and a
    replayed batch that skips it just leaves the work for the next
    fresh batch. Returns True when a compaction ran.

    ``vacuum_keep``: also physically reclaim files not live in the
    newest that-many snapshots after a compaction — compaction alone
    bounds the LIVE file count while removed generations keep
    accumulating on disk forever. Opt-in, because vacuuming breaks time
    travel past the retained window for any downstream consumer; safe
    under the monitor's single-writer discipline (retention 0 is sound
    only because no OTHER writer can be mid-stage on this table)."""
    if not files_threshold:
        return False
    import os

    small = [
        f for f in table.read_files()
        if os.path.getsize(os.path.join(table.root, f)) < small_bytes
    ]
    if len(small) < files_threshold:
        return False
    table.compact(
        cluster_by=cluster_by,
        target_files=target_files,
        only_small_bytes=small_bytes,
    )
    if vacuum_keep:
        table.vacuum(keep_versions=vacuum_keep, retention_seconds=0.0)
    return True


def exactly_once_appender(table: TxTable, app_id: str, max_retries: int = 5):
    """Build a ``foreachBatch`` callable appending into ``table`` with
    exactly-once semantics under micro-batch replay::

        (df.writeStream
           .foreachBatch(exactly_once_appender(tbl, "events-ingest"))
           .option("checkpointLocation", ckpt)
           .trigger(availableNow=True)
           .start())

    ``app_id`` must be stable across restarts of the logical query (use
    your own name, not the engine's random run id) — it is the dedup key.
    """

    def write_batch(batch_df, batch_id: int) -> None:
        append_once(table, batch_df, app_id, batch_id, max_retries)

    return write_batch
