"""Streaming training-data ingestion: quality gate -> dedup -> exactly-once
transactional append.

This is the composed form of the engine's training-data operators as a
continuous pipeline — the shape a 100 TB corpus build actually runs
(documents arrive forever; the corpus table must only ever grow by clean,
novel text):

1. C4/Gopher quality gate (operators/cleaning.c4_quality_filter) drops
   low-quality documents inside the micro-batch; optionally followed by
   the TRAINED model gate (operators/quality_model) — a pre-trained
   weight table scored against each batch (r6 VERDICT next-round #5).
   Training NEVER happens in the stream: the model is ``dim`` ints plus
   a bias, fit offline by ``train_quality_lr`` and broadcast per batch
   by ``score_docs_lr`` — exactly how a learned filter deploys at
   100 TB (fit on a sample, apply at wire speed).
2. In-batch exact dedup: lowest-id row per normalized-text digest
   (same keep-lowest contract as operators/dedup.exact_dedup).
3. Cross-batch exact dedup: anti-join the batch's digests against the
   digests already in the target table — the table itself is the dedup
   state, so there is no unbounded streaming state store to manage and a
   cold restart needs no state migration.
4. Exactly-once append through the txlog txn marker (streaming/txsink
   design): a replayed micro-batch is acknowledged without writing.

Scale notes: the gate and digest are per-row expressions (scan speed);
the in-batch dedup shuffles one micro-batch by digest; the cross-batch
anti-join ships only (digest) columns of the corpus — Catalyst broadcasts
the BATCH side when it is small (the common case: micro-batches are MBs
against a TB corpus table), so the corpus never reshuffles per batch. At
very large corpus sizes the digest scan rides txlog data skipping /
column pruning (only `text_hash` is read).

Single-writer discipline: the anti-join reads the table snapshot at batch
start; two concurrent writers could both admit the same new digest. Run
one logical writer per table (the txn marker already requires a stable
``app_id``); multi-writer dedup belongs in a MERGE, at the cost of a
per-batch join against the full table.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from sf_epa_data_ingestion_spark.operators.cleaning import c4_keep_expr
from sf_epa_data_ingestion_spark.operators.dedup import normalized_text
from sf_epa_data_ingestion_spark.operators.quality_model import score_docs_lr
from sf_epa_data_ingestion_spark.storage.txlog import TxTable
from sf_epa_data_ingestion_spark.streaming.txsink import (
    append_once,
    maybe_compact_state,
)


def training_doc_appender(
    table: TxTable,
    app_id: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_retries: int = 5,
    quality_model: tuple[dict[int, int], int] | None = None,
    min_score_fp: int | None = None,
    compact_files: int | None = 16,
    compact_target_files: int = 4,
    compact_vacuum_keep: int | None = None,
    write_partitions: int = 1,
    dedup_probe_cap: int | None = None,
):
    """Build a ``foreachBatch`` callable ingesting documents into ``table``
    (schema: source columns + ``text_hash``) with quality gating, exact
    dedup against everything already ingested, and exactly-once appends::

        model = quality_model.train_quality_lr(labeled_sample)   # offline
        (docs.writeStream
             .foreachBatch(training_doc_appender(
                 tbl, "doc-ingest",
                 quality_model=model, min_score_fp=QLR_ONE // 2))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())

    ``quality_model`` is a pre-trained (weights, bias) from
    ``train_quality_lr``; when given, each batch is scored via
    ``score_docs_lr`` (one broadcast join of the dim-row weight table —
    no training, no state) and only docs with ``score_fp >=
    min_score_fp`` are admitted. ``min_score_fp`` defaults to
    ``QLR_ONE // 2`` (the hard sigmoid's 0.5 point) when a model is set.

    ``compact_files``: the cross-batch dedup anti-join re-reads the
    table's digest column every batch, and each commit adds files — so
    once that many SMALL live files accumulate they are bin-packed
    (txsink.maybe_compact_state, change-proportional: compacted
    generations are never rewritten) after the batch's commit, under the
    single-writer discipline. None disables.

    ``dedup_probe_cap``: the trickle-ingestion fast path. When set and a
    batch carries at most this many distinct digests, the cross-batch
    anti-join reads the state through
    ``table.read(filters=[("text_hash", "in", digests)])`` instead of a
    full scan — md5 digests are uniform, so per-file [min, max] bounds
    NEVER prune them; with ``table.set_bloom("text_hash")`` the bitmap
    skips every state file holding none of the batch's digests. Sound
    for the anti-join: an omitted file contributes no matches by proof,
    and state rows outside the probe set can't match either. The batch
    is persisted for the digest collect (it feeds both the probe and
    the append) and unpersisted after the commit. Choose a cap the
    ``isin`` residual stays comfortable with (<= a few thousand);
    larger batches silently fall back to the full scan — so enabling
    this never regresses the bulk-load shape, it only accelerates the
    small-batch-into-huge-state one (the 100 TB serving regime: a
    minutely feed of thousands of docs probing a billion-row state).
    """
    if quality_model is not None and min_score_fp is None:
        from sf_epa_data_ingestion_spark.functions.refhash import QLR_ONE

        min_score_fp = QLR_ONE // 2

    def write_batch(batch_df, batch_id: int) -> None:
        last = table.last_txn(app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch: already durable
        # the C4 gate filters IN PLACE (shared keep expression with
        # c4_quality_filter) — per-row codegen at scan speed, no flags
        # join back on id (r11 fixed-cost shave: that join was a shuffle
        # of the whole micro-batch for a predicate computable inline)
        kept = (
            batch_df.filter(c4_keep_expr(text_col))
            .withColumn("text_hash", F.md5(normalized_text(F.col(text_col))))
        )
        pinned = []  # persisted frames to release after the commit
        if quality_model is not None:
            # the model gate's semi-join makes the GATED batch a
            # self-join: without the persist, both subtrees re-evaluate
            # the C4 keep expression and the digest md5 over the raw
            # batch (r12 fixed-cost shave — ~15% of the replay's
            # per-batch wall-clock at sf0.1)
            kept = kept.persist()
            pinned.append(kept)
            weights, bias = quality_model
            scores = score_docs_lr(kept, weights, bias, text_col, id_col).filter(
                F.col("score_fp") >= F.lit(min_score_fp)
            )
            kept = kept.join(
                scores.select(F.col("id").alias(id_col)), id_col, "left_semi"
            )
        # in-batch dedup: deterministic keep-lowest-id per digest (ids are
        # unique within a batch, so min_by has no ties — same contract the
        # previous row_number(orderBy id) window had). The aggregate form
        # does map-side PARTIAL aggregation: at most one surviving row per
        # (map partition, digest) reaches the exchange and nothing is
        # sorted, where the window shipped AND sorted every duplicate —
        # the guide's "aggregate before you shuffle" shape, and the same
        # form operators/dedup.exact_dedup has always used.
        payload = [c for c in kept.columns if c != "text_hash"]
        kept = (
            kept.groupBy("text_hash")
            .agg(F.min_by(F.struct(*payload), F.col(id_col)).alias("__keep"))
            .select(*[F.col(f"__keep.{c}").alias(c) for c in payload], "text_hash")
        )
        # cross-batch dedup: the table IS the state (digest column only).
        # A brand-new table (row_count() == 0 — metadata-only) skips the
        # anti-join stage entirely (r11 fixed-cost shave); with
        # write_partitions=1 the append is single-file so its skipping
        # stats ride the write's Observation instead of a separate
        # per-file stats job.
        try:
            if table.row_count() > 0:
                existing = None
                if dedup_probe_cap:
                    # the digest collect and the append both consume the
                    # post-window frame — persist it so the probe isn't
                    # paid twice (independent of the gate-stage persist)
                    kept = kept.persist()
                    pinned.append(kept)
                    digests = [
                        r["text_hash"]
                        for r in kept.select("text_hash").distinct()
                        .limit(int(dedup_probe_cap) + 1).collect()
                    ]
                    if len(digests) <= int(dedup_probe_cap):
                        existing = (
                            table.read(filters=[("text_hash", "in", digests)])
                            .select("text_hash").distinct()
                        )
                if existing is None:
                    existing = table.read().select("text_hash").distinct()
                kept = kept.join(existing, "text_hash", "left_anti")
            append_once(
                table, kept.repartition(write_partitions),
                app_id, batch_id, max_retries,
            )
        finally:
            for df in pinned:
                df.unpersist()
        maybe_compact_state(
            table, compact_files, target_files=compact_target_files,
            vacuum_keep=compact_vacuum_keep,
        )

    return write_batch
