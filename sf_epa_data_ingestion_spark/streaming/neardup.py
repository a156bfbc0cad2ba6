"""Incremental near-duplicate detection over a document stream.

Batch near-dup (operators/dedup.minhash_lsh_pairs) answers "which pairs in
THIS corpus are near-dups"; a continuously-ingesting corpus needs the
incremental question: "is this NEW document a near-dup of anything seen so
far?" — asked once per arriving micro-batch, without re-scoring the whole
history pairwise.

Design (the streaming face of the same banded-LSH index):
- STATE = a txlog table of (id, sig): one MinHash signature row per
  document ever seen. The signature is the sufficient statistic — raw
  text never enters the state.
- per micro-batch: sign the batch, expand batch + state signatures into
  narrow (id, band_id, band_hash) bucket rows (the SAME banding as the
  batch operator — shared ``minhash_band_rows``), equi-join buckets to get
  candidates (batch x history plus batch-internal), verify every unique
  candidate pair by signature agreement, append pairs >= threshold to the
  RESULTS txlog table, then append the batch's signatures to state.
- exactly-once under foreachBatch replay: results and state each carry
  their own txn marker; pairs commit BEFORE state, so a crash between the
  two replays into "skip pairs (already committed), redo state" — neither
  table ever double-counts a batch.

Scale notes (100 TB): the per-batch probe joins batch bucket rows against
history bucket rows re-derived from the state signatures — an O(history)
expression + shuffle per batch, which is the right simplicity below ~10^8
documents (signatures are ~0.5 KB/doc). Beyond that, use
``near_dup_monitor_banded`` (r10, bottom of this module): band rows
persisted in their own bucketed state table so a batch probes only its
own band buckets through txlog data skipping; detection semantics are
identical (parity-pinned).

Single-writer discipline: like streaming/ingest.py, the state read at
batch start is the dedup horizon; run one logical writer per state table.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from sf_epa_data_ingestion_spark.operators.dedup import (
    minhash_band_rows,
    minhash_signature_rows,
)
from sf_epa_data_ingestion_spark.partitioning import spread
from sf_epa_data_ingestion_spark.storage.txlog import TxTable
from sf_epa_data_ingestion_spark.streaming.txsink import (
    append_once,
    commit_staged_once,
    maybe_compact_state,
)


def _signatures(batch_df, id_col, text_col, num_hashes, shingle_k):
    # same Arrow signature stage as batch minhash_lsh_pairs, so the
    # monitor probes byte-identical buckets
    return minhash_signature_rows(
        spread(batch_df.filter(F.col(text_col).isNotNull()), F.col(id_col)),
        text_col, id_col, num_hashes, shingle_k,
    )


def near_dup_monitor(
    state: TxTable,
    pairs_out: TxTable,
    app_id: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 8,
    threshold: float = 0.7,
    max_retries: int = 5,
    compact_files: int | None = 16,
    compact_target_files: int = 4,
    compact_vacuum_keep: int | None = None,
    write_partitions: int = 1,
):
    """Build a ``foreachBatch`` callable that detects near-dups of every
    arriving document against the full ingestion history.

    ``state`` schema: (id long, sig array<long>); ``pairs_out`` schema:
    (id_a long, id_b long, est_jaccard double) where ``id_b`` is always
    the NEW document and ``id_a`` the earlier one (id_a < id_b holds for
    batch-internal pairs too, since ids are assigned in arrival order).

    Fixed-cost shape (r11, the semdedup 931a3f3 treatment): the batch's
    signatures are computed ONCE — the staged state append materializes
    them into the cache, the pairs plan reads the cache, and the state
    commit at the end is pure metadata (``commit_staged_once``). With
    ``write_partitions=1`` both per-batch appends are single-file, so
    their skipping stats ride the write's own Observation instead of a
    separate per-file stats job (raise it for genuinely large
    micro-batches). A brand-new state table (``row_count() == 0`` —
    metadata-only) skips the history read, the history band expansion,
    and the cross join entirely.

    ``compact_files``: the signature history is re-read WHOLE every
    batch (the probe expresses bands from it), so its cost driver is
    live-file COUNT — one tiny file per processed batch without
    maintenance. Once that many small files accumulate they are
    bin-packed (txsink.maybe_compact_state, change-proportional), under
    the same single-writer discipline as the appends; None disables.
    """
    rows_per_band = num_hashes // bands

    def write_batch(batch_df, batch_id: int) -> None:
        if (last := state.last_txn(app_id)) is not None and batch_id <= last:
            return  # fully processed (state commits LAST)
        empty_state = state.row_count() == 0
        # Re-delivery guard: a doc id can arrive again in a LATER batch (at-
        # least-once upstream) or twice within one batch. Without the drop,
        # state would hold two sig rows for the id and every candidate pair
        # it joins would fan out into duplicate output rows.
        batch_df = batch_df.dropDuplicates([id_col])
        if not empty_state:
            seen = state.read().select("id", "sig")
            batch_df = batch_df.join(
                seen.select(F.col("id").alias(id_col)), id_col, "left_anti"
            )
        sig = _signatures(batch_df, id_col, text_col, num_hashes, shingle_k).persist()
        # ONE job computes the signatures into the cache AND stages the
        # state bytes; everything below reads the cache, and the state
        # commit (LAST, exactly-once ordering preserved) is metadata-only
        staged_state = state.stage_for_append(sig.repartition(write_partitions))
        new_bands = minhash_band_rows(sig, bands, rows_per_band)
        a2, b2 = new_bands.alias("a"), new_bands.alias("b")
        internal = a2.join(
            b2,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        if empty_state:
            cand = internal.dropDuplicates(["id_a", "id_b"])
            all_sigs = sig
        else:
            old_bands = minhash_band_rows(seen, bands, rows_per_band)
            a_new, b_old = new_bands.alias("a"), old_bands.alias("b")
            cross = a_new.join(
                b_old,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash")),
            ).select(F.col("b.id").alias("id_a"), F.col("a.id").alias("id_b"))
            cand = cross.unionByName(internal).dropDuplicates(["id_a", "id_b"])
            all_sigs = seen.unionByName(sig)
        agree = F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        )
        pairs = (
            cand.join(
                all_sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")),
                "id_a",
            )
            .join(
                sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
                "id_b",
            )
            .select(
                "id_a",
                "id_b",
                (agree.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
            )
            .filter(F.col("est_jaccard") >= threshold)
        )
        # pairs FIRST, state LAST: a crash in between replays into
        # "pairs already committed (marker) -> skip; state redone".
        append_once(
            pairs_out, pairs.repartition(write_partitions),
            app_id, batch_id, max_retries,
        )
        commit_staged_once(state, staged_state, app_id, batch_id, max_retries)
        sig.unpersist()
        maybe_compact_state(
            state, compact_files, target_files=compact_target_files,
            vacuum_keep=compact_vacuum_keep,
        )

    return write_batch


def near_dup_monitor_banded(
    state_sigs: TxTable,
    state_bands: TxTable,
    pairs_out: TxTable,
    app_id: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 8,
    threshold: float = 0.7,
    n_buckets: int = 256,
    max_retries: int = 5,
    compact_files: int | None = 16,
    compact_target_files: int = 4,
    compact_vacuum_keep: int | None = None,
):
    """The beyond-10^8-documents form this module's scale note
    prescribes: band rows are PERSISTED in their own state table
    (id, band_id, band_hash, __bb) instead of re-derived from every
    historical signature each batch — the plain monitor's per-batch
    probe re-expands O(history) band rows, which is the right
    simplicity at millions of docs and the wrong constant at billions.

    - ``__bb = pmod(xxhash64(band_hash), n_buckets)`` buckets the band
      space; the batch probes only its own buckets through the txlog
      skipping read (``("__bb", "in", hit)``) — with the in-monitor
      compaction clustering by ``__bb``, a seconds-of-arrivals batch
      opens a bounded subset of band files. (A bulk catch-up batch hits
      every bucket; the probe degrades to a full band scan, never to
      wrong results.)
    - signatures stay in ``state_sigs`` for candidate VERIFICATION only
      (sig agreement), bucketed by ``__sb = pmod(xxhash64(id),
      n_buckets)`` exactly like the band table (r10 ADVICE: an
      unbucketed verification read re-scanned the WHOLE signature
      history each batch — the very O(history) constant the banded
      variant exists to remove). The verification read prunes to the
      candidate ids' buckets through txlog file skipping; with the
      in-monitor compaction clustering by ``__sb``, a small batch opens
      a bounded subset of signature files.
    - exactly-once across THREE tables: pairs first, bands second, sigs
      LAST — each append carries its own (app, batch) marker through
      ``append_once``, so a crash between any two replays into
      "committed tables acknowledge, missing tables redo"; the monitor
      gates on sigs (the last) like the plain monitor gates on state.

    Detection semantics are identical to ``near_dup_monitor`` (same
    signature stage, same banding, same verification) — pinned by a
    parity test."""
    rows_per_band = num_hashes // bands

    # FAIL FAST on the pre-r11 state_sigs schema (id, sig): the r11
    # bucketed verification appends a __sb column and its pruned read
    # applies a residual `__sb IN (...)` row filter — legacy rows with
    # a null __sb would be SILENTLY dropped from verification (missed
    # pairs, no error). There is no sound in-place migration: recreate
    # the table with `create_empty("id long, sig array<long>, __sb
    # int")` and backfill `__sb = pmod(xxhash64(id), n_buckets)`.
    sig_schema = {f.name for f in state_sigs.read().schema.fields}
    if "__sb" not in sig_schema:
        raise ValueError(
            f"state_sigs table at {state_sigs.root} lacks the __sb "
            "bucket column (pre-r11 schema); recreate it as 'id long, "
            "sig array<long>, __sb int' and backfill __sb = "
            f"pmod(xxhash64(id), {n_buckets}) before resuming"
        )

    def _bb(col):
        return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")

    def write_batch(batch_df, batch_id: int) -> None:
        if (last := state_sigs.last_txn(app_id)) is not None and batch_id <= last:
            return  # fully processed (sigs commit LAST)
        empty_state = state_sigs.row_count() == 0  # metadata-only
        batch_df = batch_df.dropDuplicates([id_col])
        if not empty_state:
            seen_ids = state_sigs.read().select("id")
            batch_df = batch_df.join(
                seen_ids.select(F.col("id").alias(id_col)), id_col, "left_anti"
            )
        sig = _signatures(batch_df, id_col, text_col, num_hashes, shingle_k).persist()
        new_bands = minhash_band_rows(sig, bands, rows_per_band).withColumn(
            "__bb", _bb(F.col("band_hash"))
        ).persist()
        a2, b2 = new_bands.alias("a"), new_bands.alias("b")
        internal = a2.join(
            b2,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        if empty_state:
            cand = internal.dropDuplicates(["id_a", "id_b"]).persist()
            all_sigs = sig
        else:
            hit = sorted(
                r["__bb"] for r in new_bands.select("__bb").distinct().collect()
            )
            old_bands = state_bands.read(filters=[("__bb", "in", hit)])
            a_new, b_old = new_bands.alias("a"), old_bands.alias("b")
            cross = a_new.join(
                b_old,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash")),
            ).select(F.col("b.id").alias("id_a"), F.col("a.id").alias("id_b"))
            cand = (
                cross.unionByName(internal)
                .dropDuplicates(["id_a", "id_b"])
                .persist()
            )
            # verification sigs: prune the history read to the candidate
            # ids' buckets (id_b is always batch-side, served from `sig`;
            # only id_a can live in history). Bounded collect: <=
            # n_buckets ints. An empty candidate set prunes every file —
            # correct and free.
            cand_sb = sorted(
                r["__sb"]
                for r in cand.select(_bb(F.col("id_a")).alias("__sb"))
                .distinct()
                .collect()
            )
            old_sigs = (
                state_sigs.read(filters=[("__sb", "in", cand_sb)])
                .select("id", "sig")
            )
            all_sigs = old_sigs.unionByName(sig)
        agree = F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        )
        pairs = (
            cand.join(
                all_sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")),
                "id_a",
            )
            .join(
                sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
                "id_b",
            )
            .select(
                "id_a",
                "id_b",
                (agree.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
            )
            .filter(F.col("est_jaccard") >= threshold)
        )
        # pairs -> bands -> sigs: per-table markers make every prefix
        # crash-replayable; sigs (the gate) commits LAST
        append_once(pairs_out, pairs, app_id, batch_id, max_retries)
        append_once(state_bands, new_bands, app_id, batch_id, max_retries)
        append_once(
            state_sigs,
            sig.withColumn("__sb", _bb(F.col("id"))),
            app_id, batch_id, max_retries,
        )
        cand.unpersist()
        new_bands.unpersist()
        sig.unpersist()
        maybe_compact_state(
            state_bands, compact_files, cluster_by=["__bb"],
            target_files=compact_target_files, vacuum_keep=compact_vacuum_keep,
        )
        maybe_compact_state(
            state_sigs, compact_files, cluster_by=["__sb"],
            target_files=compact_target_files, vacuum_keep=compact_vacuum_keep,
        )

    return write_batch
