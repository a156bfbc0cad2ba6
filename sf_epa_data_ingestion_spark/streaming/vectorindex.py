"""Streaming vector-index freshness: frozen-model IVF-PQ encoding of
arriving embeddings with exactly-once appends.

This is the vector-tier sibling of streaming/freshness.py (the lexical
index's TARGET_LAG analog — the reference's search service refreshed
within one minute of base-table change, epa_ingestion.py:844-854): a
retrieval corpus at 100 TB cannot re-train or re-encode its index when
documents arrive, so the pipeline splits FAISS-style into

- TRAIN (offline, batch): ``similarity.train_ivfpq`` fits the coarse
  cells + PQ codebooks on a historical sample — metadata-scale model
  (n_centroids*dim floats + m*ksub*dsub ints);
- ADD (continuous, here): each micro-batch of new embeddings is
  assigned its cell and encoded to 8-byte codes by
  ``similarity.encode_ivfpq`` with the FROZEN model (one Arrow pass,
  broadcast centroids, no shuffle), then appended exactly-once into the
  index table through the txlog txn marker. Newly ingested vectors are
  probe-visible as soon as the batch commits.

The index table is (vec_id, cid, codes) — at 100 TB it is written
bucketed/partitioned by ``cid`` so a query's n_probe cells become a
partition-pruned scan. Periodic re-training (cell drift) is a batch job
that writes a fresh table generation; the txlog's atomic swap makes the
cutover a metadata operation.

Id dedup follows streaming/ingest.py's two-stage design: in-batch (one
encoded row per id, lowest cid/codes tiebreak — a window over the
MB-scale micro-batch), then cross-batch, where the table IS the state
(left_anti join on the id column only; the STREAM side is the probe and
the corpus side is the anti-join's build side, so at corpus scale the
existing-id projection should be a narrow column scan — ids only, never
codes), so a cold restart needs no state-store migration. Same
single-writer discipline as ingest.py.
"""

from __future__ import annotations

from sf_epa_data_ingestion_spark.operators.similarity import encode_ivfpq
from sf_epa_data_ingestion_spark.storage.txlog import TxTable
from sf_epa_data_ingestion_spark.streaming.txsink import append_once


def vector_index_appender(
    table: TxTable,
    app_id: str,
    coarse: list[list[float]],
    cq: list[list[list[int]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_retries: int = 5,
    residual: bool = False,
):
    """Build a ``foreachBatch`` callable maintaining an IVF-PQ index table
    (schema: id_col, cid int, codes array<int>)::

        coarse, cq = similarity.train_ivfpq(historical_sample, dim=64)
        (embeddings.writeStream
            .foreachBatch(vector_index_appender(tbl, "vec-index", coarse, cq, 64))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start())

    Encoding is bit-identical to what ``ivfpq_topk`` would produce for
    the same vectors under the same model (pinned by test), so batch and
    streaming index builds are interchangeable.
    """

    def write_batch(batch_df, batch_id: int) -> None:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        last = table.last_txn(app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch: already durable
        enc = encode_ivfpq(
            batch_df, coarse, cq, dim, id_col=id_col, vec_col=vec_col,
            residual=residual,
        )
        # in-batch dedup: duplicate ids arriving WITHIN one micro-batch all
        # survive the cross-batch anti-join, so collapse to one encoded row
        # per id first (deterministic keep: lowest (cid, codes) — encoding
        # is a pure function of the vector, so true duplicates are
        # identical rows and any tiebreak returns the same codes).
        one = Window.partitionBy(id_col).orderBy(F.asc("cid"), F.asc("codes"))
        enc = (
            enc.withColumn("__rn", F.row_number().over(one))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        existing = table.read().select(id_col).distinct()
        fresh = enc.join(existing, id_col, "left_anti")
        append_once(table, fresh, app_id, batch_id, max_retries)

    return write_batch


def vector_index_maintainer(
    table: TxTable,
    app_id: str,
    coarse: list[list[float]],
    cq: list[list[list[int]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    change_col: str = "_change_type",
    max_retries: int = 5,
    residual: bool = False,
):
    """Build a ``foreachBatch`` callable maintaining an IVF-PQ index
    table from a CHANGE FEED — the delete-capable sibling of
    ``vector_index_appender`` (r9: the appender handled arrivals only,
    so a deleted or updated document's stale codes kept serving until a
    full re-encode; the reference's TARGET_LAG covers changes of every
    kind, epa_ingestion.py:844-854). Micro-batch rows are full row
    images tagged insert/delete in ``change_col`` (storage/txlog.changes'
    shape; an update is the usual delete+insert pair).

    Per batch: deletes first, as a file-granular CoW ``delete_where`` on
    the changed ids — IDEMPOTENT, so it needs no marker of its own —
    then the inserts encode under the frozen model and append with the
    batch's txn marker, exactly like the appender. Replay protocol: a
    marker at or below the recorded one skips the whole batch; a crash
    BETWEEN delete and append replays into "re-delete (no-op) + append"
    — neither table state double-counts, the same decisions-before-state
    reasoning streaming/semdedup.py documents.

    Scale: the delete's touched-file discovery is a broadcast semi-join
    of the change-set-sized id list against the index; over a
    cid-clustered layout with txlog min/max skipping only files holding
    a changed id rewrite. maintained == (rebuild of the final corpus
    under the same frozen model) row-for-row, pinned by test — encoding
    is a pure per-row function, so the equality is exact, not
    approximate."""

    def write_batch(batch_df, batch_id: int) -> None:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        last = table.last_txn(app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch: already durable
        deleted_ids = {
            r["id"]
            for r in batch_df.filter(F.col(change_col) == "delete")
            .select(F.col(id_col).alias("id")).distinct().collect()
        }
        if deleted_ids:
            table.delete_where(F.col(id_col).isin(sorted(deleted_ids)))
        inserts = batch_df.filter(F.col(change_col) == "insert")
        enc = encode_ivfpq(
            inserts, coarse, cq, dim, id_col=id_col, vec_col=vec_col,
            residual=residual,
        )
        one = Window.partitionBy(id_col).orderBy(F.asc("cid"), F.asc("codes"))
        enc = (
            enc.withColumn("__rn", F.row_number().over(one))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # cross-batch id guard: an id re-delivered WITHOUT a delete must
        # not duplicate its row. Ids deleted THIS batch are gone from the
        # table already, so the anti-join naturally admits their fresh
        # encodings (the update path).
        existing = table.read().select(id_col).distinct()
        fresh = enc.join(existing, id_col, "left_anti")
        append_once(table, fresh, app_id, batch_id, max_retries)

    return write_batch
