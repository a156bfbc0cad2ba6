"""Atomic generation pointer for frozen-model serving state.

The streaming monitors and serving paths pin FROZEN models (SemDeDup's
coarse centroids, the vector index's IVF/PQ codebooks) so that every
decision is reproducible against a known model. The price is drift: a
model trained months ago no longer fits today's corpus. The managed
service the reference outsources to retrains invisibly (its search
service's TARGET_LAG reindex, epa_ingestion.py:844-854); the
self-hosted answer is a GENERATION CUTOVER — train model N+1 offline,
backfill its state as a batch job, then switch serving atomically while
the stream keeps running.

This module is the pointer half: a directory of generation records
where publishing is an EXCLUSIVE CREATE (the txlog's linearization
pattern), so concurrent publishers race safely and readers always see
either generation N or N+1, never a blend. The layout::

    root/
      _gens/00001.json     # {"gen": 1, ...meta} — commit record
      _gens/00002.json
      gen-00001/           # that generation's model + state live here
      gen-00002/

A generation's directory is fully built BEFORE its record is published,
so a crash mid-build leaves an orphaned directory and an intact pointer
— the same torn-write story as the txlog's staged files. Retirement
deletes directories strictly below the latest committed generation.

Single-writer discipline: a cutover re-reads the CURRENT generation's
state as its backfill source, so it must run from the same logical
writer as the monitor that appends to that state (between micro-batches
or from the foreachBatch itself) — a concurrent append after the
backfill read would be silently absent from the new generation.
"""

from __future__ import annotations

import json
import os
import shutil


class GenerationAlreadyPublished(RuntimeError):
    """Another writer published this generation number first."""


class GenerationStore:
    def __init__(self, root: str):
        self.root = root
        self.gens_dir = os.path.join(root, "_gens")

    def latest(self) -> int | None:
        """Highest committed generation number, or None before init."""
        gens = self.generations()
        return gens[-1] if gens else None

    def generations(self) -> list[int]:
        """All committed generation numbers, ascending."""
        if not os.path.isdir(self.gens_dir):
            return []
        return sorted(
            int(f[:-5])
            for f in os.listdir(self.gens_dir)
            if f.endswith(".json") and f[:-5].isdigit()
        )

    def path(self, gen: int) -> str:
        return os.path.join(self.root, f"gen-{gen:05d}")

    def meta(self, gen: int) -> dict:
        with open(os.path.join(self.gens_dir, f"{gen:05d}.json")) as f:
            return json.load(f)

    def publish(self, gen: int, meta: dict | None = None) -> None:
        """Atomically commit generation ``gen`` (its directory must be
        fully built). The payload is written and fsynced to a TEMP file
        first, then ``os.link``ed into place — link gives BOTH the
        exclusive-create race arbitration (EEXIST if another publisher
        won) and record-level atomicity: a crash can never leave a
        torn/empty record whose mere existence would brick ``latest()``
        for every reader while blocking any re-publish of the number
        (the failure mode of a bare O_EXCL open-then-write). The
        mechanics are the shared ``storage.txlog.PosixLinkCommit``
        (r12: one copy of the temp+fsync+link recipe, so the
        crash-window fixes cannot drift between the commit layer and
        the pointer layer; its tmp names carry pid + uuid, so two
        THREADS racing the same generation never share a tmp path)."""
        from sf_epa_data_ingestion_spark.storage.txlog import PosixLinkCommit

        os.makedirs(self.gens_dir, exist_ok=True)
        payload = json.dumps({"gen": gen, **(meta or {})}, indent=0)
        final = os.path.join(self.gens_dir, f"{gen:05d}.json")
        try:
            PosixLinkCommit().publish(final, payload)
        except FileExistsError as e:
            raise GenerationAlreadyPublished(
                f"generation {gen} already published at {self.root}"
            ) from e

    def prepare_dir(self, gen: int) -> str:
        """Make (or RESET) generation ``gen``'s build directory. An
        existing directory for an UNPUBLISHED generation is a crashed
        builder's orphan — invisible garbage by design — so it is
        cleared rather than raised on: without this, a crash mid-build
        would poison every retry (the state table's ``create_empty``
        hits FileExistsError forever, and an auto-retrain policy whose
        trigger condition still holds would fail every subsequent
        micro-batch). Refuses to touch a PUBLISHED generation's
        directory."""
        if gen in self.generations():
            raise GenerationAlreadyPublished(
                f"generation {gen} is published at {self.root}; its "
                "directory is immutable"
            )
        p = self.path(gen)
        if os.path.isdir(p):
            shutil.rmtree(p)
        os.makedirs(p)
        return p

    def retire_below(
        self, keep_latest: int = 2, retention_seconds: float = 0.0
    ) -> list[int]:
        """Delete generation DIRECTORIES older than the newest
        ``keep_latest`` ones (their commit records stay, recording
        history). Never touches the latest generation;
        ``keep_latest=0`` means keep ONLY the latest (r10 ADVICE: the
        old guard silently retired nothing for 0).

        ``retention_seconds`` is the live-reader guard (txlog vacuum's
        ``retention_seconds``, generation-unit): a generation is
        retired only once it has been SUPERSEDED for at least that long
        — i.e. its successor's commit record is older than the
        threshold — so any reader that resolved it before the cutover
        has had that long to finish. A reader that outlives the window
        fails CLOSED: its state table's log directory is gone, so every
        read raises FileNotFoundError ("no txlog table at ...") rather
        than returning partial rows (pinned by test). Returns the
        retired generation numbers."""
        if keep_latest < 0:
            raise ValueError(f"keep_latest must be >= 0, got {keep_latest}")
        latest = self.latest()
        if latest is None:
            return []
        gens = self.generations()
        kept = set(gens[-keep_latest:]) if keep_latest else {latest}
        victims = [g for g in gens if g < latest and g not in kept]
        if retention_seconds > 0:
            import time

            now = time.time()
            safe = []
            for g in victims:
                succ = min(x for x in gens if x > g)
                rec = os.path.join(self.gens_dir, f"{succ:05d}.json")
                if now - os.stat(rec).st_mtime >= retention_seconds:
                    safe.append(g)
            victims = safe
        retired = []
        for g in victims:
            p = self.path(g)
            if os.path.isdir(p):
                shutil.rmtree(p)
                retired.append(g)
        return retired


# -- shared model/state plumbing used by the SemDeDup and vector-index
#    generational services (one copy, so the crash-window fixes above
#    cannot drift between them) ------------------------------------------

# parsed-model cache keyed by (root, gen, record mtime): a published
# generation's model file is immutable (publish is exclusive and
# numbers are never reused within a store), so re-parsing a potentially
# centroids-sized JSON on EVERY micro-batch is pure waste — the
# monitors resolve the generation per batch by design. The record's
# mtime in the key means an rmtree-and-reinit at the same path (test
# harness, operational reset) can never serve the deleted store's
# model; the size cap bounds driver memory across a long stream of
# auto-retrain generations (oldest-inserted evicted).
_MODEL_CACHE: dict[tuple, dict] = {}
_MODEL_CACHE_MAX = 16


def build_generation(
    spark, root: str, gen: int, model: dict, table_name: str,
    table_schema: str,
):
    """Prepare generation ``gen``'s directory (clearing any crashed
    builder's orphan), write its model, and create its empty state
    table. Returns (gen_dir, TxTable). The caller backfills the table
    and then calls ``GenerationStore.publish`` LAST."""
    import json as _json
    import os as _os

    from sf_epa_data_ingestion_spark.storage.txlog import TxTable

    store = GenerationStore(root)
    gen_dir = store.prepare_dir(gen)
    with open(_os.path.join(gen_dir, "_model.json"), "w") as f:
        _json.dump(model, f)
    table = TxTable(spark, _os.path.join(gen_dir, table_name)).create_empty(
        table_schema
    )
    return gen_dir, table


def resolve_generation(spark, root: str, table_name: str):
    """(gen, model dict, TxTable) for the latest published generation,
    with the parsed model served from the immutability cache."""
    import json as _json
    import os as _os

    from sf_epa_data_ingestion_spark.storage.txlog import TxTable

    store = GenerationStore(root)
    gen = store.latest()
    if gen is None:
        raise FileNotFoundError(f"no published generation under {root}")
    record = _os.path.join(store.gens_dir, f"{gen:05d}.json")
    key = (_os.path.realpath(root), gen, _os.stat(record).st_mtime_ns)
    model = _MODEL_CACHE.get(key)
    if model is None:
        with open(_os.path.join(store.path(gen), "_model.json")) as f:
            model = _json.load(f)
        while len(_MODEL_CACHE) >= _MODEL_CACHE_MAX:
            _MODEL_CACHE.pop(next(iter(_MODEL_CACHE)))
        _MODEL_CACHE[key] = model
    return gen, model, TxTable(spark, _os.path.join(store.path(gen), table_name))
