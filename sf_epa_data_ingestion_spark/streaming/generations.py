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
        if not os.path.isdir(self.gens_dir):
            return None
        gens = [
            int(f[:-5])
            for f in os.listdir(self.gens_dir)
            if f.endswith(".json") and f[:-5].isdigit()
        ]
        return max(gens) if gens else None

    def path(self, gen: int) -> str:
        return os.path.join(self.root, f"gen-{gen:05d}")

    def meta(self, gen: int) -> dict:
        with open(os.path.join(self.gens_dir, f"{gen:05d}.json")) as f:
            return json.load(f)

    def publish(self, gen: int, meta: dict | None = None) -> None:
        """Atomically commit generation ``gen`` (its directory must be
        fully built). Exclusive create: a lost race raises instead of
        overwriting the winner's record."""
        os.makedirs(self.gens_dir, exist_ok=True)
        payload = json.dumps({"gen": gen, **(meta or {})}, indent=0)
        try:
            fd = os.open(
                os.path.join(self.gens_dir, f"{gen:05d}.json"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                0o644,
            )
        except FileExistsError as e:
            raise GenerationAlreadyPublished(
                f"generation {gen} already published at {self.root}"
            ) from e
        with os.fdopen(fd, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())

    def retire_below(self, keep_latest: int = 2) -> list[int]:
        """Delete generation DIRECTORIES older than the newest
        ``keep_latest`` ones (their commit records stay, recording
        history). Never touches the latest generation. Returns the
        retired generation numbers."""
        latest = self.latest()
        if latest is None:
            return []
        gens = sorted(
            int(f[:-5])
            for f in os.listdir(self.gens_dir)
            if f.endswith(".json") and f[:-5].isdigit()
        )
        victims = [g for g in gens[:-keep_latest] if g < latest] if keep_latest else []
        retired = []
        for g in victims:
            p = self.path(g)
            if os.path.isdir(p):
                shutil.rmtree(p)
                retired.append(g)
        return retired
