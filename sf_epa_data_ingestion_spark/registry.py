"""Self-ordering grading registry: the shared ordering logic behind
``__spark_entry__.queries()`` and ``tools/check_freshness.py``.

The driver's per-round correctness harness grades only the FIRST
``WINDOW`` entries of ``queries()``, and the freshness gate requires
every query's newest hash-green driver row to be at most ``MAX_STALE``
rounds old. Through round 10 the registry satisfied that with a
hand-maintained two-phase ordering — and went red at the round boundary
three rounds running, because a STATIC ordering cannot be green both
before and after the driver drops the new ``CORRECTNESS_r{N}.json``:
the moment the head-50 get their green rows, the ordering that put them
first is exactly the one that leaves the tail stalest.

The fix (r10 VERDICT next-round #1) is to stop ordering by hand:
``queries()`` derives its order AT CALL TIME from the CORRECTNESS files
on disk — stalest newest-green first, never-graded queries before
everything, query name as the deterministic tiebreak. Whatever state
the tree is in, the window is by construction the 50 queries that most
need re-grading, so the gate is green at every state the builder or the
driver can produce (any query outside the window was green within the
last ``MAX_STALE`` rounds, provided the registry stays within the
``WINDOW * (MAX_STALE)``-query capacity the gate enforces).

No Spark imports here: ``tools/check_freshness.py`` must stay cheap to
run inside pytest and the preflight gate.
"""

from __future__ import annotations

import glob
import json
import os
import re

# The driver grades the first WINDOW queries() entries per round; the
# freshness gate allows a newest green row to be at most MAX_STALE
# rounds old for any query not about to be re-graded.
WINDOW = 50
MAX_STALE = 2


def last_green_rounds(repo_dir: str) -> dict[str, int]:
    """Newest hash-green driver round per query, parsed from the
    ``CORRECTNESS_r*.json`` files the driver drops at the repo root.
    Unreadable files are skipped (a half-written file must not brick
    ``queries()`` for the driver that is writing it)."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for q, v in data.items():
            if isinstance(v, dict) and v.get("hash_match"):
                last[q] = max(last.get(q, 0), rnd)
    return last


def graded_rounds(repo_dir: str) -> list[int]:
    """Ascending round numbers with a CORRECTNESS file present."""
    out = []
    for path in glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def stalest_first(names, last_green: dict[str, int]) -> list[str]:
    """Grading order: never-graded queries first (last green round 0),
    then oldest newest-green round first, name as the deterministic
    tiebreak. Pure function so the gate can simulate future rounds."""
    return sorted(names, key=lambda q: (last_green.get(q, 0), q))
