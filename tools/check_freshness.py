#!/usr/bin/env python3
"""Driver-window freshness gate (r6 VERDICT next-round #7, rebuilt r11).

The driver's per-round correctness harness grades only the FIRST 50
entries of ``queries()``. Since r11 the registry is SELF-ORDERING
(``__spark_entry__.queries()`` sorts stalest-newest-green-first via
``sf_epa_data_ingestion_spark.registry`` at call time), so this gate no
longer checks a hand-maintained ordering — it checks the INVARIANT that
makes the dynamic ordering sufficient: at the round being prepared, and
(with ``--assume-window-green``) at the next ``MAX_STALE + 1`` simulated
rounds, every query outside the derived window has a green row at most
``MAX_STALE`` rounds old. The only way to go red is a real capacity or
evidence problem (registry grown past WINDOW * MAX_STALE queries, or a
round that was never graded), never the round-boundary state the static
ordering was structurally red in (r8–r10).

Usage:

    python tools/check_freshness.py                  # next round = max seen + 1
    python tools/check_freshness.py 12               # explicit next round
    python tools/check_freshness.py --assume-window-green
    python tools/check_freshness.py --repo /tmp/x    # CORRECTNESS files there

``--repo`` points at a directory holding CORRECTNESS_r*.json (the
registry membership always comes from this repo's source) — it exists
so tests can replay arbitrary grading states, including the
post-grading round boundary.
"""
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sf_epa_data_ingestion_spark.registry import (  # noqa: E402
    MAX_STALE,
    WINDOW,
    graded_rounds,
    last_green_rounds,
    stalest_first,
)


def registry_names() -> list[str]:
    """Parse the registry membership from the source literal — the gate
    must stay import-light (no pyspark). tests/test_tools.py pins this
    parse against the real ``queries()`` keys."""
    src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    m = re.search(r"def _registry_base\(\).*?return \{(.*?)\n    \}", src, re.S)
    if not m:
        raise RuntimeError("could not locate _registry_base() literal dict")
    return re.findall(r'"([a-z0-9_]+)":\s*q_', m.group(1))


def main() -> int:
    argv = sys.argv[1:]
    assume = "--assume-window-green" in argv
    repo_dir = REPO
    if "--repo" in argv:
        i = argv.index("--repo")
        if i + 1 >= len(argv):
            print("usage: check_freshness.py [round] [--assume-window-green] [--repo DIR]")
            return 2
        repo_dir = argv[i + 1]
        del argv[i:i + 2]  # positional removal: a value that happens to
        # equal another token must not strip that token too
    args = [a for a in argv if a != "--assume-window-green"]

    last_green = last_green_rounds(repo_dir)
    rounds = graded_rounds(repo_dir)
    if not rounds:
        print("no CORRECTNESS_r*.json found — nothing to check")
        return 0
    next_round = int(args[0]) if args else max(rounds) + 1
    names = registry_names()

    if len(names) > WINDOW * MAX_STALE:
        print(
            f"CAPACITY: {len(names)} queries > {WINDOW * MAX_STALE} "
            f"(window {WINDOW} x max_stale {MAX_STALE}) — the rotation "
            "cannot keep everything fresh; retire or merge queries"
        )
        return 1

    sim = dict(last_green)
    n_rounds = (MAX_STALE + 1) if assume else 1
    for step in range(n_rounds):
        rnd = next_round + step
        window = set(stalest_first(names, sim)[:WINDOW])
        offenders = []
        for q in names:
            if q in window:
                continue  # about to be re-graded this round
            newest = sim.get(q)
            if not newest:
                offenders.append(f"{q}: NO green driver row ever, and not in the window")
            elif rnd - newest > MAX_STALE:
                offenders.append(
                    f"{q}: newest green row r{newest} is {rnd - newest} rounds old at r{rnd}"
                )
        if offenders:
            label = f"round {rnd}" + (f" (simulated +{step})" if step else "")
            print(f"STALE at {label} (window={WINDOW}, max_stale={MAX_STALE}):")
            for o in offenders:
                print(f"  {o}")
            return 1
        if step == 0:
            # Zero-slack warnings (r14 VERDICT next-round #1): registry
            # churn (merges / new never-graded rows) displaces graded
            # rows from the window, silently aging them toward the
            # stale line. The gate stays green because stalest_first
            # rescues them next round — but a SECOND churn before then
            # would strand them. Warn (rc stays 0) the moment a row has
            # no slack left, so the churn that created the hazard is
            # the commit that hears about it, not a later round.
            for q in sorted(names):
                newest = sim.get(q)
                if not newest:
                    continue
                age = rnd - newest
                if q not in window and age >= MAX_STALE:
                    print(
                        f"WARN zero-slack: {q} (age {age}) sits OUTSIDE the "
                        f"r{rnd} window and crosses max_stale at r{rnd + 1} — "
                        "it depends entirely on leading the next window; "
                        "avoid further registry churn until it re-grades"
                    )
                elif q in window and age > MAX_STALE:
                    print(
                        f"WARN overdue-rescued: {q} (age {age} > max_stale "
                        f"{MAX_STALE}) is green only because stalest_first "
                        f"leads the r{rnd} window with it — prior registry "
                        "churn aged it past the line"
                    )
        for q in window:
            sim[q] = max(sim.get(q, 0), rnd)

    hist: dict[int, int] = {}
    for q in names:
        newest = last_green.get(q)
        age = next_round - newest if newest else -1
        hist[age] = hist.get(age, 0) + 1
    pretty = ", ".join(f"age {a}: {n}" for a, n in sorted(hist.items()) if a >= 0)
    never = hist.get(-1, 0)
    print(
        f"fresh at round {next_round}: {len(names)} queries ({pretty}"
        + (f"; {never} new-in-window" if never else "")
        + (f"; simulated {n_rounds} rounds green" if assume else "")
        + ")"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
