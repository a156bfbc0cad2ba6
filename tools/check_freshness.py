#!/usr/bin/env python3
"""Driver-window freshness gate (r6 VERDICT next-round #7).

The driver's per-round correctness harness grades only the FIRST 50
entries of ``queries()``, so window rotation is what keeps every query's
evidence fresh. This tool makes a stalled rotation loud: it reads every
CORRECTNESS_r*.json at the repo root, computes each registry query's
newest hash-green round, and FAILS (exit 1) if any query's newest green
row would be more than ``MAX_STALE`` rounds old by the END of the round
being prepared — unless that query sits inside the current first-50
window (i.e. it is about to be re-graded).

Run it as part of the pre-round checklist AFTER reordering ``queries()``:

    python tools/check_freshness.py            # next round = max seen + 1
    python tools/check_freshness.py 9          # explicit next round no.

With ``--assume-window-green`` the check simulates the round being
prepared actually completing: every in-window query is credited a green
row for that round, the window skip is disabled, and staleness is
evaluated one round further out — so ``pytest`` (tests/test_tools.py)
goes red TODAY if the current ordering would leave any query stale at
the NEXT round's gate, instead of the stall surfacing only in the next
pre-round checklist (r7 VERDICT next-round #8).

A brand-new query (no green row yet) is only OK while it is in the
window. Exit 0 prints the staleness histogram; exit 1 lists offenders.
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAX_STALE = 2  # newest green row may be at most this many rounds old
WINDOW = 50    # driver grades the first N queries() entries


def main() -> int:
    last_green: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        data = json.load(open(path))
        for q, v in data.items():
            if isinstance(v, dict) and v.get("hash_match"):
                last_green[q] = max(last_green.get(q, 0), rnd)
    if not rounds:
        print("no CORRECTNESS_r*.json found — nothing to check")
        return 0
    args = [a for a in sys.argv[1:] if a != "--assume-window-green"]
    assume = "--assume-window-green" in sys.argv[1:]
    next_round = int(args[0]) if args else max(rounds) + 1

    # registry order without building a SparkSession: queries() bodies are
    # literal dicts, so parse the source
    src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    m = re.search(r"def queries\(\).*?return \{(.*?)\n    \}", src, re.S)
    names = re.findall(r'"([a-z0-9_]+)":\s*q_', m.group(1))
    window = set(names[:WINDOW])

    if assume:
        # simulate the prepared round completing green for the window,
        # then gate the round AFTER it with no window credit
        for q in window:
            last_green[q] = max(last_green.get(q, 0), next_round)
        next_round += 1
        window = set()

    offenders = []
    hist: dict[int, int] = {}
    for q in names:
        newest = last_green.get(q)
        age = next_round - newest if newest else None
        hist[age if age is not None else -1] = hist.get(age if age is not None else -1, 0) + 1
        if q in window:
            continue  # about to be re-graded this round
        if newest is None:
            offenders.append(f"{q}: NO green driver row ever, and not in the window")
        elif age > MAX_STALE:
            offenders.append(
                f"{q}: newest green row r{newest} is {age} rounds old at r{next_round}"
            )
    if offenders:
        print(f"STALE at round {next_round} (window={WINDOW}, max_stale={MAX_STALE}):")
        for o in offenders:
            print(f"  {o}")
        return 1
    pretty = ", ".join(
        f"age {a}: {n}" for a, n in sorted(hist.items()) if a >= 0
    )
    never = hist.get(-1, 0)
    print(
        f"fresh at round {next_round}: {len(names)} queries ({pretty}"
        + (f"; {never} new-in-window" if never else "")
        + ")"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
