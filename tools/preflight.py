#!/usr/bin/env python3
"""One-command pre-round gate: rotation, freshness, non-vacuity, oracle smoke.

r9 VERDICT next-round #1/#8: the queries() rotation stalled at HEAD two
rounds in a row because the "refresh final artifacts" step and the
freshness gate were separate manual actions.  This tool fuses them: a
"final artifacts" commit is made AFTER this exits 0, and the run is
recorded (git HEAD + per-step status) in ``tools/preflight_log.json`` so
the round's log shows it ran.

Steps (all must pass; any failure exits 1 and logs which step):

1. ``check_freshness.py``                      — the current round's window
   covers every query that would otherwise stale out.
2. ``check_freshness.py --assume-window-green`` — the NEXT round's gate
   also passes given the current ordering (the stall that bit r8 and r9).
3. ``pytest tests/test_tools.py tests/test_query_nonvacuity.py`` — the
   gate tools themselves plus the degenerate-output sweep.
4. ``check_correctness.py /root/testdata/sf0.001`` — full oracle smoke at
   the smallest SF (every queries() entry vs its DuckDB oracle).

Usage:  python tools/preflight.py [--skip-oracle]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "tools", "preflight_log.json")


def _run(label, cmd):
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    sec = round(time.time() - t0, 1)
    ok = r.returncode == 0
    print(f"[{'ok' if ok else 'FAIL':4s}] {label} ({sec}s)")
    if not ok:
        tail = (r.stdout + r.stderr).splitlines()[-25:]
        print("\n".join("    " + ln for ln in tail))
    return {"step": label, "ok": ok, "sec": sec}


def main() -> int:
    skip_oracle = "--skip-oracle" in sys.argv[1:]
    py = sys.executable
    steps = [
        ("freshness", [py, "tools/check_freshness.py"]),
        ("freshness-next-round", [py, "tools/check_freshness.py",
                                  "--assume-window-green"]),
        ("gate-tests", [py, "-m", "pytest", "-x", "-q",
                        "tests/test_tools.py", "tests/test_query_nonvacuity.py"]),
    ]
    if not skip_oracle:
        steps.append(("oracle-smoke-sf0.001",
                      [py, "tools/check_correctness.py",
                       "/root/testdata/sf0.001", "--no-write"]))
    results = [_run(label, cmd) for label, cmd in steps]
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()
    record = {
        "head": head,
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "ok": all(r["ok"] for r in results),
        "steps": results,
    }
    try:
        log = json.load(open(LOG))
    except (FileNotFoundError, json.JSONDecodeError):
        log = []
    log.append(record)
    with open(LOG, "w") as f:
        json.dump(log[-20:], f, indent=1)
    if record["ok"]:
        print(f"preflight OK at {head[:9]} — safe to cut final artifacts")
        return 0
    print(f"preflight FAILED at {head[:9]} — do NOT cut final artifacts")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
