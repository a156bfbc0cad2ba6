"""Smoke tests for the repo's gate tools (they guard the grading loop, so
they get the same regression protection as operators)."""

import subprocess
import sys

REPO = "/root/repo"


def _run(*args):
    return subprocess.run(
        [sys.executable, f"{REPO}/tools/check_freshness.py", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
    )


def test_check_freshness_passes_for_the_prepared_round():
    r = _run()
    assert r.returncode == 0, r.stdout + r.stderr
    assert "fresh at round" in r.stdout


def test_check_freshness_fails_when_rotation_would_stall():
    # far enough ahead that queries outside the current window go stale
    r = _run("12")
    assert r.returncode == 1, r.stdout + r.stderr
    assert "STALE at round 12" in r.stdout


def test_rotation_would_survive_the_next_round_gate():
    """The r8 in-suite stall gate: simulate the CURRENT window going
    green this round, then require every query to clear the <=2-round
    staleness rule at the NEXT round with no window credit. If the
    current queries() ordering strands anything (e.g. a new query parked
    past position 50, or a stale set not rotated in), this test is red
    TODAY — not at the next pre-round checklist."""
    r = _run("--assume-window-green")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "fresh at round" in r.stdout
