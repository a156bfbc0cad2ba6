"""The t2 gate, locally: every queries() entry hash-matches its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from oracle_harness import run_all

SF_DIR = "/root/testdata/sf0.001"

_RESULTS: dict[str, list[str]] | None = None


def _results() -> dict[str, list[str]]:
    global _RESULTS
    if _RESULTS is None:
        _RESULTS = run_all(SF_DIR)
    return _RESULTS


def _names() -> list[str]:
    import __spark_entry__ as entrymod

    return list(entrymod.queries())


@pytest.mark.parametrize("qname", _names())
def test_oracle_parity(qname):
    problems = _results().get(qname)
    assert problems == [], "\n".join(problems or [])
