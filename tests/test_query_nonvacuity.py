"""Non-vacuity gate for every graded query (r7).

Three r6-green queries turned out to be vacuous checks: embedding_near_dup
(0 rows — threshold above the corpus' max pairwise cosine),
quality_classifier (uniform zeros — unreachable label rule), anti_join
(0 rows — every customer has orders). A hash-exact oracle match over a
degenerate result certifies nothing, so this test runs every
``oracle_sql()`` entry in DuckDB at the driver's correctness SF and fails
if any result is empty or a single all-constant row. DuckDB-only: the
oracles are value-equivalent to the Spark queries (that equivalence IS the
correctness gate), and skipping Spark keeps the sweep a few seconds.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(entry.oracle_sql()))
def test_oracle_result_is_not_degenerate(con, name):
    df = con.sql(entry.oracle_sql()[name]).df()
    assert len(df) > 0, f"{name}: oracle returns ZERO rows at {SF} — vacuous check"
    if len(df) == 1:
        assert any(df[c].notna().any() for c in df.columns), (
            f"{name}: single all-NULL row — vacuous check"
        )
    # Uniformity guard: the r6 quality_classifier bug returned 500 rows of
    # identical zeros and still hash-matched. Any multi-row result must
    # carry SOME variety — at least one column with >= 2 distinct values.
    # (A genuinely-constant-valued answer over distinct keys passes via
    # the key column; a fully-uniform frame means the query computes
    # nothing.)
    if len(df) > 1:
        assert any(df[c].nunique(dropna=False) > 1 for c in df.columns), (
            f"{name}: {len(df)} identical rows — uniform output, vacuous check"
        )
