#!/usr/bin/env python3
"""Regenerate the banded near-dup signature fixture.

tests/fixtures/golden_neardup_sigs.parquet  (emb_md5, table_id, sig)

Same scheme as the ann_lsh fixture in tools/make_golden_ann.py, at the
band parameters the graded `embedding_near_dup` query uses: n_tables=16,
bits=4 — wide-and-shallow bands, because the query's 0.40 cosine
threshold sits in the hard LSH regime (collision probability per bit is
only ~0.63 there), so recall comes from table count, not band width.
Signatures come from ``functions/refhash.ref_lsh_sigs`` — the pure-Python
mirror of the expression-level signature spec — over every distinct
non-NULL embedding at sf0.001 and sf0.01, content-addressed by md5 of the
%.9e canonical rendering (DuckDB printf reproduces it exactly; pinned by
tests/test_refhash.py).

Sign-stability guard: assert every |dot(vec, plane)| clears 1e-9 before
baking (mirror sums sequentially, engine uses a numpy matmul; both
float64, so a sign flip needs a dot within ulps of zero).

Re-run only if testdata or the band parameters change.
"""
import hashlib
import os
import sys
from multiprocessing import Pool

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sf_epa_data_ingestion_spark.functions.refhash import (  # noqa: E402
    ref_lsh_dot_margin,
    ref_lsh_sigs,
)

FIX = os.path.join(REPO, "tests", "fixtures")
SFS = ("sf0.001", "sf0.01")
N_TABLES = 16
BITS = 4
DIM = 64


def _emb_md5(vec) -> str:
    s = ",".join(f"{float(x):.9e}" for x in vec)
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _one_emb(vec):
    v = list(vec)
    margin = ref_lsh_dot_margin(v, n_tables=N_TABLES, bits=BITS, dim=DIM)
    assert margin > 1e-9, f"sign-unstable dot (|d|={margin:.3e}) — refuse to bake"
    h = _emb_md5(vec)
    sigs = ref_lsh_sigs(v, n_tables=N_TABLES, bits=BITS, dim=DIM)
    return [(h, t, sig) for t, sig in enumerate(sigs)]


def main() -> None:
    con = duckdb.connect()
    embs = {}
    for sf in SFS:
        for (v,) in con.sql(
            f"SELECT DISTINCT embedding FROM '/root/testdata/{sf}/embeddings.parquet' "
            "WHERE embedding IS NOT NULL"
        ).fetchall():
            embs[_emb_md5(v)] = v
    with Pool() as pool:
        rows = [r for chunk in pool.map(_one_emb, list(embs.values()), chunksize=8) for r in chunk]
    con.sql("CREATE TABLE nd (emb_md5 VARCHAR, table_id INTEGER, sig BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?, ?, ?)", rows)
    con.sql(
        f"COPY nd TO '{FIX}/golden_neardup_sigs.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)"
    )
    print(f"golden_neardup_sigs: {len(rows)} rows ({len(embs)} embeddings x {N_TABLES} tables)")


if __name__ == "__main__":
    main()
