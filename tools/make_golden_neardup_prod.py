#!/usr/bin/env python3
"""Regenerate the PRODUCTION-regime banded near-dup signature fixture.

tests/fixtures/golden_neardup_prod_sigs.parquet  (emb_md5, table_id, sig)

Round 8: the graded `embedding_near_dup` query moved from the dense
t=0.40 16x4 regime (forced by testdata geometry — the isotropic driver
embeddings have no pairs above cosine ~0.51, and at that angle ~64% of
ALL pairs genuinely band-collide, so the graded row never exercised the
pruning that makes the operator scale; r7 VERDICT "What's wrong" #1) to
the production regime: the query UNIONS the driver's embeddings with
deterministically perturbed copies (refhash.ref_plant_perturb — a pure
elementwise fixed-point function, cosine >= 1 - ~1e-9 by construction
on the unit-norm testdata) and runs banded t=0.95 with the production
8x16 band geometry (N_TABLES=8, BITS=16 — deepened from 8x8 when the
planted sf1 corpus exposed the n^2/256 random-collision floor), where
per-bit collision for unrelated pairs is ~0.5 and a random pair
survives a table with probability ~(1/2)^16.

Signatures are baked for BOTH legs (originals + perturbed) at sf0.001
and sf0.01, content-addressed by md5 of the %.9e canonical rendering —
the same scheme the r7 16x4 fixture used (content-addressed sigs).
Sign-stability margin is asserted per vector before baking.

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
    ref_plant_perturb,
)

FIX = os.path.join(REPO, "tests", "fixtures")
SFS = ("sf0.001", "sf0.01")
N_TABLES = 8
BITS = 16
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
            dv = [float(x) for x in v]
            embs[_emb_md5(dv)] = dv
            p = ref_plant_perturb(dv)
            embs[_emb_md5(p)] = p
    with Pool() as pool:
        rows = [r for chunk in pool.map(_one_emb, list(embs.values()), chunksize=8) for r in chunk]
    con.sql("CREATE TABLE nd (emb_md5 VARCHAR, table_id INTEGER, sig BIGINT)")
    con.executemany("INSERT INTO nd VALUES (?, ?, ?)", rows)
    con.sql(
        f"COPY nd TO '{FIX}/golden_neardup_prod_sigs.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)"
    )
    print(f"golden_neardup_prod_sigs: {len(rows)} rows ({len(embs)} embeddings x {N_TABLES} tables)")


if __name__ == "__main__":
    main()
