#!/usr/bin/env python3
"""Regenerate the SemDeDup golden fixtures.

Same scheme as tools/make_golden_ann.py's IVF fixture, for the graded
``semantic_dedup`` query: the corpus is the driver's embeddings table
UNIONed with fixed-point-perturbed planted copies (ids offset by 1e6 —
exactly q_embedding_near_dup's construction, replayed here through
``refhash.ref_plant_perturb``), clustered by the 64-centroid / 2-iter
fixed-point Lloyd that ``similarity.train_ivf`` runs.  Because the Lloyd
sums are order-independent longs, ``refhash.ref_ivf_model`` replays the
training bit-for-bit; the fixtures freeze:

- tests/fixtures/golden_semdedup_assign.parquet
    (corpus_md5, emb_md5, cid)
  rank-1 cell assignment for every union-corpus vector, addressed by
  md5 of the %.9e canonical rendering (DuckDB printf reproduces it),
  guarded by a corpus content hash (training keys off the whole corpus).

- tests/fixtures/golden_semdedup_cents.parquet
    (corpus_md5, cid, cent DOUBLE[])
  the trained centroids themselves — the SemDeDup keep rule ("keep the
  member with the LOWER cosine to its cluster centroid") needs the
  centroid VECTORS in SQL so the oracle can dot each pair member
  independently of the engine.

Stability guard: refuse to bake when the min nonzero rank1/rank2
assignment-dot gap is below 1e-9 (a BLAS blocking difference between the
engine's batched matmul and this full-matrix replay could then flip an
assignment).  Re-run only if testdata or parameters change.
"""
import hashlib
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sf_epa_data_ingestion_spark.functions.refhash import (  # noqa: E402
    ref_ivf_model,
    ref_plant_perturb,
)

FIX = os.path.join(REPO, "tests", "fixtures")
SFS = ("sf0.001", "sf0.01")
PLANT_OFFSET = 1_000_000
N_CENTROIDS = 64
ITERS = 2
DIM = 64


def _emb_md5(vec) -> str:
    s = ",".join(f"{float(x):.9e}" for x in vec)
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def main() -> None:
    con = duckdb.connect()
    assign_rows = []
    cent_rows = []
    seen = set()
    for sf in SFS:
        recs = con.sql(
            f"SELECT vec_id, embedding FROM '/root/testdata/{sf}/embeddings.parquet' "
            "ORDER BY vec_id"
        ).fetchall()
        union = [(i, [float(x) for x in v]) for i, v in recs]
        union += [
            (i + PLANT_OFFSET, ref_plant_perturb(v)) for i, v in union
        ]
        union.sort(key=lambda r: r[0])
        corpus_md5 = hashlib.md5(
            ",".join(f"{i}:{_emb_md5(v)}" for i, v in union).encode("utf-8")
        ).hexdigest()
        if corpus_md5 in seen:  # sf0.001 and sf0.01 share the embeddings table
            continue
        seen.add(corpus_md5)
        probes, cents, margin = ref_ivf_model(
            union, n_centroids=N_CENTROIDS, n_probe=1, iters=ITERS, dim=DIM
        )
        assert margin > 1e-9, (
            f"assignment argsort margin {margin:.3e} too small — a BLAS "
            "blocking difference could flip a cell; refuse to bake"
        )
        by_h = {}
        for i, v in union:
            by_h[_emb_md5(v)] = probes[i][0]
        for h, cid in by_h.items():
            assign_rows.append((corpus_md5, h, cid))
        for cid, cent in enumerate(cents):
            cent_rows.append((corpus_md5, cid, cent))

    con.sql("CREATE TABLE assign (corpus_md5 VARCHAR, emb_md5 VARCHAR, cid INTEGER)")
    con.executemany("INSERT INTO assign VALUES (?, ?, ?)", assign_rows)
    con.sql(
        f"COPY assign TO '{FIX}/golden_semdedup_assign.parquet' "
        "(FORMAT PARQUET, COMPRESSION ZSTD)"
    )
    con.sql("CREATE TABLE cents (corpus_md5 VARCHAR, cid INTEGER, cent DOUBLE[])")
    con.executemany("INSERT INTO cents VALUES (?, ?, ?)", cent_rows)
    con.sql(
        f"COPY cents TO '{FIX}/golden_semdedup_cents.parquet' "
        "(FORMAT PARQUET, COMPRESSION ZSTD)"
    )
    print(
        f"assign {len(assign_rows)} rows, cents {len(cent_rows)} rows "
        f"over {len(seen)} corpus(es)"
    )


if __name__ == "__main__":
    main()
