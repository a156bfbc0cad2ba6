#!/usr/bin/env python3
"""Regenerate the ANN / profiling golden fixtures.

Same scheme as tools/make_golden_sigs.py, extended to the two remaining
rows-only families whose randomness is deterministic-by-construction:

- tests/fixtures/golden_lsh_sigs.parquet   (emb_md5, table_id, sig)
  Random-hyperplane LSH signatures of every distinct embedding across
  sf0.001 and sf0.01, computed by ``functions/refhash.ref_lsh_sigs`` —
  a pure-Python mirror of the expression-level signature spec (the
  splitmix64 hyperplanes are seeded constants, so "random" projection
  is a deterministic function of the vector).  Content-addressed by
  md5 of the %.9e-canonical embedding rendering, which DuckDB
  reproduces exactly (printf + array_to_string — pinned by test).

- tests/fixtures/golden_ivf_probes.parquet
    (corpus_md5, emb_md5, rank, cid)
  IVF cell assignment (rank 1) and probe order (ranks 1..4) for every
  embedding, from ``refhash.ref_ivf_probes`` — a bit-exact replay of
  ivf_topk's k-means, possible because the operator's Lloyd sums are
  fixed-point (order-independent) longs.  Training depends on the WHOLE
  corpus (seed choice keys off vec_id), so rows are keyed by a corpus
  content hash (md5 over 'vec_id:emb_md5' sorted by vec_id) on top of
  the per-vector address; an oracle run against any other corpus misses
  the join and fails loudly.

- tests/fixtures/golden_hll_profile.parquet (column, set_md5, n_distinct)
  ``approx_count_distinct`` (HLL++, rsd 0.02) estimates for the
  profiled orders columns, computed by ``refhash.ref_hll_distinct``
  from xxhash64 of the distinct value set.  In the linear-counting
  regime the HLL++ answer depends only on WHICH top-p-bit register
  indices the distinct values touch, so the estimate is a pure
  function of the distinct-value SET — content-addressed here by md5
  of the sorted varchar rendering of that set.  The mirror *refuses*
  (raises) outside that regime rather than baking an uncertifiable
  number.

Sign-stability guard: the LSH fixture asserts every |dot(vec, plane)|
clears 1e-9 — the mirror sums sequentially where the engine uses a
numpy matmul, and both are float64, so a disagreement would need a dot
within ulps of zero.  Re-run only if testdata or parameters change.
"""
import hashlib
import os
import sys
from multiprocessing import Pool

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sf_epa_data_ingestion_spark.functions.refhash import (  # noqa: E402
    ref_hll_distinct,
    ref_ivf_probes,
    ref_lsh_dot_margin,
    ref_lsh_sigs,
    xxh64_long,
    xxh64_string,
)

FIX = os.path.join(REPO, "tests", "fixtures")
SFS = ("sf0.001", "sf0.01")
PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey")
RSD = 0.02


def _emb_md5(vec) -> str:
    s = ",".join(f"{float(x):.9e}" for x in vec)
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _one_emb(vec):
    margin = ref_lsh_dot_margin(list(vec))
    assert margin > 1e-9, f"sign-unstable dot (|d|={margin:.3e}) — refuse to bake"
    h = _emb_md5(vec)
    return [(h, t, sig) for t, sig in enumerate(ref_lsh_sigs(list(vec)))]


def main() -> None:
    con = duckdb.connect()

    # --- LSH signatures over every distinct embedding at both sfs
    embs = {}
    for sf in SFS:
        for (v,) in con.sql(
            f"SELECT DISTINCT embedding FROM '/root/testdata/{sf}/embeddings.parquet' "
            "WHERE embedding IS NOT NULL"
        ).fetchall():
            embs[_emb_md5(v)] = v
    with Pool() as pool:
        rows = [r for chunk in pool.map(_one_emb, list(embs.values()), chunksize=8) for r in chunk]
    con.sql("CREATE TABLE lsh (emb_md5 VARCHAR, table_id INTEGER, sig BIGINT)")
    con.executemany("INSERT INTO lsh VALUES (?, ?, ?)", rows)
    con.sql(f"COPY lsh TO '{FIX}/golden_lsh_sigs.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)")

    # --- IVF cell/probe assignments, keyed by corpus content
    ivf_rows = []
    for sf in SFS:
        recs = con.sql(
            f"SELECT vec_id, embedding FROM '/root/testdata/{sf}/embeddings.parquet' "
            "WHERE embedding IS NOT NULL ORDER BY vec_id"
        ).fetchall()
        rows_py = [(i, list(v)) for i, v in recs]
        corpus_md5 = hashlib.md5(
            ",".join(f"{i}:{_emb_md5(v)}" for i, v in rows_py).encode("utf-8")
        ).hexdigest()
        probes = ref_ivf_probes(rows_py)
        assert ref_ivf_probes.last_margin > 1e-9, (
            f"IVF argsort margin {ref_ivf_probes.last_margin:.3e} too small — "
            "a BLAS blocking difference could flip a rank; refuse to bake"
        )
        by_h = {}
        for i, v in rows_py:
            by_h[_emb_md5(v)] = probes[i]
        for h, cids in by_h.items():
            for rank, cid in enumerate(cids, start=1):
                ivf_rows.append((corpus_md5, h, rank, cid))
    con.sql(
        "CREATE TABLE ivf (corpus_md5 VARCHAR, emb_md5 VARCHAR, rank INTEGER, cid INTEGER)"
    )
    con.executemany("INSERT INTO ivf VALUES (?, ?, ?, ?)", ivf_rows)
    con.sql(f"COPY ivf TO '{FIX}/golden_ivf_probes.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)")

    # --- HLL++ profile estimates, keyed by distinct-value-set content
    prof = {}
    for sf in SFS:
        for col in PROFILE_COLS:
            vals = [
                v
                for (v,) in con.sql(
                    f"SELECT DISTINCT {col} FROM '/root/testdata/{sf}/orders.parquet' "
                    f"WHERE {col} IS NOT NULL"
                ).fetchall()
            ]
            set_md5 = hashlib.md5(
                ",".join(sorted(str(v) for v in vals)).encode("utf-8")
            ).hexdigest()
            hashes = {
                xxh64_long(v) if isinstance(v, int) else xxh64_string(v) for v in vals
            }
            prof[(col, set_md5)] = ref_hll_distinct(hashes, rsd=RSD)
    con.sql("CREATE TABLE hll (\"column\" VARCHAR, set_md5 VARCHAR, n_distinct BIGINT)")
    con.executemany("INSERT INTO hll VALUES (?, ?, ?)", list((c, m, n) for (c, m), n in prof.items()))
    con.sql(f"COPY hll TO '{FIX}/golden_hll_profile.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)")

    print(
        f"lsh {len(rows)} rows over {len(embs)} distinct embeddings; "
        f"ivf {len(ivf_rows)} rows; hll {len(prof)} rows"
    )


if __name__ == "__main__":
    main()
