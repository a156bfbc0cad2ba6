#!/usr/bin/env python3
"""Regenerate the content-addressed golden signature fixtures.

For every distinct non-null document text across sf0.001 and sf0.01,
compute — with the pure-Python Spark-hash mirrors in
``functions/refhash.py`` (parity-pinned against the JVM by
tests/test_refhash.py) — the engine's three deterministic signatures:

- tests/fixtures/golden_simhash.parquet       (text_md5, sig)
- tests/fixtures/golden_minhash_sig.parquet   (text_md5, i, v)   64 rows/text
- tests/fixtures/golden_minhash_bands.parquet (text_md5, band_id, band_hash)
- tests/fixtures/golden_fingerprints.parquet  (text_md5, fingerprint)

The DuckDB oracles for q_simhash / q_minhash_lsh / q_fingerprint join the
live documents table to these fixtures on md5(text) and re-derive the
pair logic (pigeonhole block OR-join, LSH band bucket join, winnowing
explode) in plain SQL — an independent, hash-exact check of the whole
Spark pipeline. Re-run only if testdata or signature parameters change.
"""
import hashlib
import os
import sys
from multiprocessing import Pool

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sf_epa_data_ingestion_spark.functions.refhash import (  # noqa: E402
    ref_minhash_bands,
    ref_minhash_sig,
    ref_simhash,
)
from sf_epa_data_ingestion_spark.functions.text import _winnow  # noqa: E402

FIX = os.path.join(REPO, "tests", "fixtures")


def _one(t: str):
    h = hashlib.md5(t.encode("utf-8")).hexdigest()
    sig = ref_minhash_sig(t)
    return (
        (h, ref_simhash(t)),
        [(h, i, v) for i, v in enumerate(sig)],
        [(h, b, bh) for b, bh in enumerate(ref_minhash_bands(sig))],
        [(h, fp) for fp in sorted(set(_winnow(t)))],
    )


def main() -> None:
    con = duckdb.connect()
    texts = set()
    for sf in ("sf0.001", "sf0.01"):
        for (t,) in con.sql(
            f"SELECT DISTINCT text FROM '/root/testdata/{sf}/documents.parquet' "
            "WHERE text IS NOT NULL"
        ).fetchall():
            texts.add(t)
    texts = sorted(texts)
    with Pool() as pool:
        results = pool.map(_one, texts, chunksize=16)

    sim = [r[0] for r in results]
    msig = [row for r in results for row in r[1]]
    mband = [row for r in results for row in r[2]]
    fps = [row for r in results for row in r[3]]

    con.sql("CREATE TABLE sim (text_md5 VARCHAR, sig BIGINT)")
    con.executemany("INSERT INTO sim VALUES (?, ?)", sim)
    con.sql(f"COPY sim TO '{FIX}/golden_simhash.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)")

    con.sql("CREATE TABLE msig (text_md5 VARCHAR, i INTEGER, v BIGINT)")
    con.executemany("INSERT INTO msig VALUES (?, ?, ?)", msig)
    con.sql(f"COPY msig TO '{FIX}/golden_minhash_sig.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)")

    con.sql("CREATE TABLE mband (text_md5 VARCHAR, band_id INTEGER, band_hash INTEGER)")
    con.executemany("INSERT INTO mband VALUES (?, ?, ?)", mband)
    con.sql(f"COPY mband TO '{FIX}/golden_minhash_bands.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)")

    con.sql("CREATE TABLE fp (text_md5 VARCHAR, fingerprint BIGINT)")
    con.executemany("INSERT INTO fp VALUES (?, ?)", fps)
    con.sql(f"COPY fp TO '{FIX}/golden_fingerprints.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)")

    print(f"{len(texts)} texts -> sim {len(sim)}, msig {len(msig)}, "
          f"mband {len(mband)}, fp {len(fps)} rows")


if __name__ == "__main__":
    main()
