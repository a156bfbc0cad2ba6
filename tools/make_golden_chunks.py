#!/usr/bin/env python3
"""Regenerate the content-addressed golden chunk fixture.

tests/fixtures/golden_chunks_128_32.parquet maps md5(text) -> (chunk_index,
chunk) for every distinct non-null document text across sf0.001 and sf0.01,
chunked by the pure-Python reference ``split_text`` at the q_chunk_documents
geometry (128/32). ORACLE_CHUNK_DOCUMENTS joins the live documents table to
this fixture on md5(text), giving the driver a hash-exact check that the
distributed chunker path (Arrow UDF + posexplode + keep_cols plumbing)
reproduces the committed reference output. Re-run only if testdata or the
chunker geometry changes.
"""
import hashlib
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sf_epa_data_ingestion_spark.functions.text import split_text  # noqa: E402

OUT = os.path.join(REPO, "tests", "fixtures", "golden_chunks_128_32.parquet")


def main() -> None:
    con = duckdb.connect()
    texts = set()
    for sf in ("sf0.001", "sf0.01"):
        for (t,) in con.sql(
            f"SELECT DISTINCT text FROM '/root/testdata/{sf}/documents.parquet' "
            "WHERE text IS NOT NULL"
        ).fetchall():
            texts.add(t)
    rows = []
    for t in sorted(texts):
        h = hashlib.md5(t.encode("utf-8")).hexdigest()
        for i, c in enumerate(split_text(t, 128, 32)):
            rows.append((h, i, c))
    con.sql("CREATE TABLE g (text_md5 VARCHAR, chunk_index INTEGER, chunk VARCHAR)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?)", rows)
    con.sql(f"COPY g TO '{OUT}' (FORMAT PARQUET, COMPRESSION ZSTD)")
    print(f"{len(texts)} texts, {len(rows)} chunk rows -> {OUT}")


if __name__ == "__main__":
    main()
