#!/usr/bin/env python3
"""Regenerate tests/fixtures/golden_qlr.parquet — the quality-classifier
oracle fixture.

Same scheme as tools/make_golden_ann.py: the trained model depends on the
WHOLE corpus (full-batch GD), so per-doc rows are keyed by a corpus
content hash — md5 over 'doc_id:md5(normalized_text)' ordered by doc_id,
NULL-text docs excluded — which the DuckDB oracle recomputes from the
base table. A run against any other corpus misses the fixture join and
fails loudly instead of silently passing.

Scores come from ``refhash.ref_qlr_scores``, the pure-Python mirror of
``operators/quality_model.score_quality_lr``: identical fixed-point
arithmetic (hard-sigmoid link, integer gradients, shared ``qlr_update``),
so the fixture IS the bit-exact expected output. Re-run only if testdata
or the QLR_* constants change.
"""
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sf_epa_data_ingestion_spark.functions.refhash import (  # noqa: E402
    ref_normalize,
    ref_qlr_scores,
)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OUT = os.path.join(REPO, "tests", "fixtures", "golden_qlr.parquet")


def corpus_md5(con, path: str) -> str:
    # EXACTLY the oracle's corpus-hash expression (normalized text, like
    # the dedup oracles) so the fixture join can only match this corpus
    return con.execute(
        r"""
        SELECT md5(string_agg(doc_id || ':' || md5(
                 trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
               ), ',' ORDER BY doc_id))
        FROM read_parquet(?) WHERE text IS NOT NULL
        """,
        [path + "/documents.parquet"],
    ).fetchone()[0]


def main() -> None:
    con = duckdb.connect()
    rows = []
    for sf in SFS:
        path = sf + "/documents.parquet"
        ch = corpus_md5(con, sf)
        docs = con.execute(
            "SELECT doc_id, text FROM read_parquet(?) WHERE text IS NOT NULL",
            [path],
        ).fetchall()
        scores = ref_qlr_scores(docs)
        # sanity: the mirror's normalization is the hash's normalization
        assert all(ref_normalize(t) is not None for _, t in docs[:1])
        for doc_id, label, score_fp in scores:
            rows.append((ch, doc_id, label, score_fp))
        print(f"{sf}: corpus_md5={ch} docs={len(scores)}")
    con.execute(
        "CREATE TABLE g (corpus_md5 VARCHAR, doc_id BIGINT, label INT, score_fp BIGINT)"
    )
    con.executemany("INSERT INTO g VALUES (?, ?, ?, ?)", rows)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    print(f"wrote {OUT}: {len(rows)} rows")


if __name__ == "__main__":
    main()
