#!/usr/bin/env python3
"""Regenerate tests/fixtures/golden_ivfpq.parquet — the IVF-PQ oracle
fixture (same scheme as tools/make_golden_pq.py: rows are the benched
query's FINAL result from ``refhash.ref_ivfpq_topk``, keyed by the corpus
content hash the DuckDB oracle recomputes; a different corpus misses the
join and fails the row-count compare loudly).

The coarse-quantizer half makes FLOAT ranking decisions (assignment /
probe dots), so like the IVF fixture this generator refuses to bake if
any argsort's smallest nonzero adjacent gap is below 1e-9 — a BLAS
blocking difference between the executor batches and this full-matrix
replay cannot silently flip a cell. The PQ half is all-int64 and needs
no guard. Re-run only if testdata or the parameters change.
"""
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sf_epa_data_ingestion_spark.functions.refhash import ref_ivfpq_topk  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OUT = os.path.join(REPO, "tests", "fixtures", "golden_ivfpq.parquet")

CORPUS_MD5_SQL = r"""
WITH e AS (
  SELECT vec_id,
         md5(array_to_string(
           list_transform(embedding, x -> printf('%.9e', CAST(x AS DOUBLE))), ',')) AS h
  FROM read_parquet(?)
)
SELECT md5(string_agg(CAST(vec_id AS VARCHAR) || ':' || h, ',' ORDER BY vec_id))
FROM e
"""


def main() -> None:
    con = duckdb.connect()
    rows = []
    for sf in SFS:
        path = sf + "/embeddings.parquet"
        ch = con.execute(CORPUS_MD5_SQL, [path]).fetchone()[0]
        vecs = con.execute(
            "SELECT vec_id, embedding FROM read_parquet(?)", [path]
        ).fetchall()
        topk = ref_ivfpq_topk(vecs, n_queries=10, k=5)
        assert ref_ivfpq_topk.last_margin > 1e-9, (
            f"coarse argsort margin {ref_ivfpq_topk.last_margin:.3e} too small — "
            "refuse to bake"
        )
        for qid, vid, score_fp, rank in topk:
            rows.append((ch, qid, vid, score_fp, rank))
        print(f"{sf}: corpus_md5={ch} result rows={len(topk)} "
              f"margin={ref_ivfpq_topk.last_margin:.3e}")
    con.execute(
        "CREATE TABLE g (corpus_md5 VARCHAR, query_id BIGINT, vec_id BIGINT,"
        " score_fp BIGINT, rank BIGINT)"
    )
    con.executemany("INSERT INTO g VALUES (?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET, COMPRESSION ZSTD)")
    print(f"golden_ivfpq: {len(rows)} rows")


if __name__ == "__main__":
    main()
