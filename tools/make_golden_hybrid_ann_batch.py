#!/usr/bin/env python3
"""Regenerate tests/fixtures/golden_hybrid_ann_batch.parquet — the ANN
semantic-leg fixture for the graded `search_hybrid_ann_batch` query
(r8): the scalar golden_hybrid_ann scheme with a query_id column.

The legs are ONE `similarity.ivfpq_search` over the persisted index
built from the documents-joined embeddings, queried with the THREE
batch query vectors (negative qids — outside the corpus id space, so
the self-match guard is a no-op) at pool depth 100 — replayed
bit-for-bit outside the JVM by ``refhash.ref_ivfpq_topk``. Rows are
(corpus_md5, query_id, id, sem_rank), keyed by the corpus content hash
the DuckDB oracle recomputes over the SAME join. Same float-margin bake
guard as make_golden_ivfpq.py. Re-run only if testdata, the query set,
or the index parameters change.
"""
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sf_epa_data_ingestion_spark.functions.refhash import ref_ivfpq_topk  # noqa: E402
from __spark_entry__ import HYBRID_ANN_BATCH_QUERIES  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OUT = os.path.join(REPO, "tests", "fixtures", "golden_hybrid_ann_batch.parquet")
POOL = 100

CORPUS_MD5_SQL = r"""
WITH c AS (
  SELECT d.doc_id AS id, e.embedding
  FROM read_parquet(?) d JOIN read_parquet(?) e ON d.doc_id = e.vec_id
), h AS (
  SELECT id,
         md5(array_to_string(
           list_transform(embedding, x -> printf('%.9e', CAST(x AS DOUBLE))), ',')) AS h
  FROM c
)
SELECT md5(string_agg(CAST(id AS VARCHAR) || ':' || h, ',' ORDER BY id))
FROM h
"""


def main() -> None:
    con = duckdb.connect()
    queries = [(qid, qv) for qid, _txt, qv in HYBRID_ANN_BATCH_QUERIES]
    rows = []
    for sf in SFS:
        dpath, epath = sf + "/documents.parquet", sf + "/embeddings.parquet"
        ch = con.execute(CORPUS_MD5_SQL, [dpath, epath]).fetchone()[0]
        vecs = con.execute(
            "SELECT d.doc_id, e.embedding FROM read_parquet(?) d "
            "JOIN read_parquet(?) e ON d.doc_id = e.vec_id ORDER BY d.doc_id",
            [dpath, epath],
        ).fetchall()
        topk = ref_ivfpq_topk(vecs, k=POOL, queries=queries)
        assert ref_ivfpq_topk.last_margin > 1e-9, (
            f"coarse argsort margin {ref_ivfpq_topk.last_margin:.3e} too small — "
            "refuse to bake"
        )
        for qid, vid, _score_fp, rank in topk:
            rows.append((ch, qid, vid, rank))
        print(f"{sf}: corpus_md5={ch} leg rows={len(topk)} "
              f"margin={ref_ivfpq_topk.last_margin:.3e}")
    con.execute(
        "CREATE TABLE g (corpus_md5 VARCHAR, query_id BIGINT, id BIGINT, sem_rank INTEGER)"
    )
    con.executemany("INSERT INTO g VALUES (?, ?, ?, ?)", rows)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET, COMPRESSION ZSTD)")
    print(f"golden_hybrid_ann_batch: {len(rows)} rows")


if __name__ == "__main__":
    main()
