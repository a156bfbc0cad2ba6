#!/usr/bin/env python3
"""Regenerate tests/fixtures/golden_pq.parquet — the PQ/ADC oracle fixture.

Same scheme as tools/make_golden_ann.py's IVF fixture: PQ training is a
function of the WHOLE corpus (seed choice + Lloyd means), so rows are
keyed by the corpus content hash the DuckDB oracle recomputes — md5 over
'vec_id:md5(%.9e-rendered embedding)' ordered by vec_id (identical to the
ann_ivf corpus hash). A different corpus misses the fixture join and the
row-count compare fails loudly.

Rows are the benched query's FINAL result (query_id, vec_id, score_fp,
rank) from ``refhash.ref_pq_topk`` — the pure-Python bit-exact replay.
Unlike the IVF fixture no argsort-margin guard is needed: every PQ
ranking decision (assignment and ADC score) happens on exact int64s, so
there is no float knife-edge to guard.

Re-run only if testdata or the PQ_* constants change.
"""
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sf_epa_data_ingestion_spark.functions.refhash import ref_pq_topk  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OUT = os.path.join(REPO, "tests", "fixtures", "golden_pq.parquet")

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
        topk = ref_pq_topk(vecs, n_queries=10, k=5)
        for qid, vid, score_fp, rank in topk:
            rows.append((ch, qid, vid, score_fp, rank))
        print(f"{sf}: corpus_md5={ch} result rows={len(topk)}")
    con.execute(
        "CREATE TABLE g (corpus_md5 VARCHAR, query_id BIGINT, vec_id BIGINT,"
        " score_fp BIGINT, rank BIGINT)"
    )
    con.executemany("INSERT INTO g VALUES (?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    print(f"wrote {OUT}: {len(rows)} rows")


if __name__ == "__main__":
    main()
