#!/usr/bin/env python3
"""Measure the TX-HOSTED search index at scale (r10 VERDICT next-round
#6): build, change-feed refresh, snapshot-serving overhead vs the
directory layout, and generation-unit vacuum reclaim, at sf0.1 and (if
``tools/make_sf1.py`` has produced it) the sf1 corpus.

The question this answers: what does the snapshot-isolated host COST
relative to the in-place directory layout it supersedes as the graded
serving path — and does its refresh stay O(change) as the corpus grows
10x? The refresh applies the same 55-row change feed as
``refresh_scale.py`` (20 updates as delete+insert pairs + 10 inserts +
5 deletes), so the refresh-derivative rows are directly comparable
across the two hosts.

Usage: python tools/txrefresh_scale.py [runs=2]
One JSON line on stdout; rows land in SCALE.md by hand.
"""
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import pyspark.sql.functions as F  # noqa: E402
from refresh_scale import change_feed  # noqa: E402

from sf_epa_data_ingestion_spark.operators import search  # noqa: E402
from sf_epa_data_ingestion_spark.session import get_spark  # noqa: E402
from sf_epa_data_ingestion_spark.sources.readers import load_table  # noqa: E402
from sf_epa_data_ingestion_spark.storage import txindex  # noqa: E402

SCRATCH = os.path.join(REPO, ".scaledata", "txrefresh_scale")

WAND_QUERIES = [
    (0, "dup scan batch data value"),
    (1, "dup window sort merge row"),
    (2, "scan filter value row fast"),
]


def _du(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark(app_name="txrefresh-scale")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    corpora = [("sf0.1", "/root/testdata/sf0.1")]
    sf1 = os.path.join(REPO, ".scaledata", "sf1")
    if os.path.exists(os.path.join(sf1, "documents.parquet")):
        corpora.append(("sf1", sf1))
    for tag, sf_dir in corpora:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        n = docs.count()
        feed = change_feed(docs).persist()
        n_change = feed.count()
        qdf = spark.createDataFrame(
            WAND_QUERIES, "query_id long, query_text string"
        )
        tx = os.path.join(SCRATCH, tag, "tx")
        dirx = os.path.join(SCRATCH, tag, "dir")
        best = {
            "tx_build": float("inf"), "tx_refresh": float("inf"),
            "tx_query": float("inf"), "dir_build": float("inf"),
            "dir_query": float("inf"),
        }
        vacuum_reclaim = 0
        for _ in range(runs):
            shutil.rmtree(tx, ignore_errors=True)
            shutil.rmtree(dirx, ignore_errors=True)
            t0 = time.time()
            txindex.materialize_tx_search_index(
                docs, tx, id_col="doc_id", text_col="text"
            )
            best["tx_build"] = min(best["tx_build"], time.time() - t0)
            t0 = time.time()
            txindex.refresh_tx_search_index(
                spark, tx, feed, id_col="doc_id", text_col="text"
            )
            best["tx_refresh"] = min(best["tx_refresh"], time.time() - t0)
            # snapshot-served WAND: the graded search_bm25_wand_tx shape
            snap = txindex.load_tx_search_index(spark, tx)
            t0 = time.time()
            snap.bm25_maxscore(qdf, k=10).collect()
            best["tx_query"] = min(best["tx_query"], time.time() - t0)
            # generation-unit vacuum reclaim (gen 1 falls out of retention)
            pre = _du(tx)
            txindex.vacuum_tx_search_index(spark, tx, keep_generations=1)
            vacuum_reclaim = max(vacuum_reclaim, pre - _du(tx))
            # directory layout, same corpus + same query batch
            t0 = time.time()
            search.materialize_search_index(
                docs, dirx, id_col="doc_id", text_col="text"
            )
            best["dir_build"] = min(best["dir_build"], time.time() - t0)
            postings, stats, doclens, n_docs, _nb = search.load_search_index(
                spark, dirx
            )
            bounds = spark.read.parquet(os.path.join(dirx, "bounds"))
            t0 = time.time()
            search.bm25_search_many_maxscore(
                postings.drop("__tb"), stats, bounds, qdf,
                n_docs=n_docs, doclens=doclens, k=10,
            ).collect()
            best["dir_query"] = min(best["dir_query"], time.time() - t0)
            spark.catalog.clearCache()
        feed.unpersist()
        out[tag] = {
            "n_docs": n,
            "n_change_rows": n_change,
            **{k: round(v, 2) for k, v in best.items()},
            "vacuum_reclaim_mb": round(vacuum_reclaim / (1 << 20), 1),
        }
        print(f"{tag}: {out[tag]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
