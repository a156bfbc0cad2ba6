#!/usr/bin/env python3
"""Measure incremental index refresh vs full rebuild (r9).

The whole-service TARGET_LAG story rests on refresh_search_index being
O(change), not O(corpus): this times a full materialize_search_index of
the documents table against a refresh applying a small change feed
(20 updates + 10 inserts + 5 deletes, tagged rows — the txlog
change-feed shape) at sf0.1 and, if present, the sf1 corpus
(.scaledata/sf1, tools/make_sf1.py). The interesting number is how the
REFRESH time scales as the corpus grows 10x: bucket-incremental
postings/doclens + vocabulary-sized stats/bounds should keep it nearly
flat, while the rebuild grows with the corpus.

Usage: python tools/refresh_scale.py [runs=2]
One JSON line on stdout; rows land in SCALE.md by hand.
"""
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from sf_epa_data_ingestion_spark.operators import search  # noqa: E402
from sf_epa_data_ingestion_spark.session import get_spark  # noqa: E402
from sf_epa_data_ingestion_spark.sources.readers import load_table  # noqa: E402

SCRATCH = os.path.join(REPO, ".scaledata", "refresh_scale")


def change_feed(docs):
    """20 updates (delete+insert pairs) + 10 inserts + 5 deletes."""
    lo = docs.agg(F.min("doc_id")).first()[0]
    upd = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 20))
    upd_del = upd.withColumn("_change_type", F.lit("delete"))
    upd_ins = upd.withColumn(
        "text", F.concat(F.lit("zzzfresh zzztokens "), F.col("text"))
    ).withColumn("_change_type", F.lit("insert"))
    ins = docs.limit(10).select(
        (F.col("doc_id") + 900_000_000).alias("doc_id"),
        F.concat(F.lit("zzznew document "), F.col("text")).alias("text"),
    ).withColumn("_change_type", F.lit("insert"))
    dels = (
        docs.orderBy(F.desc("doc_id")).limit(5)
        .withColumn("_change_type", F.lit("delete"))
    )
    return (
        upd_del.select("doc_id", "text", "_change_type")
        .unionByName(upd_ins.select("doc_id", "text", "_change_type"))
        .unionByName(ins.select("doc_id", "text", "_change_type"))
        .unionByName(dels.select("doc_id", "text", "_change_type"))
    )


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark(app_name="refresh-scale")
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
        idx = os.path.join(SCRATCH, tag)
        build_best = refresh_best = float("inf")
        for _ in range(runs):
            shutil.rmtree(idx, ignore_errors=True)
            t0 = time.time()
            search.materialize_search_index(
                docs, idx, id_col="doc_id", text_col="text"
            )
            build_best = min(build_best, time.time() - t0)
            t0 = time.time()
            search.refresh_search_index(
                spark, idx, feed, id_col="doc_id", text_col="text",
                allow_inplace=True,
            )
            refresh_best = min(refresh_best, time.time() - t0)
            spark.catalog.clearCache()
        feed.unpersist()
        out[tag] = {
            "n_docs": n,
            "n_change_rows": n_change,
            "build_sec": round(build_best, 2),
            "refresh_sec": round(refresh_best, 2),
        }
        print(f"{tag}: {out[tag]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
