#!/usr/bin/env python3
"""Generate a 10x (sf1-equivalent) scale-up of the sf0.1 documents and
embeddings tables for the scaling measurements in SCALE.md.

Naive 10x replication would be a WRONG workload for the dedup family:
every document would gain 9 verbatim copies, so near-dup pair counts grow
quadratically *by construction* and no operator could look linear.
Instead each replica k inserts the digit k every 10 characters of the
text: within a replica the pairwise similarity structure is preserved
(both sides of a near-dup pair receive the identical transform), while
any 12-char shingle / 40-char span crossing replicas contains a different
digit, so cross-replica similarity collapses to ~0. The result is 10x
the corpus with ~10x the near-dup pairs — the linear workload a real
10x-bigger crawl would present. Embeddings replicate with shifted ids
(vector values don't pair up in the timed IVF query; its work scales
with corpus size, queries stay fixed at 10).

Output: .scaledata/sf1/{documents,embeddings}.parquet (gitignored).
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from sf_epa_data_ingestion_spark.session import get_spark  # noqa: E402
from sf_epa_data_ingestion_spark.sources.readers import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, ".scaledata", "sf1")
ID_STRIDE = 10_000_000


def main() -> None:
    spark = get_spark(app_name="make-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, SRC, "documents")
    parts = []
    for k in range(10):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * ID_STRIDE)).alias("doc_id"),
                F.regexp_replace("text", "(.{10})", f"$1{k}").alias("text"),
                "lang",
                "source",
            ).withColumn("n_chars", F.length("text"))
        )
    big_docs = parts[0]
    for p in parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.repartition(32).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    emb = load_table(spark, SRC, "embeddings")
    eparts = [
        emb.select(
            (F.col("vec_id") + F.lit(k * ID_STRIDE)).alias("vec_id"),
            "embedding",
            "label",
        )
        for k in range(10)
    ]
    big_emb = eparts[0]
    for p in eparts[1:]:
        big_emb = big_emb.unionByName(p)
    big_emb.repartition(32).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")

    print("rows:", spark.read.parquet(f"{OUT}/documents.parquet").count(),
          spark.read.parquet(f"{OUT}/embeddings.parquet").count())


if __name__ == "__main__":
    main()
