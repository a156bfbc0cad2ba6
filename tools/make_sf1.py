#!/usr/bin/env python3
"""Generate a 10x (sf1-equivalent) scale-up of the sf0.1 testdata for the
scaling measurements in SCALE.md — ALL ten tables since r13 (r12 VERDICT
next-round #6 asks for a full-suite sf1 bench, which needs the relational
and events tables too, not just documents/embeddings).

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

The relational tables replicate as ten SELF-CONTAINED shards: every key
column (primary and foreign alike) strides by k*10M, so each replica's
joins close within the replica and join/aggregate work scales linearly —
the shape a 10x-bigger tenant would actually present. The stride is a
multiple of 10, so the mod-2/mod-5 key classes the tx-row fixtures carve
keep their selectivity. region/nation copy verbatim (TPC-H dims don't
scale either). events stride event_id AND user_id (10x users, same
month — 10x rows per window, the realistic densification) and are
written with microsecond timestamps (load_table reads either precision).

Output: .scaledata/sf1/*.parquet (gitignored).
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

    # relational + events shards: stride every key column by k*10M
    def replicate(name: str, key_cols: list[str], n_files: int,
                  transform=None) -> None:
        src = load_table(spark, SRC, name)
        parts = []
        for k in range(10):
            p = src
            for c in key_cols:
                p = p.withColumn(c, F.col(c) + F.lit(k * ID_STRIDE))
            if transform is not None:
                p = transform(p, k)
            parts.append(p)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(n_files).write.mode("overwrite").parquet(
            f"{OUT}/{name}.parquet"
        )

    replicate("customer", ["c_custkey"], 8)
    replicate("supplier", ["s_suppkey"], 4)
    # part: names must diversify like document text does — verbatim
    # replication would put 10 copies of every p_name into the same
    # fuzzy-match 2-char-prefix block, growing blocked-pair volume
    # quadratically BY CONSTRUCTION (measured: fuzzy_match 19.7 s at a
    # naive 10x vs ~0.6 s at sf0.1). Prepending the replica digit moves
    # each replica into its own block set: within-replica match
    # structure (and every Levenshtein distance) is preserved, replicas
    # never interact — the linear workload a real 10x catalog presents.
    replicate(
        "part", ["p_partkey"], 8,
        transform=lambda p, k: p.withColumn(
            "p_name", F.concat(F.lit(str(k)), F.col("p_name"))
        ),
    )
    replicate("orders", ["o_orderkey", "o_custkey"], 16)
    replicate("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"], 32)
    replicate("events", ["event_id", "user_id"], 8)
    for dim in ("region", "nation"):
        load_table(spark, SRC, dim).coalesce(1).write.mode("overwrite").parquet(
            f"{OUT}/{dim}.parquet"
        )

    print("rows:", spark.read.parquet(f"{OUT}/documents.parquet").count(),
          spark.read.parquet(f"{OUT}/embeddings.parquet").count(),
          spark.read.parquet(f"{OUT}/lineitem.parquet").count(),
          spark.read.parquet(f"{OUT}/events.parquet").count())


if __name__ == "__main__":
    main()
