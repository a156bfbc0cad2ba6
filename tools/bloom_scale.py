#!/usr/bin/env python3
"""Measure bloom-filter data skipping (storage/txlog.set_bloom) at scale.

The question this answers: what does a point/`in` probe against a
digest-keyed state table cost WITH per-file bloom bitmaps vs the two
things it replaces — a bounds-only pruned read (md5 digests are uniform,
so bounds prune NOTHING) and the full-scan anti-join state read the
streaming ingest pays per micro-batch. Plus the CDC-upsert shape:
``merge(prune_source_keys=...)`` vs a plain merge.

Layout under test: F files of N/F rows each, digest = md5(id) — every
file's [min, max] digest range spans ~the whole hex space, the exact
regime bounds cannot help and blooms exist for.

Usage: python tools/bloom_scale.py [runs=2] [scales=200000,2000000]
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

from sf_epa_data_ingestion_spark.session import get_spark  # noqa: E402
from sf_epa_data_ingestion_spark.storage import TxTable  # noqa: E402

SCRATCH = os.path.join(REPO, ".scaledata", "bloom_scale")
FILES = 32
PROBE_N = 200          # digests per micro-batch probe
MERGE_N = 100          # upsert rows per CDC merge


def build(spark, root, n, bloom):
    shutil.rmtree(root, ignore_errors=True)
    t = TxTable(spark, root).create_empty("id long, digest string, val double")
    if bloom:
        # ~n/FILES distinct digests per file. Sizing for BATCH probes:
        # an `in` probe keeps a file if ANY of its P values false-hits,
        # so per-file keep-prob ≈ P * fpp — at P=200 over 32 files,
        # 16 bits/value (fpp ~0.14%) still keeps ~9 spurious files;
        # 24 bits/value (fpp ~0.02%) keeps ~1. Bits are cheap (24 bits/
        # value = 3 B/row in the commit JSON); size for the probe width.
        per = max(64, ((n // FILES) * 24 + 63) // 64 * 64)
        t.set_bloom("digest", m=per, k=5, backfill=False)
    per_file = n // FILES
    for f in range(FILES):
        df = (
            spark.range(f * per_file, (f + 1) * per_file)
            .select(
                F.col("id"),
                F.md5(F.col("id").cast("string")).alias("digest"),
                F.rand(seed=f).alias("val"),
            )
            .repartition(1)
        )
        t.append(df)
    return t


def probe_digests(spark, count, offset=0):
    return [
        r["digest"]
        for r in spark.range(offset, offset + count)
        .select(F.md5(F.col("id").cast("string")).alias("digest"))
        .collect()
    ]


def timeit(fn, runs):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    scales = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [200_000, 2_000_000]
    )
    spark = get_spark(app_name="bloom_scale")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"runs": runs, "files": FILES, "scales": {}}

    for n in scales:
        row = {}
        for bloom in (False, True):
            tag = "bloom" if bloom else "plain"
            root = os.path.join(SCRATCH, f"{tag}_{n}")
            t0 = time.perf_counter()
            t = build(spark, root, n, bloom)
            row[f"build_{tag}_s"] = round(time.perf_counter() - t0, 3)

            present = probe_digests(spark, PROBE_N)             # all hit
            absent = probe_digests(spark, PROBE_N, offset=n + 10_000_000)

            row[f"files_scanned_{tag}"] = len(
                t.read_files(filters=[("digest", "in", present)])
            )
            row[f"files_scanned_absent_{tag}"] = len(
                t.read_files(filters=[("digest", "in", absent)])
            )
            row[f"probe_{tag}_s"] = timeit(
                lambda: t.read(filters=[("digest", "in", present)])
                .groupBy().count().collect(),
                runs,
            )
            # the per-micro-batch state read the probe path replaces
            row[f"fullscan_{tag}_s"] = timeit(
                lambda: t.read().select("digest").distinct()
                .groupBy().count().collect(),
                runs,
            )
            # CDC upsert: MERGE_N updates of EXISTING rows (ids 0..99 all
            # live in file 0 — the discovery prune should find exactly it)
            src = (
                spark.range(0, MERGE_N)
                .select(
                    F.col("id"),
                    F.md5(F.col("id").cast("string")).alias("digest"),
                    F.lit(-1.0).alias("val"),
                )
            )
            t0 = time.perf_counter()
            v = t.merge(
                src, ["digest"],
                prune_source_keys=1000 if bloom else None,
            )
            row[f"merge_{tag}_s"] = round(time.perf_counter() - t0, 3)
            row[f"merge_files_rewritten_{tag}"] = len(
                t._read_commit(v).get("remove", [])
            )
        out["scales"][str(n)] = row
        print(json.dumps({str(n): row}), file=sys.stderr)

    print(json.dumps(out))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
