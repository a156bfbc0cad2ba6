#!/usr/bin/env python3
"""Measure the streaming profile monitor (streaming/profilemon.py).

Two claims to quantify: (a) the per-batch sink cost follows BATCH size
(one aggregate over the micro-batch + one metadata append), and (b)
``current_profile`` answers from the O(cols x batches) state table at a
cost independent of corpus size — vs the one-shot batch profile that
re-scans the corpus per question.

Usage: python tools/profilemon_scale.py [runs=2]
Reads documents.parquet at sf0.1 and (if tools/make_sf1.py produced it)
sf1. One JSON line on stdout; rows land in SCALE.md by hand.
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
from sf_epa_data_ingestion_spark.sources.readers import load_table  # noqa: E402
from sf_epa_data_ingestion_spark.storage import TxTable  # noqa: E402
from sf_epa_data_ingestion_spark.streaming.profilemon import (  # noqa: E402
    ALERT_SCHEMA,
    STATE_SCHEMA,
    current_profile,
    profile_appender,
)

SCRATCH = os.path.join(REPO, ".scaledata", "profilemon_scale")
N_BATCHES = 10


def one_shot_profile(docs):
    """The rescan this monitor replaces: exact counts + distinct per col."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in docs.columns:
        aggs.append(F.count(c).alias(f"nn__{c}"))
        aggs.append(
            F.count_distinct(F.col(c).cast("string")).alias(f"nd__{c}")
        )
    return docs.agg(*aggs).collect()[0]


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark(app_name="profilemon_scale")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"runs": runs, "batches": N_BATCHES, "scales": {}}

    for sf_dir in ("/root/testdata/sf0.1", os.path.join(REPO, ".scaledata", "sf1")):
        if not os.path.isdir(sf_dir):
            continue
        docs = load_table(spark, sf_dir, "documents")
        n = docs.count()
        row = {"rows": n}

        root = os.path.join(SCRATCH, os.path.basename(sf_dir.rstrip("/")))
        shutil.rmtree(root, ignore_errors=True)
        state = TxTable(spark, os.path.join(root, "state")).create_empty(
            STATE_SCHEMA)
        alerts = TxTable(spark, os.path.join(root, "alerts")).create_empty(
            ALERT_SCHEMA)
        sink = profile_appender(state, "pm", alerts=alerts,
                                min_history_rows=1000)

        # feed the corpus in N_BATCHES doc_id-modulo slices
        t_batches = []
        for b in range(N_BATCHES):
            batch = docs.filter(
                (F.col("doc_id") % N_BATCHES) == b)
            t0 = time.perf_counter()
            sink(batch, b)
            t_batches.append(time.perf_counter() - t0)
        row["sink_per_batch_s"] = round(sum(t_batches) / len(t_batches), 3)
        row["sink_max_batch_s"] = round(max(t_batches), 3)
        row["state_rows"] = state.read().count()

        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            current_profile(state).collect()
            best = min(best, time.perf_counter() - t0)
        row["current_profile_s"] = round(best, 3)

        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            one_shot_profile(docs)
            best = min(best, time.perf_counter() - t0)
        row["one_shot_rescan_s"] = round(best, 3)

        out["scales"][os.path.basename(sf_dir.rstrip("/"))] = row
        print(json.dumps(row), file=sys.stderr)

    print(json.dumps(out))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
