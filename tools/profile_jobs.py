#!/usr/bin/env python3
"""Per-Spark-job wall-clock decomposition of one queries() row.

Usage: python /tmp/profile_jobs.py <query> [--sf DIR] [--warm]

Runs the row once (after the standard warmup) on a session with the event
log enabled, then parses the event log and prints every job's duration,
description and first stage name — so a replay row's "micro-batch fixed
cost" decomposes into the actual jobs that spend it.
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVDIR = "/tmp/spark-events-profile"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    os.makedirs(EVDIR, exist_ok=True)
    for f in os.listdir(EVDIR):
        os.unlink(os.path.join(EVDIR, f))

    import __spark_entry__ as entry
    from sf_epa_data_ingestion_spark.session import get_spark

    spark = get_spark(
        app_name="profile_jobs",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    # standard bench warmup
    entry.q_filter_project(spark, args.sf).write.format("noop").mode("overwrite").save()
    entry.q_multimodal_meta(spark, args.sf).write.format("noop").mode("overwrite").save()
    entry.q_window_dedup_latest(spark, args.sf).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    marks = []
    for i in range(args.runs):
        t0 = time.perf_counter()
        t0w = time.time() * 1000
        qs[args.query](spark, args.sf).write.format("noop").mode("overwrite").save()
        t1w = time.time() * 1000
        marks.append((t0w, t1w, time.perf_counter() - t0))
        spark.catalog.clearCache()
    appid = spark.sparkContext.applicationId
    spark.stop()

    # parse event log
    path = os.path.join(EVDIR, appid)
    if not os.path.exists(path):
        cands = [p for p in os.listdir(EVDIR) if p.startswith(appid)]
        path = os.path.join(EVDIR, cands[0])
    jobs = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description")
                    or props.get("callSite.short", ""),
                    "stages": [s.get("Stage Name", "") for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]

    for r, (t0w, t1w, el) in enumerate(marks):
        print(f"\n=== run {r}: {el:.3f}s wall ===")
        inwin = [
            (j, d) for j, d in jobs.items()
            if "end" in d and d["start"] >= t0w - 50 and d["end"] <= t1w + 50
        ]
        inwin.sort(key=lambda x: x[1]["start"])
        total = 0.0
        prev_end = t0w
        for j, d in inwin:
            dur = (d["end"] - d["start"]) / 1000.0
            gap = (d["start"] - prev_end) / 1000.0
            prev_end = max(prev_end, d["end"])
            total += dur
            stage0 = d["stages"][0][:60] if d["stages"] else ""
            print(f"  job {j:4d} {dur:7.3f}s (gap {gap:+.3f}s) n_stages={len(d['stages'])} {d['desc'][:70] or stage0}")
        print(f"  sum job time {total:.3f}s of {el:.3f}s wall; gaps = driver-side")


if __name__ == "__main__":
    main()
