#!/usr/bin/env python3
"""Time one or more named ``queries()`` entries repeatedly, cold-cache.

Usage:  python tools/probe_query.py <query> [query ...] [--sf DIR] [--n N]

Prints per-run wall-clock and the min/median per query.  This is the
noise-diagnosis companion to bench.py: the host shows bursty CPU steal
(the same query can measure 4s quiet / 40s during a burst), so a single
bench number is meaningless without a steady-state floor to compare to.
"""
import argparse
import statistics
import sys
import time
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=5)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from sf_epa_data_ingestion_spark.session import get_spark

    spark = get_spark(app_name="probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    # warm-up: JVM + parquet footers
    entry.q_filter_project(spark, args.sf).write.format("noop").mode("overwrite").save()

    for name in args.queries:
        fn = qs[name]
        times = []
        for i in range(args.n):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            spark.catalog.clearCache()
            times.append(el)
            print(f"  {name} run {i}: {el:.2f}s", flush=True)
        print(
            f"{name}: min={min(times):.2f}s median={statistics.median(times):.2f}s "
            f"max={max(times):.2f}s n={args.n}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
