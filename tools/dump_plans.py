#!/usr/bin/env python3
"""Dump ``.explain("formatted")`` for named ``queries()`` entries to files.

Usage:  python tools/dump_plans.py <outdir> <suffix> <query> [query ...] [--sf DIR]

Writes ``<outdir>/<query>_<suffix>.txt`` for each query.  Plans are captured
on the same tuned session bench.py uses, so the plan files match the shapes
the bench artifacts measure.  Capture is analysis-only (no job runs) except
for replay rows, whose query fn executes the stream before returning the
sink read — those plans show the final sink-read shape.
"""
import argparse
import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("suffix")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from sf_epa_data_ingestion_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    os.makedirs(args.outdir, exist_ok=True)
    for name in args.queries:
        df = qs[name](spark, args.sf)
        path = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df))
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
