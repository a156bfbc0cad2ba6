#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry in ``__spark_entry__.py`` on Spark and, when an
``oracle_sql()`` entry exists, the same query on DuckDB over the identical
parquet tables; canonicalizes both results the way the driver does (columns
sorted by name, rows sorted by every column) and compares row counts, schema
(column names) and values (floats rounded).

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
Writes CORRECTNESS_LOCAL.json at the repo root when run with no query filter.
"""
import json
import math
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df):
    """Mirror the driver: sort columns by name, then rows by all columns.

    Floats are rounded (7 dp — finer than the 1e-6 compare tolerance)
    BEFORE sorting so near-equal values cannot order rows differently in
    the two frames; ndarray cells (Arrow toPandas array columns) are
    caught by the unhashable guard like plain lists.
    """
    import numpy as np
    import pandas as pd

    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].map(
            lambda v: isinstance(v, (list, tuple, dict, set, bytearray, np.ndarray))
        ).any():
            raise TypeError(f"column {c!r} holds unhashable values (list/array/dict)")
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else str(v))
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(7)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _value_hash(df):
    """Exact, dtype-canonicalized value hash mirroring the driver's compare.

    The driver's hash is dtype-sensitive: in round 4 three oracles whose
    values were *exactly* equal to Spark's still hash-failed because DuckDB
    SUM/list_sum over integers returns HUGEINT, which lands in pandas as
    float64 while Spark's bigint stays int64.  The tolerant
    ``_values_equal`` below cannot see that (it compares through float), so
    this hash normalizes integers to int64 and floats to float64 (already
    rounded by ``_canon``) and digests the *bit patterns* — an uncast
    HUGEINT aggregate now fails locally before it fails a driver round.
    Run on the output of ``_canon`` (sorted columns + rows, floats rounded).
    """
    import hashlib

    import numpy as np
    import pandas as pd

    h = hashlib.sha256()
    for c in df.columns:
        x = df[c]
        if pd.api.types.is_bool_dtype(x):
            kind, payload = "b", x.to_numpy(dtype=np.uint8).tobytes()
        elif pd.api.types.is_integer_dtype(x):
            kind, payload = "i", x.to_numpy(dtype=np.int64).tobytes()
        elif pd.api.types.is_float_dtype(x):
            v = x.to_numpy(dtype=np.float64)
            v = np.where(v == 0.0, 0.0, v)  # -0.0 -> +0.0
            kind, payload = "f", v.tobytes()
        else:  # object: already stringified (or None) by _canon
            kind = "s"
            payload = b"\x00".join(
                b"<NULL>" if v is None else str(v).encode() for v in x
            )
        h.update(f"{c}|{kind}|".encode())
        h.update(payload)
        h.update(b"\x1e")
    return h.hexdigest()


def _values_equal(a, b, rel=1e-6, abs_tol=1e-9):
    import numpy as np
    import pandas as pd

    if a.shape != b.shape:
        return False, f"shape {a.shape} vs {b.shape}"
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            xv = pd.to_numeric(x, errors="coerce").to_numpy(dtype=float)
            yv = pd.to_numeric(y, errors="coerce").to_numpy(dtype=float)
            # a coerced NaN (original value non-null but non-numeric) is a
            # mismatch, not a NaN==NaN pass
            x_coerced = np.isnan(xv) & ~x.isna().to_numpy()
            y_coerced = np.isnan(yv) & ~y.isna().to_numpy()
            if (x_coerced | y_coerced).any():
                i = int(np.argmax(x_coerced | y_coerced))
                return False, f"col {c} row {i}: non-numeric value coerced to NaN"
            both_nan = np.isnan(xv) & np.isnan(yv)
            ok = both_nan | np.isclose(xv, yv, rtol=rel, atol=abs_tol)
            if not ok.all():
                i = int(np.argmin(ok))
                return False, f"col {c} row {i}: {xv[i]!r} != {yv[i]!r}"
        else:
            xs = x.astype(str).where(~x.isna(), "<NULL>")
            ys = y.astype(str).where(~y.isna(), "<NULL>")
            neq = (xs != ys).to_numpy()
            if neq.any():
                i = int(neq.argmax())
                return False, f"col {c} row {i}: {xs.iloc[i]!r} != {ys.iloc[i]!r}"
    return True, None


def main():
    argv = [a for a in sys.argv[1:] if a != "--no-write"]
    no_write = "--no-write" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-correctness")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    for i, (name, fn) in enumerate(qs.items()):
        if only and name not in only:
            continue
        rec = {"pos": i, "rows_match": None, "schema_match": None,
               "values_match": None, "hash_match": None, "spark_rows": None,
               "oracle_rows": None, "err": None, "sec": None}
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sdf)
            if name in oracles:
                odf = con.sql(oracles[name]).df()
                rec["oracle_rows"] = len(odf)
                rec["rows_match"] = len(sdf) == len(odf)
                sc, oc = sorted(map(str, sdf.columns)), sorted(map(str, odf.columns))
                rec["schema_match"] = sc == oc
                if not rec["schema_match"]:
                    rec["err"] = f"columns {sc} vs {oc}"
                elif rec["rows_match"]:
                    a, b = _canon(sdf.copy()), _canon(odf.copy())
                    ok, why = _values_equal(a, b)
                    rec["values_match"] = bool(ok)
                    rec["hash_match"] = _value_hash(a) == _value_hash(b)
                    if not ok:
                        rec["err"] = why
                    elif not rec["hash_match"]:
                        rec["err"] = (
                            "exact-hash mismatch (values equal under tolerance "
                            "-> output dtype drift, e.g. HUGEINT oracle)"
                        )
            else:
                rec["err"] = "no_oracle"
                _canon(sdf.copy())  # driver canonicalizes even rows-only results
        except Exception:
            rec["err"] = traceback.format_exc(limit=3).splitlines()[-1]
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        tag = ("OK" if rec["values_match"] and rec["hash_match"] else
               "rows-only" if rec["err"] == "no_oracle" else "FAIL")
        print(f"[{i:3d}] {name:28s} {tag:9s} rows={rec['spark_rows']} "
              f"{rec['sec']}s {'' if rec['values_match'] or rec['err'] in (None, 'no_oracle') else rec['err']}",
              flush=True)

    n_ok = sum(
        1 for r in results.values() if r["values_match"] and r["hash_match"]
    )
    n_ro = sum(1 for r in results.values() if r["err"] == "no_oracle")
    n_bad = len(results) - n_ok - n_ro
    print(f"\n{n_ok} ok / {n_ro} rows-only / {n_bad} FAIL of {len(results)}")
    if not only and not no_write:
        with open(os.path.join(REPO, "CORRECTNESS_LOCAL.json"), "w") as f:
            json.dump({"sf_dir": sf_dir, "ok": n_ok, "rows_only": n_ro,
                       "fail": n_bad, "results": results}, f, indent=1)
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
