"""As-of join: semantics vs a hand-computed truth and DuckDB's ASOF JOIN."""

from __future__ import annotations

import datetime as dt

import duckdb
import pyspark.sql.functions as F
import pytest

from sf_epa_data_ingestion_spark.operators.asof import asof_join

TS = dt.datetime


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 10, 0), "l-a"),
            (1, TS(2024, 1, 1, 9, 0), "l-b"),
            (1, TS(2024, 1, 1, 9, 30), "l-c"),  # exactly on a right row
            (2, TS(2024, 1, 1, 10, 0), "l-d"),  # key with no right rows
        ],
        "k long, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 9, 30), 100, None),
            (1, TS(2024, 1, 1, 9, 45), 200, "x"),
        ],
        "k long, rts timestamp, p long, q string",
    )
    return left, right


def test_backward_inclusive_and_unmatched(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "ts", "rts").orderBy("k", "ts")
    rows = [tuple(r) for r in out.collect()]
    assert rows == [
        (1, TS(2024, 1, 1, 9, 0), "l-b", None, None, None),
        # equal-ts right row matches (inclusive); its NULL q stays NULL
        (1, TS(2024, 1, 1, 9, 30), "l-c", TS(2024, 1, 1, 9, 30), 100, None),
        (1, TS(2024, 1, 1, 10, 0), "l-a", TS(2024, 1, 1, 9, 45), 200, "x"),
        (2, TS(2024, 1, 1, 10, 0), "l-d", None, None, None),
    ]


def test_forward_tolerance_and_inner(spark):
    left, right = _frames(spark)
    fwd = asof_join(left, right, ["k"], "ts", "rts", direction="forward").orderBy("k", "ts")
    got = {(r["k"], r["ts"]): r["p"] for r in fwd.collect()}
    assert got[(1, TS(2024, 1, 1, 9, 0))] == 100  # nearest following
    assert got[(1, TS(2024, 1, 1, 9, 30))] == 100  # inclusive
    assert got[(1, TS(2024, 1, 1, 10, 0))] is None
    assert got[(2, TS(2024, 1, 1, 10, 0))] is None

    tol = asof_join(left, right, ["k"], "ts", "rts", tolerance="10 minutes", how="inner")
    rows = {(r["k"], r["ts"]): r["p"] for r in tol.collect()}
    # 10:00 is 15 min after the latest right row -> out of tolerance -> dropped
    assert rows == {(1, TS(2024, 1, 1, 9, 30)): 100}


def test_column_clash_rejected(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("p", "lv"), ["k"], "ts", "rts")


def test_matches_duckdb_asof_on_events(spark):
    """Cross-engine check on real testdata (purchases <- latest click)."""
    from sf_epa_data_ingestion_spark.sources import readers

    sf = "/root/testdata/sf0.001"
    e = readers.load_table(spark, sf, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumnRenamed("ts", "click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    out = asof_join(
        purchases, clicks, ["user_id"], "purchase_ts", "click_ts",
        matched_ts_col="click_ts",
    )
    got = sorted(
        (r["purchase_id"], r["click_id"], r["click_ts"]) for r in out.collect()
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = sorted(
        (pid, cid, cts)
        for pid, cid, cts in con.execute(
            """
            WITH clicks AS (
              SELECT user_id, ts, max(event_id) AS click_id
              FROM events WHERE event_type = 'click' GROUP BY user_id, ts
            ), p AS (
              SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
              FROM events WHERE event_type = 'purchase'
            )
            SELECT p.purchase_id, c.click_id, c.ts
            FROM p ASOF LEFT JOIN clicks c
              ON p.user_id = c.user_id AND p.purchase_ts >= c.ts
            """
        ).fetchall()
    )
    assert got == want


def test_single_shuffle_plan(spark):
    """The merge formulation shuffles once on the key — no range-join
    explosion. Pin it so a regression to join+window (two exchanges of
    pair-expanded data) fails here, not on a cluster."""
    left, right = _frames(spark)
    plan = asof_join(left, right, ["k"], "ts", "rts")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
