"""Funnel and retention-cohort semantics on hand-built event streams."""

from __future__ import annotations

import datetime as dt

from sf_epa_data_ingestion_spark.operators import analytics


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts"])


def test_funnel_ordering_is_enforced(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1 completes the funnel in order
        (1, "view", t(0)), (1, "click", t(1)), (1, "purchase", t(2)),
        # u2 clicks BEFORE viewing -> stops at view
        (2, "click", t(0)), (2, "view", t(1)),
        # u3 views and clicks, purchase precedes the click -> stops at click
        (3, "view", t(0)), (3, "purchase", t(1)), (3, "click", t(2)),
        # u4 never views -> not even stage 1
        (4, "click", t(0)), (4, "purchase", t(1)),
        # u5 same-timestamp view+click (>= lets it through), no purchase
        (5, "view", t(0)), (5, "click", t(0)),
    ]
    got = {r["stage"]: r["n_users"] for r in analytics.funnel_counts(_ev(spark, rows)).collect()}
    assert got == {"1_view": 4, "2_click": 3, "3_purchase": 1}


def test_retention_cohorts_matrix(spark):
    d = lambda day, h=0: dt.datetime(2024, 1, day, h)  # noqa: E731
    rows = [
        # u1 first active week of Jan 1 (Mon), returns weeks 0, 1, 3
        (1, "view", d(2)), (1, "view", d(10)), (1, "view", d(23)),
        # u2 first active week of Jan 8, returns week 1
        (2, "view", d(9)), (2, "view", d(16)),
        # u3 only week of Jan 1
        (3, "view", d(5)),
    ]
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in analytics.retention_cohorts(_ev(spark, rows)).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }
