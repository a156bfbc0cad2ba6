"""Event-sequence analytics: funnels and retention cohorts.

The reference's incremental pipeline is stateless per row; product
analytics over the same event stream needs ORDERED multi-step semantics:
did the user click AFTER viewing, purchase AFTER clicking, come back the
week after signing up. Both operators here are pure DataFrame
compositions — per-stage aggregates and equi-joins on the user key — so
Catalyst plans them like any other relational query (no UDFs, no state).

Scale notes (100 TB): every stage shuffles on ``user_col`` and the
stage chain reuses that one partitioning (Exchange reuse across stages);
stage populations only shrink, so each successive join is smaller. The
cohort matrix aggregates to |cohorts| x |offsets| rows — tiny — with
map-side partial aggregation doing the heavy lifting.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def funnel_counts(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: stage i counts users who reached stage i-1 and
    then emitted a stage-i event at or after their stage-(i-1) entry
    time. Entry time is the EARLIEST qualifying event per user (the
    standard "first touch" funnel). Returns (stage, n_users) with
    stages prefixed '1_', '2_', ... so lexicographic order is funnel
    order. Comparisons are all >=, so timestamp-precision truncation
    (monotone) cannot flip a qualifying pair."""
    reached = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__entry"))
    )
    stage_dfs = [reached]
    for s in stages[1:]:
        nxt = (
            events.filter(F.col(type_col) == s)
            .join(stage_dfs[-1], user_col)
            .filter(F.col(ts_col) >= F.col("__entry"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__entry"))
        )
        stage_dfs.append(nxt)
    counts = [
        df.agg(
            F.lit(f"{i + 1}_{s}").alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )
        for i, (s, df) in enumerate(zip(stages, stage_dfs))
    ]
    return reduce(DataFrame.unionByName, counts)


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention matrix: cohort week = ISO week of the user's
    first event; one output row per (cohort_week, week_offset) counting
    the cohort's users active that week. Offsets are exact multiples of
    7 days by construction (both sides week-truncated). The cohort week
    is emitted as an ISO 'yyyy-MM-dd' string — engine-neutral (date vs
    datetime round-tripping differs across drivers)."""
    first = events.groupBy(user_col).agg(
        F.to_date(F.date_trunc("week", F.min(ts_col))).alias("__cohort")
    )
    active = events.select(
        user_col, F.to_date(F.date_trunc("week", F.col(ts_col))).alias("__wk")
    ).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            F.date_format(F.col("__cohort"), "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("__wk"), F.col("__cohort")) / F.lit(7))
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
