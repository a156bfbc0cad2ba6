"""Partitioning helpers shared by the operator suite.

Why explicit partition counts: ``df.repartition(col)`` (no number) is a
REPARTITION_BY_COL shuffle, which AQE's runtime coalescing is allowed to
collapse based on *shuffle byte size*. Expression cost is invisible to that
estimate — a few MB of doc ids upstream of an expensive per-row expression
(MinHash signatures, O(n^2) vector probes) gets coalesced to ONE partition
and the whole stage runs on one core. ``df.repartition(n, col)`` is
REPARTITION_BY_NUM, which AQE must preserve, so the explicit form is the
only reliable way to fan CPU-bound (rather than byte-bound) work out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def parallelism(df: DataFrame, factor: int = 1) -> int:
    """Target partition count: cluster core count (defaultParallelism) times
    an optional oversubscription factor (use >1 when per-row cost is skewed
    so stragglers can be balanced)."""
    return df.sparkSession.sparkContext.defaultParallelism * factor


def spread(df: DataFrame, *cols: Column | str, factor: int = 1) -> DataFrame:
    """Hash-repartition ``df`` across the full cluster with an explicit
    partition count so AQE cannot coalesce the exchange away. Use upstream
    of expensive per-row expressions and ahead of self-joins whose output
    explodes beyond what plan-time size estimates can see."""
    return df.repartition(parallelism(df, factor), *cols)
