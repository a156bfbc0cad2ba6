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

from collections.abc import Sequence

import pyspark.sql.functions as F
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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-breaking equi-join: pathological hot keys on the ``big`` side
    are spread across ``n_salts`` reduce partitions.

    Recipe (SCALE.md §Joins): the big side gets a deterministic row salt
    (monotonic id mod n — spreads a hot key's rows evenly without an extra
    hash of payload columns); the small side is exploded n ways so every
    (key, salt) bucket finds its match. Join keys become on + [salt], so a
    key holding 30% of all rows lands on n_salts reducers instead of one.
    Semantics identical to ``big.join(small, on, how)`` for inner/left
    joins (each big row still matches each small row exactly once).

    Use when AQE's skew-join splitting can't help: AQE splits oversized
    *partitions* of sort-merge joins, but a single key that exceeds one
    task's memory inside a shuffled hash join, or skew behind a
    non-splittable stage, needs the key itself broken up.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_big = big.withColumn(
        "__salt", (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(salted_small, [*on, "__salt"], how).drop("__salt")
