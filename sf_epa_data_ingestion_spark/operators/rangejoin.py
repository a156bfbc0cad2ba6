"""Keyless range join (point-in-interval) via bin decomposition.

The reference's only non-equi predicate is a suffix LIKE
(epa_ingestion.py:773); a data pipeline additionally needs the classic
"which band does this value fall in" lookup — IP→geo ranges, price bands,
time buckets — i.e. ``points ⋈ intervals ON lo <= p < hi`` with NO equi
key. Spark compiles that join directly to BroadcastNestedLoopJoin:
every point row is tested against every interval (O(n·m) comparisons),
fine for a dozen bands, catastrophic for a million ranges.

``range_join`` rewrites it Spark-first: decompose each interval into the
fixed-width bins it overlaps (one `explode(sequence(...))`), tag each
point with its bin, equi-join on the bin id, then re-check the exact
interval predicate. Catalyst executes the bin match as a hash join —
shuffle or broadcast by size — and the refine filter drops the few
false candidates a shared bin admits.

Scale notes (100 TB): the interval side is replicated by
ceil(len/bin_width) — pick ``bin_width`` near the median interval length
so replication stays O(1) per interval while each bin holds O(1)
intervals; both knobs degrade gracefully (too-wide bins → more refine
work, too-narrow → more interval copies, never wrong results). The join
shuffles on the bin id; value-skewed bins (a popular price range) are
ordinary hash-join skew — AQE skew splitting applies. A small interval
table (the common dimension case) broadcasts and the point side is
never shuffled at all.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``lo <= point < hi`` (half-open, the SQL BETWEEN-style variant is a
    caller-side tweak of the refine predicate). Output columns: all
    point columns followed by all interval columns.

    Correct for any ``bin_width > 0``: bins only generate candidates;
    the exact predicate decides membership. Intervals with ``hi <= lo``
    (empty) match nothing.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    w = float(bin_width)
    # Every bin the interval overlaps. floor(hi/w) over-covers when hi
    # lands exactly on a bin edge (half-open upper bound) — harmless:
    # the refine filter removes the candidates, and one extra copy per
    # interval is cheaper than an edge-case expression.
    b_intervals = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
            )
        ),
    ).filter(F.col(lo_col) < F.col(hi_col))
    b_points = points.withColumn(
        "__bin", F.floor(F.col(point_col) / F.lit(w)).cast("long")
    )
    return (
        b_points.join(b_intervals, "__bin")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__bin")
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bin_width: float,
) -> DataFrame:
    """Inner-join every pair of half-open intervals that overlaps:
    ``l_lo < r_hi AND r_lo < l_hi``. Column names must be disjoint
    across the two inputs (standard join hygiene). Empty intervals
    (hi <= lo) match nothing.

    Same bin decomposition as :func:`range_join`, with one extra idea: a
    pair sharing several bins would be emitted once per shared bin, and
    deduplicating afterwards costs a full shuffle of the *output*.
    Instead each candidate pair is owned by exactly ONE bin — the first
    bin of the overlap region, ``max(floor(l_lo/w), floor(r_lo/w))`` —
    which both intervals necessarily cover, so a cheap post-join filter
    replaces the dropDuplicates entirely.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    w = float(bin_width)

    def binned(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.filter(F.col(lo) < F.col(hi)).withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / F.lit(w)).cast("long"),
                    F.floor(F.col(hi) / F.lit(w)).cast("long"),
                )
            ),
        )

    owner = F.greatest(
        F.floor(F.col(l_lo) / F.lit(w)).cast("long"),
        F.floor(F.col(r_lo) / F.lit(w)).cast("long"),
    )
    return (
        binned(left, l_lo, l_hi)
        .join(binned(right, r_lo, r_hi), "__bin")
        .filter(
            (F.col("__bin") == owner)
            & (F.col(l_lo) < F.col(r_hi))
            & (F.col(r_lo) < F.col(l_hi))
        )
        .drop("__bin")
    )
