"""Dataset profiling for training-data pipelines: column statistics,
exact percentiles, and heavy hitters.

A corpus-curation loop needs fast answers to "what's in this table":
null/blank rates, distinct counts, length distributions, and the most
frequent values per dimension (heavy hitters drive dedup and filtering
decisions). Everything here is exact and grouped-aggregate-shaped, so
it is one partial-aggregated shuffle per call and oracle-checkable;
approximate variants (approx_count_distinct / percentile_approx /
count-min) are drop-in swaps at the 100 TB tier where exactness stops
mattering — noted per function.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def column_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column rows / nulls / distincts, long format (column, metric
    rows stack via unions of tiny aggregates — one job, Catalyst merges
    the scans). Exact count_distinct; swap to approx_count_distinct at
    the 100 TB tier (one pass, fixed memory)."""
    parts = []
    for c in cols:
        parts.append(
            df.agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    percentiles: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Exact linear-interpolated percentiles (SQL percentile_cont
    semantics — matches DuckDB quantile_cont bit-for-bit on the same
    doubles). One shuffle; at 100 TB use percentile_approx with a
    bounded accuracy knob instead.

    All requested percentiles go through ONE ``percentile(col, array(...))``
    aggregate: N separate percentile aggregates each buffer + sort the
    group's values independently (measured 4x slower at sf0.1), while the
    array form pays for the buffer once and reads N order statistics."""
    arr = F.percentile(
        F.col(value_col), F.array(*[F.lit(p) for p in percentiles])
    ).alias("__ps")
    names = [f"p{int(p * 100)}" for p in percentiles]
    agged = df.groupBy(group_col).agg(arr) if group_col else df.agg(arr)
    keep = [group_col] if group_col else []
    return agged.select(
        *keep, *[F.col("__ps")[i].alias(n) for i, n in enumerate(names)]
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10, by: str | None = None
) -> DataFrame:
    """Top-k most frequent values (optionally per group ``by``), exact:
    count + rank window, ties broken by value for determinism. At 100 TB
    swap the exact count for a count-min sketch + candidate verify pass."""
    keys = [F.col(by)] if by else []
    counted = df.groupBy(*keys, F.col(col).alias("value")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(*keys).orderBy(F.desc("n"), F.asc("value"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*([by] if by else []), "value", "n", F.col("rank").cast("long").alias("rank"))
    )


def approx_column_profile(
    df: DataFrame, cols: Sequence[str], rsd: float = 0.05
) -> DataFrame:
    """The 100 TB tier of ``column_profile``: HyperLogLog++ distinct
    counts (``approx_count_distinct``, relative standard deviation
    ``rsd``) instead of exact ``count_distinct``. Exact distinct-count is
    a full shuffle of every distinct value per column; the sketch is
    fixed-size per partition and merges map-side, so the whole profile
    is one partial-aggregated pass regardless of cardinality."""
    parts = []
    for c in cols:
        parts.append(
            df.agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
                F.approx_count_distinct(F.col(c), rsd=rsd).alias("n_distinct"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def approx_percentiles(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    percentiles: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10_000,
) -> DataFrame:
    """The 100 TB tier of ``exact_percentiles``: Greenwald-Khanna sketches
    (``percentile_approx``) with rank error <= 1/accuracy. The exact
    aggregate buffers every group value on one reducer; the sketch is
    bounded-memory and merges map-side, so wide groups stop being a
    single-task bottleneck. Same output column names as the exact form so
    callers can switch on a size threshold."""
    arr = F.percentile_approx(
        F.col(value_col),
        F.array(*[F.lit(p) for p in percentiles]),
        F.lit(accuracy),
    ).alias("__ps")
    names = [f"p{int(p * 100)}" for p in percentiles]
    agged = df.groupBy(group_col).agg(arr) if group_col else df.agg(arr)
    keep = [group_col] if group_col else []
    return agged.select(
        *keep, *[F.col("__ps")[i].cast("double").alias(n) for i, n in enumerate(names)]
    )


def fixed_width_histogram(
    df: DataFrame, value_col: str, width: float, origin: float = 0.0
) -> DataFrame:
    """Equi-width histogram: bucket b covers [origin + b*width, origin +
    (b+1)*width). One map-side-combined aggregate — the classic
    scan-bound profile; bucket arithmetic is plain double math so any
    SQL engine reproduces it bit-for-bit (floor of an IEEE division).
    """
    b = F.floor((F.col(value_col) - F.lit(origin)) / F.lit(width)).cast("long")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .withColumn("bucket_lo", F.lit(origin) + F.col("bucket") * F.lit(width))
    )
