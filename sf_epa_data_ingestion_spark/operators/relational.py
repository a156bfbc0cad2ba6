"""Relational operators: joins, latest-per-key dedup, anti-joins, rollups.

Reference parity (citations into /root/reference/):
- J1 inner equi-join               epa_ingestion.py:449-450
- J2 right-join+IS NULL anti-join  epa_ingestion.py:454-456
- J3 join on computed (regex) key  epa_ingestion.py:493-500
- J4 multi-way left enrich joins   epa_ingestion.py:814-823
- W1 row_number QUALIFY dedup      epa_ingestion.py:451
- A1 ARRAY_AGG group rollup        epa_ingestion.py:818-823

Each op is a pure ``DataFrame -> DataFrame`` function so Catalyst sees one
combined logical plan per pipeline — predicate pushdown and join reordering
work across op boundaries.

Scale notes:
- ``latest_per_key`` shuffles once on the partition keys; at 100 TB the
  right physical layout is bucketing the hub tables by the hub key
  (SURVEY §4) so this and every hub join reuse the same partitioning.
- Anti/semi joins of a big fact against a small "done" set broadcast the
  small side; Catalyst does that automatically below
  ``spark.sql.autoBroadcastJoinThreshold``, and ``broadcast()`` is applied
  explicitly where we *know* the side is dimension-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.functions import broadcast


def latest_per_key(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    keep: int = 1,
) -> DataFrame:
    """W1: ``ROW_NUMBER() OVER (PARTITION BY .. ORDER BY ..) <= keep``.

    The reference deduped PDF files to the latest accepted date per product
    with QUALIFY (epa_ingestion.py:451) — ordering on a STRING date column,
    which this reproduces exactly when given a string order column.
    Callers should pass a deterministic total order (add a tiebreaker).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= keep)
        .drop("__rn")
    )


def anti_join(df: DataFrame, done: DataFrame, on: Sequence[str]) -> DataFrame:
    """J2: rows of ``df`` with no match in ``done``.

    The reference spelled this RIGHT JOIN ... WHERE x IS NULL
    (epa_ingestion.py:454-456); ``left_anti`` is the same relation with a
    broadcast-able build side.
    """
    return df.join(done.select(*on).dropDuplicates(list(on)), list(on), "left_anti")


def semi_join(df: DataFrame, keep: DataFrame, on: Sequence[str]) -> DataFrame:
    """Existence filter (the positive half of the J2/J6 idiom)."""
    return df.join(keep.select(*on).dropDuplicates(list(on)), list(on), "left_semi")


def join_on_computed_key(
    left: DataFrame,
    right: DataFrame,
    left_expr: Column,
    right_expr: Column,
    how: str = "inner",
) -> DataFrame:
    """J3: equi-join on derived keys (reference derived one side with
    REGEXP_SUBSTR, epa_ingestion.py:496-500). Materializing the key as a
    column keeps the join an equi-join → hash-joinable, AQE-skew-splittable,
    instead of a theta join."""
    lk, rk = "__lk", "__rk"
    return (
        left.withColumn(lk, left_expr)
        .join(right.withColumn(rk, right_expr), F.col(lk) == F.col(rk), how)
        .drop(lk, rk)
    )


def enrich_left_joins(
    base: DataFrame,
    dims: Sequence[tuple[DataFrame, Sequence[str]]],
    broadcast_dims: bool = True,
) -> DataFrame:
    """J4: chained LEFT JOINs against dimension tables
    (epa_ingestion.py:814-823). Dimensions are broadcast so the fact table
    never shuffles — the whole enrichment is one map-side stage."""
    out = base
    for dim, keys in dims:
        d = broadcast(dim) if broadcast_dims else dim
        out = out.join(d, list(keys), "left")
    return out


def group_collect(
    df: DataFrame,
    group_by: Sequence[str],
    collect_col: str,
    alias: str,
    sort: bool = True,
    distinct: bool = False,
) -> DataFrame:
    """A1: ARRAY_AGG(col) GROUP BY keys (epa_ingestion.py:818-823).

    ``collect_list`` order is nondeterministic under parallelism (true in
    the reference engine too), so by default the array is sorted to make
    results reproducible and oracle-comparable.

    ``distinct``: ARRAY_AGG(DISTINCT col) in ONE aggregate
    (``collect_set``), replacing the ``dropDuplicates(keys + [col])``
    pre-pass callers otherwise need — which costs a second Exchange of
    the whole relation keyed (keys, col) before the collect's own
    (keys) Exchange. ``collect_set`` dedups inside the aggregation
    buffer with map-side partial merge, so the relation shuffles ONCE.
    Value-identical to the pre-pass form: both drop NULLs
    (collect_list and collect_set ignore null input), both keep one
    copy per (group, value), and ``sort`` canonicalizes the order
    either way.
    """
    agg = F.collect_set(collect_col) if distinct else F.collect_list(collect_col)
    if sort:
        agg = F.sort_array(agg)
    return df.groupBy(*group_by).agg(agg.alias(alias))
