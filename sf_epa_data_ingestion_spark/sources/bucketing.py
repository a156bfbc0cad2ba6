"""Bucketed-table layout for shuffle-free hub joins.

SCALE.md's layout decision for the hub-and-spoke entity tables: bucket
every table carrying the hub key (EPAREGNO in the reference; any join key
generally) by that key with a shared bucket count. Spark's bucketed scan
then reports the hash partitioning to the planner, and equi-joins /
aggregations on the bucket key run with NO Exchange — the join happens
bucket-to-bucket. At 100 TB this removes the dominant shuffle from every
J1/J4 join and the W1 window (sort-bucketed variant).

Plain parquet files cannot carry bucket metadata; bucketing requires the
session catalog (``saveAsTable``). Tables are written as EXTERNAL tables
(explicit ``path``) so the data lives wherever the caller's warehouse
layout dictates; only the metadata lives in the metastore.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (optionally sort-bucketed) table.

    All tables meant to join with each other must share ``num_buckets``
    and key order — mismatched bucket counts fall back to a shuffle on one
    side. ``sort_cols`` additionally pre-sorts within buckets, letting
    sort-merge joins skip their sort (and window functions over the bucket
    key skip both exchange and sort).
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def table(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back (bucketing metadata flows from the
    catalog into the scan; requires spark.sql.sources.bucketing.enabled,
    on by default)."""
    return spark.table(name)
