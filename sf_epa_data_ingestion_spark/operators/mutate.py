"""Mutation suite: MERGE / UPDATE-from-join / DELETE-using as join-rewrites.

Plain Parquet is immutable, so each warehouse mutation the reference issued
(citations into /root/reference/) becomes a deterministic
read -> transform -> atomic-rewrite:

- U1 MERGE INTO ... ON key            epa_ingestion.py:585-623  -> ``merge_upsert``
- U2 UPDATE ... FROM (suffix LIKE)    epa_ingestion.py:769-775  -> ``update_from_join``
- U3 UPDATE ... FROM (4-way join)     epa_ingestion.py:807-826  -> ``update_from_join``
- U4 DELETE ... USING                 epa_ingestion.py:744-749  -> ``delete_using``
- U6 ALTER TABLE ADD COLUMN IF N.E.   epa_ingestion.py:797-805  -> ``add_columns_if_absent``
- U7 commit/rollback atomicity        epa_ingestion.py:628-632  -> ``atomic_overwrite``

Scale notes: every rewrite here is a single shuffle-on-key (or a broadcast
when the update/delete side is small — the common case: the "changed rows"
set is tiny relative to the table). At 100 TB the answer is a transactional
table format (Delta/Iceberg MERGE INTO) — these functions express the same
logical semantics so a swap is mechanical; ``atomic_overwrite`` documents
the tmp-dir + rename publish used on plain filesystems.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    on: Sequence[str],
    update_cols: Sequence[str] | None = None,
) -> DataFrame:
    """U1: MERGE INTO target USING source ON keys —
    WHEN MATCHED THEN UPDATE (source wins), WHEN NOT MATCHED THEN INSERT.

    Implemented as a full-outer join + per-column ``coalesce(source, target)``
    (epa_ingestion.py:585-623 parity). Requires ``source`` unique on the
    merge keys (the reference guaranteed this by staging through a temp
    table keyed on EPAREGNO).
    """
    keys = list(on)
    s_cols = [c for c in source.columns if c not in keys]
    t_cols = [c for c in target.columns if c not in keys]
    update_cols = list(update_cols) if update_cols is not None else [c for c in s_cols if c in t_cols]

    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, keys, "full_outer")
    out_cols: list[Column] = [F.coalesce(*[F.col(f"{side}.{k}") for side in ("s", "t")]).alias(k) for k in keys]
    for c in target.columns:
        if c in keys:
            continue
        if c in update_cols:
            out_cols.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    # insert-only columns present in source but absent in target are dropped,
    # matching MERGE's "insert into the target schema" semantics.
    _ = t_cols
    return joined.select(*out_cols)


def update_from_join(
    target: DataFrame,
    source: DataFrame,
    condition: Column,
    set_cols: dict[str, Column],
) -> DataFrame:
    """U2/U3: UPDATE target SET col = expr FROM source WHERE condition.

    Left-joins target to (deduplicated) source rows on ``condition``; rows
    with a match get ``set_cols`` applied, others keep their values. The
    condition may be non-equi (the reference used a suffix LIKE,
    epa_ingestion.py:773) — Catalyst will pick BNLJ for that; prefer
    materializing an equi key (see relational.join_on_computed_key) when
    the predicate allows.

    Both sides are aliased — build ``condition`` and ``set_cols`` with
    ``F.col("t.x")`` / ``F.col("s.y")``. ``source`` must be unique with
    respect to the condition (one matching row per target row), matching
    the reference's staged-update discipline; multi-matches would fan out.
    """
    marker = "__matched"
    src = source.dropDuplicates().withColumn(marker, F.lit(True))
    joined = target.alias("t").join(broadcast(src).alias("s"), condition, "left")
    out_cols = []
    for name in target.columns:
        if name in set_cols:
            out_cols.append(
                F.when(F.col(f"s.{marker}"), set_cols[name])
                .otherwise(F.col(f"t.{name}"))
                .alias(name)
            )
        else:
            out_cols.append(F.col(f"t.{name}").alias(name))
    return joined.select(*out_cols)


def delete_using(target: DataFrame, source: DataFrame, on: Sequence[str]) -> DataFrame:
    """U4/J6: DELETE FROM target USING source WHERE keys match ==
    keep only non-matching rows (left anti)."""
    return target.join(source.select(*on).dropDuplicates(list(on)), list(on), "left_anti")


def add_columns_if_absent(df: DataFrame, columns: dict[str, str]) -> DataFrame:
    """U6: ALTER TABLE ADD COLUMN IF NOT EXISTS — null-typed columns added
    only when missing (epa_ingestion.py:797-805)."""
    out = df
    existing = {c.lower() for c in df.columns}
    for name, dtype in columns.items():
        if name.lower() not in existing:
            out = out.withColumn(name, F.lit(None).cast(dtype))
    return out


def atomic_overwrite(df: DataFrame, path: str) -> None:
    """U7: transactional publish on a plain filesystem.

    The reference wrapped multi-statement mutations in commit/rollback
    (epa_ingestion.py:628-632). Parquet has no transactions, so: write the
    full new table image to a ``_tmp`` sibling, then swap directories. The
    swap is a metadata operation — readers see old or new, never a mix.
    (On object stores / at cluster scale: use Delta or Iceberg instead.)
    """
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def create_or_replace_view(spark: SparkSession, name: str, df: DataFrame) -> None:
    """U8: CREATE OR REPLACE VIEW (epa_ingestion.py:432, 484)."""
    df.createOrReplaceTempView(name)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Maintenance: rewrite a parquet table into ~``target_file_bytes``
    files. Long-running ingest (the reference appends per product batch,
    epa_ingestion.py:399-418) accretes small files; at cluster scale each
    file under ~the scan partition size wastes a task and floods the
    driver with footer reads.

    File count = ceil(on-disk bytes / target). Uses ``coalesce`` when
    shrinking (no shuffle — each output task concatenates whole input
    partitions) and falls back to ``repartition`` when the table has
    fewer partitions than the target (rare: growing the file count).
    Publishes via the same atomic directory swap as every other mutation
    (readers see old or new, never a mix). Returns before/after stats.
    """
    files_before = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    bytes_total = sum(os.path.getsize(f) for f in files_before)
    n_target = max(1, -(-bytes_total // target_file_bytes))  # ceil
    df = spark.read.parquet(path)
    n_current = df.rdd.getNumPartitions()
    out = df.coalesce(n_target) if n_target <= n_current else df.repartition(n_target)
    atomic_overwrite(out, path)
    files_after = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    return {
        "files_before": len(files_before),
        "files_after": len(files_after),
        "bytes": bytes_total,
        "target_file_bytes": target_file_bytes,
    }


def scd2_history(
    changelog: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log: compress
    consecutive rows whose tracked attributes are unchanged, then derive
    half-open validity intervals [valid_from, valid_to) per key, with
    ``is_current`` on the open row.

    Beyond the reference's type-1 MERGE (epa_ingestion.py:585-623 keeps
    only the latest row); this is the history-preserving variant a
    warehouse dimension needs. Two windows over the SAME (key, order)
    partitioning -> Catalyst plans ONE shuffle + one sort for both (and
    bucketing the changelog by key removes even that at 100 TB).

    ``order_tiebreak`` must make (ts, *tiebreak) a total order per key,
    or change-compression is nondeterministic.
    """
    keys = list(key_cols)
    order = [F.asc(ts_col)] + [F.asc(c) for c in order_tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = (
        changelog.withColumn("__prev", F.lag(attrs).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != attrs))
        .drop("__prev")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
