"""Unit tests for the mutation suite (U1-U8 join-rewrites) on tiny frames."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from sf_epa_data_ingestion_spark.operators import mutate


def test_merge_upsert_updates_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["k", "status", "price"]
    )
    source = spark.createDataFrame(
        [(2, "X", 99.0), (3, "Y", 30.0)], ["k", "status", "price"]
    )
    out = {r["k"]: r for r in mutate.merge_upsert(target, source, on=["k"]).collect()}
    assert out[1]["status"] == "a" and out[1]["price"] == 10.0  # untouched
    assert out[2]["status"] == "X" and out[2]["price"] == 99.0  # updated
    assert out[3]["status"] == "Y" and out[3]["price"] == 30.0  # inserted
    assert len(out) == 3


def test_merge_upsert_null_in_source_keeps_target_value(spark):
    target = spark.createDataFrame([(1, "keep")], ["k", "v"])
    source = spark.createDataFrame([(1, None)], "k long, v string")
    (row,) = mutate.merge_upsert(target, source, on=["k"]).collect()
    # coalesce(source, target) semantics: NULL update preserves the old value
    assert row["v"] == "keep"


def test_update_from_join_sets_only_matched(spark):
    target = spark.createDataFrame([(1, "P"), (2, "P"), (3, "P")], ["k", "status"])
    source = spark.createDataFrame([(2,)], ["sk"])
    out = mutate.update_from_join(
        target,
        source,
        F.col("t.k") == F.col("s.sk"),
        {"status": F.lit("DONE")},
    )
    got = {r["k"]: r["status"] for r in out.collect()}
    assert got == {1: "P", 2: "DONE", 3: "P"}


def test_delete_using(spark):
    target = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    source = spark.createDataFrame([(2,), (2,), (9,)], ["k"])
    got = sorted(r["k"] for r in mutate.delete_using(target, source, ["k"]).collect())
    assert got == [1, 3]


def test_add_columns_if_absent(spark):
    df = spark.createDataFrame([(1, "x")], ["k", "existing"])
    out = mutate.add_columns_if_absent(df, {"existing": "string", "new_col": "array<string>"})
    assert out.columns == ["k", "existing", "new_col"]
    (row,) = out.collect()
    assert row["existing"] == "x" and row["new_col"] is None


def test_atomic_overwrite_swaps_visible_image(spark, tmp_path):
    path = os.path.join(str(tmp_path), "tbl")
    mutate.atomic_overwrite(spark.range(5), path)
    assert spark.read.parquet(path).count() == 5
    mutate.atomic_overwrite(spark.range(3), path)
    assert spark.read.parquet(path).count() == 3
    # no leftover tmp/old siblings
    assert [p for p in os.listdir(str(tmp_path)) if p != "tbl"] == []


def test_create_or_replace_view(spark):
    mutate.create_or_replace_view(spark, "v_test", spark.range(4))
    assert spark.table("v_test").count() == 4
    mutate.create_or_replace_view(spark, "v_test", spark.range(2))
    assert spark.table("v_test").count() == 2


def test_compact_table_merges_small_files(spark, tmp_path):
    import os
    from sf_epa_data_ingestion_spark.operators.mutate import compact_table

    path = os.path.join(str(tmp_path), "t")
    # 40 tiny files via 40 partitions
    spark.range(0, 4000).repartition(40).write.mode("overwrite").parquet(path)
    before = spark.read.parquet(path)
    rows_before = before.count()
    stats = compact_table(spark, path, target_file_bytes=1 << 30)
    assert stats["files_before"] >= 40
    assert stats["files_after"] == 1
    after = spark.read.parquet(path)
    assert after.count() == rows_before
    assert sorted(r["id"] for r in after.collect()) == list(range(4000))
