"""Unit tests for relational operators (J/W/A series) on tiny frames."""

from __future__ import annotations

import pyspark.sql.functions as F

from sf_epa_data_ingestion_spark.operators import relational


def test_latest_per_key_string_date_ordering(spark):
    # STRING date DESC — the reference's exact dedup semantics (SURVEY §7.2)
    df = spark.createDataFrame(
        [
            ("p1", "f1", "2024-01-05"),
            ("p1", "f2", "2024-01-10"),
            ("p1", "f3", "2023-12-31"),
            ("p2", "f4", "2024-02-01"),
        ],
        ["key", "file", "accepted"],
    )
    out = relational.latest_per_key(df, ["key"], [F.desc("accepted"), F.asc("file")])
    got = {r["key"]: r["file"] for r in out.collect()}
    assert got == {"p1": "f2", "p2": "f4"}


def test_latest_per_key_tiebreak(spark):
    df = spark.createDataFrame(
        [("p1", "b", "2024-01-01"), ("p1", "a", "2024-01-01")], ["key", "file", "d"]
    )
    out = relational.latest_per_key(df, ["key"], [F.desc("d"), F.asc("file")])
    assert out.collect()[0]["file"] == "a"


def test_anti_and_semi_join(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    done = spark.createDataFrame([(2,), (2,)], ["k"])
    assert sorted(r["k"] for r in relational.anti_join(df, done, ["k"]).collect()) == [1, 3]
    assert [r["k"] for r in relational.semi_join(df, done, ["k"]).collect()] == [2]


def test_join_on_computed_key(spark):
    left = spark.createDataFrame([("file_a.pdf",), ("file_b.txt",)], ["name"])
    right = spark.createDataFrame([("pdf",)], ["ext"])
    out = relational.join_on_computed_key(
        left, right, F.regexp_extract(F.col("name"), r"\.(\w+)$", 1), F.col("ext")
    )
    assert [r["name"] for r in out.collect()] == ["file_a.pdf"]


def test_enrich_left_joins_keeps_unmatched(spark):
    base = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "v"])
    dim = spark.createDataFrame([(1, "d1")], ["k", "dval"])
    out = relational.enrich_left_joins(base, [(dim, ["k"])])
    got = {r["k"]: r["dval"] for r in out.collect()}
    assert got == {1: "d1", 2: None}


def test_group_collect_sorted(spark):
    df = spark.createDataFrame([("a", "z"), ("a", "m"), ("b", "q")], ["k", "v"])
    out = {r["k"]: r["vals"] for r in relational.group_collect(df, ["k"], "v", "vals").collect()}
    assert out == {"a": ["m", "z"], "b": ["q"]}


def test_group_collect_distinct_equals_dropdup_prepass(spark):
    """distinct=True (one-exchange collect_set) must equal the old
    dropDuplicates(keys+[col]) + collect_list form on every edge the two
    could diverge on: duplicate values per group, NULL values (both
    aggregates drop them), a group whose only value is NULL (row kept by
    the pre-pass but collects to an empty array either way)."""
    df = spark.createDataFrame(
        [("a", "z"), ("a", "z"), ("a", "m"), ("a", None), ("b", "q"), ("c", None)],
        ["k", "v"],
    )
    new = {
        r["k"]: r["vals"]
        for r in relational.group_collect(
            df, ["k"], "v", "vals", distinct=True
        ).collect()
    }
    old = {
        r["k"]: r["vals"]
        for r in relational.group_collect(
            df.dropDuplicates(["k", "v"]), ["k"], "v", "vals"
        ).collect()
    }
    assert new == old == {"a": ["m", "z"], "b": ["q"], "c": []}
