"""Binned keyless range join: correctness at bin edges and plan shape."""

from __future__ import annotations

import io
import contextlib

import pytest

from sf_epa_data_ingestion_spark.operators import rangejoin


def _pairs(df):
    return sorted((r["pid"], r["iid"]) for r in df.select("pid", "iid").collect())


@pytest.fixture()
def tables(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 3.0), (3, 8.0), (4, 7.999), (5, -2.5), (6, 100.0)],
        ["pid", "v"],
    )
    intervals = spark.createDataFrame(
        [
            (10, 0.0, 8.0),     # hi exactly on a bin edge (w=8): half-open
            (11, -4.0, 0.0),    # negative range
            (12, 2.0, 3.0),     # hi==3 excluded
            (13, 5.0, 5.0),     # empty interval matches nothing
            (14, -100.0, 200.0) # spans many bins
        ],
        ["iid", "lo", "hi"],
    )
    return points, intervals


def test_range_join_membership_half_open(spark, tables):
    points, intervals = tables
    got = _pairs(rangejoin.range_join(points, intervals, "v", "lo", "hi", bin_width=8.0))
    expect = sorted(
        (p, i)
        for p, v in [(1, 0.0), (2, 3.0), (3, 8.0), (4, 7.999), (5, -2.5), (6, 100.0)]
        for i, lo, hi in [
            (10, 0.0, 8.0), (11, -4.0, 0.0), (12, 2.0, 3.0), (13, 5.0, 5.0), (14, -100.0, 200.0)
        ]
        if lo <= v < hi
    )
    assert got == expect
    # spot-check the edges the binning must not break
    assert (3, 10) not in got       # v=8.0 excluded from [0,8)
    assert (1, 10) in got           # v=0.0 included at lo
    assert (5, 11) in got           # negative bins
    assert all(i != 13 for _, i in got)  # empty interval


def test_range_join_bin_width_invariance(spark, tables):
    points, intervals = tables
    base = _pairs(rangejoin.range_join(points, intervals, "v", "lo", "hi", bin_width=8.0))
    for w in (0.7, 3.0, 1000.0):
        assert _pairs(rangejoin.range_join(points, intervals, "v", "lo", "hi", bin_width=w)) == base


def test_range_join_is_hash_join_not_nested_loop(spark, tables):
    points, intervals = tables
    df = rangejoin.range_join(points, intervals, "v", "lo", "hi", bin_width=8.0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the whole point: an equi-join strategy (hash or sort-merge; AQE
    # converts to broadcast-hash at runtime from actual sizes), never the
    # O(n*m) fallback a raw lo<=v<hi condition compiles to
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


@pytest.fixture()
def interval_tables(spark):
    left = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 5.0, 6.0), (3, 20.0, 21.0), (4, 7.0, 7.0)],
        ["lid", "a_lo", "a_hi"],
    )
    right = spark.createDataFrame(
        [(10, 9.0, 30.0), (11, 10.0, 12.0), (12, -5.0, 0.0), (13, 5.5, 5.6)],
        ["rid", "b_lo", "b_hi"],
    )
    return left, right


def _opairs(df):
    return sorted((r["lid"], r["rid"]) for r in df.select("lid", "rid").collect())


def test_overlap_join_semantics(spark, interval_tables):
    left, right = interval_tables
    got = _opairs(
        rangejoin.overlap_join(left, right, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=4.0)
    )
    # [0,10) x [9,30) overlap; [0,10) x [10,12) touch -> NOT overlap (half-open);
    # [0,10) x [-5,0) touch at lo -> no; [5,6) x [5.5,5.6) contains; empty [7,7) never
    assert got == [(1, 10), (1, 13), (2, 13), (3, 10)]


def test_overlap_join_emits_each_pair_once(spark, interval_tables):
    left, right = interval_tables
    # [0,10) and [9,30) share bins 0..2 at w=4 -> ownership rule must emit once
    df = rangejoin.overlap_join(left, right, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=4.0)
    rows = [(r["lid"], r["rid"]) for r in df.collect()]
    assert len(rows) == len(set(rows)), "pair emitted in more than one bin"


def test_overlap_join_bin_width_invariance(spark, interval_tables):
    left, right = interval_tables
    base = _opairs(
        rangejoin.overlap_join(left, right, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=4.0)
    )
    for w in (0.3, 7.0, 500.0):
        assert (
            _opairs(
                rangejoin.overlap_join(left, right, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=w)
            )
            == base
        )
