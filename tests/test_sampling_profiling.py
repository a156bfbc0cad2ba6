"""Unit tests for deterministic sampling/splitting and profiling ops."""

from __future__ import annotations

import pyspark.sql.functions as F

from sf_epa_data_ingestion_spark.operators import profiling, sampling


def test_sample_by_hash_is_partition_invariant(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    a = {r["k"] for r in sampling.sample_by_hash(df, "k", 0.3).collect()}
    b = {r["k"] for r in sampling.sample_by_hash(df.repartition(17), "k", 0.3).collect()}
    assert a == b  # df.sample would fail this
    assert 0.2 < len(a) / 2000 < 0.4


def test_split_is_stable_under_append(spark):
    base = spark.range(0, 1000).select(F.col("id").alias("k"))
    first = {r["k"]: r["split"] for r in sampling.train_val_test_split(base, "k").collect()}
    grown = spark.range(0, 1500).select(F.col("id").alias("k"))
    second = {r["k"]: r["split"] for r in sampling.train_val_test_split(grown, "k").collect()}
    # appending rows never reassigns an existing key's split
    assert all(second[k] == v for k, v in first.items())
    assert set(second.values()) == {"train", "val", "test"}


def test_stratified_sample_respects_strata(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else ("de" if i % 4 == 1 else "fr")) for i in range(1000)],
        ["k", "lang"],
    )
    out = sampling.stratified_sample_by_hash(df, "k", "lang", {"en": 1.0, "de": 0.0})
    langs = {r["lang"] for r in out.collect()}
    assert langs == {"en"}  # de sampled at 0, fr not listed -> dropped
    assert out.count() == 500  # en fraction 1.0 keeps every en row


def test_column_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], ["k", "v"]
    )
    prof = {r["column"]: r for r in profiling.column_profile(df, ["k", "v"]).collect()}
    assert prof["k"]["n_rows"] == 4 and prof["k"]["n_null"] == 0 and prof["k"]["n_distinct"] == 4
    assert prof["v"]["n_null"] == 1 and prof["v"]["n_distinct"] == 2


def test_exact_percentiles_interpolation(spark):
    df = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 4]], ["x"])
    (row,) = profiling.exact_percentiles(df, "x", percentiles=(0.5,)).collect()
    assert row["p50"] == 2.5  # percentile_cont linear interpolation


def test_heavy_hitters_rank_and_ties(spark):
    df = spark.createDataFrame(
        [("g", "x")] * 3 + [("g", "y")] * 3 + [("g", "z")], ["grp", "v"]
    )
    rows = profiling.heavy_hitters(df, "v", k=2, by="grp").collect()
    assert [(r["value"], r["n"], r["rank"]) for r in sorted(rows, key=lambda r: r["rank"])] == [
        ("x", 3, 1),  # tie with y broken by value asc
        ("y", 3, 2),
    ]


def test_approx_column_profile_within_rsd(spark):
    from sf_epa_data_ingestion_spark.operators.profiling import (
        approx_column_profile,
        column_profile,
    )

    l = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    cols = ["l_partkey", "l_returnflag"]
    exact = {r["column"]: r for r in column_profile(l, cols).collect()}
    approx = {r["column"]: r for r in approx_column_profile(l, cols, rsd=0.05).collect()}
    for c in cols:
        assert approx[c]["n_rows"] == exact[c]["n_rows"]
        assert approx[c]["n_null"] == exact[c]["n_null"]
        # HLL++ error: allow 4 sigma of the requested 5% rsd
        assert abs(approx[c]["n_distinct"] - exact[c]["n_distinct"]) <= max(
            2, 0.20 * exact[c]["n_distinct"]
        )


def test_approx_percentiles_rank_error(spark):
    from sf_epa_data_ingestion_spark.operators.profiling import (
        approx_percentiles,
        exact_percentiles,
    )

    l = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in exact_percentiles(l, "l_extendedprice", "l_returnflag").collect()
    }
    approx = {
        r["l_returnflag"]: r
        for r in approx_percentiles(l, "l_extendedprice", "l_returnflag", accuracy=10_000).collect()
    }
    # rank error 1/accuracy translates to a small value error on a
    # smooth distribution; assert within 1% of the exact value
    for flag, ex in exact.items():
        for p in ("p25", "p50", "p75", "p95"):
            assert abs(approx[flag][p] - ex[p]) <= 0.01 * abs(ex[p]) + 1e-9


def test_pack_sequences_budget_and_offsets(spark):
    from sf_epa_data_ingestion_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, 300) for i in range(40)] + [(100, 5000)],  # one oversized doc
        "doc_id long, n_tok long",
    )
    out = pack_sequences(df, "doc_id", "n_tok", budget=1000, n_shards=4).collect()
    rows = {r["doc_id"]: r for r in out}
    assert len(rows) == 41
    # every offset is within the budget window
    assert all(0 <= r["offset_in_pack"] < 1000 for r in out if r["doc_id"] != 100)
    # a pack never starts mid-budget: offsets within a pack are multiples
    # of the doc size pattern — check pack fill <= budget + one doc
    from collections import defaultdict
    fill = defaultdict(int)
    for r in out:
        fill[r["pack_id"]] += 5000 if r["doc_id"] == 100 else 300
    assert all(v <= 1000 + 5000 for v in fill.values())
    # oversized doc starts at its pack boundary offset
    assert rows[100]["offset_in_pack"] < 1000
    # deterministic: same input -> same assignment
    again = {r["doc_id"]: r["pack_id"] for r in pack_sequences(df, "doc_id", "n_tok", 1000, 4).collect()}
    assert again == {k: v["pack_id"] for k, v in rows.items()}


def test_pack_sequences_partition_invariant(spark):
    from sf_epa_data_ingestion_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame([(i, 100 + i) for i in range(60)], "doc_id long, n_tok long")
    a = {r["doc_id"]: (r["pack_id"], r["offset_in_pack"])
         for r in pack_sequences(df, "doc_id", "n_tok", 500, 4).collect()}
    b = {r["doc_id"]: (r["pack_id"], r["offset_in_pack"])
         for r in pack_sequences(df.repartition(13), "doc_id", "n_tok", 500, 4).collect()}
    assert a == b


def test_resample_by_temperature_rates_and_determinism(spark):
    rows = [(i, "big") for i in range(400)] + [(i + 1000, "small") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept = sampling.resample_by_temperature(df, "doc_id", "lang", alpha=0.3)
    by_lang = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # smallest group keeps 100%
    assert by_lang["small"] == 40
    # head group downsampled to ~ (400/40)^(0.3-1) = 10^-0.7 ~ 0.2
    assert 40 <= by_lang["big"] <= 120
    # deterministic: same selection on re-run and on a different partitioning
    again = sampling.resample_by_temperature(
        df.repartition(7), "doc_id", "lang", alpha=0.3
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # alpha=1 keeps everything
    assert sampling.resample_by_temperature(df, "doc_id", "lang", alpha=1.0).count() == 440


def test_priority_sample_weighting_and_determinism(spark):
    rows = [(i, 1000.0) for i in range(100)] + [(i + 1000, 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = sampling.priority_sample(df, "doc_id", "w", k=50)
    ids = sorted(r["doc_id"] for r in got.collect())
    assert len(ids) == 50
    # 1000x weight should dominate the winners overwhelmingly
    assert sum(1 for i in ids if i < 1000) >= 45
    # partition-layout invariant
    again = sampling.priority_sample(df.repartition(13), "doc_id", "w", k=50)
    assert sorted(r["doc_id"] for r in again.collect()) == ids
    # zero/negative weights never sampled
    df2 = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 5.0)], ["doc_id", "w"])
    assert [r["doc_id"] for r in sampling.priority_sample(df2, "doc_id", "w", 3).collect()] == [3]


def test_priority_sample_grouped(spark):
    rows = [(i, "a" if i % 2 else "b", float(1 + i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "g", "w"])
    got = sampling.priority_sample(df, "doc_id", "w", k=5, by="g")
    per = {}
    for r in got.collect():
        per.setdefault(r["g"], []).append(r["doc_id"])
    assert sorted(per) == ["a", "b"] and all(len(v) == 5 for v in per.values())


def _naive_budget_sample(rows, budgets):
    """Greedy reference: per source, walk docs in (hash_unit, key) order,
    keep while cumulative weight of already-kept docs < budget."""
    import hashlib

    def unit(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:13], 16) / float(1 << 52)

    kept = set()
    by_source = {}
    for key, source, w in rows:
        by_source.setdefault(source, []).append((unit(key), key, w))
    for source, docs in by_source.items():
        cum = 0
        for u, key, w in sorted(docs):
            if cum < budgets.get(source, 0):
                kept.add(key)
                cum += w
    return kept


def test_sample_to_budget_matches_naive_walk(spark):
    """The scale-safe two-pass bucket plan must reproduce the naive
    per-source running-sum walk exactly — including the fill-until-full
    boundary doc — across bucket counts that force the boundary bucket
    to hold one, several, or all docs of a source."""
    import random

    rng = random.Random(7)
    rows = [
        (i, f"s{i % 5}", rng.randint(1, 400)) for i in range(300)
    ] + [(1000, "empty_budget", 10), (1001, "tiny", 5)]
    budgets = {"s0": 2000, "s1": 1, "s2": 10_000_000, "s3": 0, "s4": 777,
               "empty_budget": 0, "tiny": 1_000_000}
    df = spark.createDataFrame(rows, ["doc_id", "source", "w"])
    bdf = spark.createDataFrame(list(budgets.items()), ["source", "budget"])
    expected = _naive_budget_sample(rows, budgets)
    for n_buckets in (1, 7, 4096):
        got = {
            r["key"]
            for r in sampling.sample_to_budget(
                df, bdf, "w", key_col="doc_id", n_buckets=n_buckets
            ).collect()
        }
        assert got == expected, n_buckets
    # fill-until-full: budget 1 keeps exactly the first doc of s1
    assert any(k for k in expected if k % 5 == 1)
    # zero budget keeps nothing
    assert 1000 not in expected
    # budget above total keeps the whole source
    assert {k for k, s, _ in rows if s == "s2"} <= expected


def test_sample_to_budget_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}", 10 + i % 17) for i in range(500)],
        ["doc_id", "source", "w"],
    )
    bdf = spark.createDataFrame(
        [("s0", 300), ("s1", 900), ("s2", 40)], ["source", "budget"]
    )
    a = {r["key"] for r in sampling.sample_to_budget(df, bdf, "w").collect()}
    b = {
        r["key"]
        for r in sampling.sample_to_budget(df.repartition(13), bdf, "w").collect()
    }
    assert a == b and a


def test_shard_for_training_balanced_and_epoch_independent(spark):
    """The write-side global shuffle: shards near-uniform, order keys a
    fresh permutation per salt, everything a pure function of (salt, key)."""
    from sf_epa_data_ingestion_spark.operators.sampling import shard_for_training

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    n = d.count()
    e0 = shard_for_training(d, "doc_id", n_shards=8, salt="epoch0")
    sizes = [r["c"] for r in e0.groupBy("shard").agg(F.count("*").alias("c")).collect()]
    assert len(sizes) == 8
    assert max(sizes) < 2.0 * n / 8 and min(sizes) > 0.4 * n / 8  # md5-uniform
    # determinism: identical output across evaluations
    a = sorted((r["doc_id"], r["shard"], r["order_key"]) for r in e0.collect())
    b = sorted(
        (r["doc_id"], r["shard"], r["order_key"])
        for r in shard_for_training(d, "doc_id", n_shards=8, salt="epoch0").collect()
    )
    assert a == b
    # a new salt is a fresh permutation: order keys (and most shards) move
    e1 = {
        r["doc_id"]: (r["shard"], r["order_key"])
        for r in shard_for_training(d, "doc_id", n_shards=8, salt="epoch1").collect()
    }
    moved_order = sum(1 for k, s_, o in a if e1[k][1] != o)
    assert moved_order == n  # 52-bit hashes: collision probability ~0
    moved_shard = sum(1 for k, s_, o in a if e1[k][0] != s_)
    assert moved_shard > 0.7 * n  # expect ~7/8 to change cells


# ---------------------------------------------------------------------------
# mixture_sample (epoch-aware mixture materialization)
# ---------------------------------------------------------------------------


def _mix_corpus(spark, sizes: dict[str, int]):
    rows = []
    i = 0
    for d, n in sorted(sizes.items()):
        for _ in range(n):
            rows.append((i, d))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_sample_hits_exact_targets(spark):
    df = _mix_corpus(spark, {"a": 10, "b": 40, "c": 5})
    weights = {"a": 2.0, "b": 1.0, "c": 1.0}  # norm 4 -> a 50, b 25, c 25
    out = sampling.mixture_sample(df, weights, 100).collect()
    by_dom: dict = {}
    for r in out:
        by_dom.setdefault(r["source"], []).append(r)
    targets = sampling.mixture_targets(weights, 100)
    assert {d: len(v) for d, v in by_dom.items()} == targets
    # a (10 rows, target 50): 5 full epochs, no partial — every row
    # appears at epochs 0..4 exactly once
    a_epochs: dict = {}
    for r in by_dom["a"]:
        a_epochs.setdefault(r["doc_id"], set()).add(r["epoch"])
    assert all(v == {0, 1, 2, 3, 4} for v in a_epochs.values())
    # c (5 rows, target 25): 5 full epochs as well
    assert {r["epoch"] for r in by_dom["c"]} == {0, 1, 2, 3, 4}
    # b (40 rows, target 25): 0 full epochs + 25-row partial at epoch 0,
    # no row twice
    b_ids = [r["doc_id"] for r in by_dom["b"]]
    assert len(b_ids) == len(set(b_ids)) == 25
    assert {r["epoch"] for r in by_dom["b"]} == {0}


def test_mixture_sample_partial_epoch_is_hash_prefix(spark):
    """The partial epoch must take exactly the first (target mod n) rows
    in (hash_unit, key) order — the sample_to_budget walk."""
    df = _mix_corpus(spark, {"a": 20})
    out = {r["doc_id"] for r in sampling.mixture_sample(df, {"a": 1.0}, 7).collect()}
    ranked = (
        df.withColumn("u", sampling._hash_unit(F.col("doc_id")))
        .orderBy("u", "doc_id")
        .collect()
    )
    assert out == {r["doc_id"] for r in ranked[:7]}


def test_mixture_sample_partition_invariant(spark):
    df = _mix_corpus(spark, {"a": 30, "b": 30})
    w = {"a": 3.0, "b": 1.0}
    one = sorted(
        (r["doc_id"], r["epoch"])
        for r in sampling.mixture_sample(df.coalesce(1), w, 50).collect()
    )
    many = sorted(
        (r["doc_id"], r["epoch"])
        for r in sampling.mixture_sample(df.repartition(13), w, 50).collect()
    )
    assert one == many and len(one) == sum(sampling.mixture_targets(w, 50).values())


def test_mixture_sample_excludes_unweighted_domains(spark):
    df = _mix_corpus(spark, {"a": 10, "zz": 10})
    out = sampling.mixture_sample(df, {"a": 1.0}, 5).collect()
    assert {r["source"] for r in out} == {"a"} and len(out) == 5
