"""txlog round 2: exactly-once streaming sink + data skipping.

- streaming/txsink.py: replayed micro-batches (Structured Streaming's
  at-least-once foreachBatch contract) must not duplicate rows, because
  the txn marker commits atomically with the data.
- storage/txlog.py stats: per-file min/max committed with every add must
  prune files a predicate provably excludes, without changing results.
"""

import os

import pytest
import pyspark.sql.functions as F

from sf_epa_data_ingestion_spark.storage import TxTable
from sf_epa_data_ingestion_spark.streaming.txsink import exactly_once_appender

SF001 = "/root/testdata/sf0.001"


@pytest.fixture()
def orders(spark):
    return spark.read.parquet(os.path.join(SF001, "orders.parquet"))


def test_replayed_batch_is_noop(spark, tmp_path, orders):
    t = TxTable(spark, str(tmp_path / "t")).create(orders.limit(0))
    sink = exactly_once_appender(t, "ingest-test")
    b0 = orders.filter(F.col("o_orderkey") % 2 == 0)
    b1 = orders.filter(F.col("o_orderkey") % 2 == 1)
    sink(b0, 0)
    sink(b1, 1)
    n = t.read().count()
    assert n == orders.count()
    # crash-replay of the last batch (and an ancient one): both no-ops
    sink(b1, 1)
    sink(b0, 0)
    assert t.read().count() == n
    # next batch still lands
    sink(orders.limit(5).withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000), 2)
    assert t.read().count() == n + 5
    assert t.last_txn("ingest-test") == 2
    # a different app id has its own sequence
    assert t.last_txn("other-app") is None


def test_exactly_once_through_real_stream_restart(spark, tmp_path, orders):
    """Two availableNow runs over a growing directory with the same
    checkpoint: engine-managed batch ids must line up with the markers."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    first = orders.limit(100)
    first.write.mode("overwrite").parquet(src)
    t = TxTable(spark, str(tmp_path / "tbl")).create(orders.limit(0))
    sink = exactly_once_appender(t, "stream-test")

    def run_once():
        q = (
            spark.readStream.schema(orders.schema).parquet(src)
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert t.read().count() == 100
    # grow the source, restart the query — only the delta lands
    orders.limit(150).write.mode("overwrite").parquet(src + "_tmp")
    more = spark.read.parquet(src + "_tmp").subtract(first)
    more.write.mode("append").parquet(src)
    run_once()
    assert t.read().count() == 100 + more.count()
    # rows are exactly the union, no dupes
    assert t.read().select("o_orderkey").distinct().count() == t.read().count()


def test_data_skipping_prunes_files_not_results(spark, tmp_path, orders):
    # range-partition on the key so files have disjoint key ranges
    parts = orders.repartitionByRange(8, "o_orderkey")
    t = TxTable(spark, str(tmp_path / "t")).create(parts)
    all_files = t.read_files()
    assert len(all_files) == 8
    lo = orders.agg(F.min("o_orderkey")).first()[0]
    filt = [("o_orderkey", "<=", lo + 5)]
    pruned = t.read_files(filters=filt)
    assert len(pruned) < len(all_files)  # most files skipped
    got = t.read(filters=filt)
    want = orders.filter(F.col("o_orderkey") <= lo + 5)
    assert sorted(r["o_orderkey"] for r in got.collect()) == sorted(
        r["o_orderkey"] for r in want.collect()
    )


def test_skipping_is_conservative_on_unindexed_columns(spark, tmp_path, orders):
    t = TxTable(spark, str(tmp_path / "t")).create(orders.repartitionByRange(4, "o_orderkey"))
    # o_orderdate may not be indexed (type-dependent); filtering on it must
    # still return exact results, pruned or not
    d = orders.select(F.max("o_orderdate")).first()[0]
    got = t.read(filters=[("o_orderdate", "=", d)]).count()
    want = orders.filter(F.col("o_orderdate") == d).count()
    assert got == want


def test_compact_clusters_and_enables_skipping(spark, tmp_path, orders):
    # many tiny appends with overlapping key ranges: skipping prunes nothing
    t = TxTable(spark, str(tmp_path / "t")).create(orders.limit(0))
    sink = exactly_once_appender(t, "ingest")
    for i in range(4):
        sink(orders.filter(F.col("o_orderkey") % 4 == i), i)
    # a MID-RANGE key sits inside every stripe's [min,max] span, so
    # pruning is powerless before clustering
    mid = orders.approxQuantile("o_orderkey", [0.5], 0.0)[0]
    key = orders.filter(F.col("o_orderkey") >= mid).agg(F.min("o_orderkey")).first()[0]
    filt = [("o_orderkey", "=", key)]
    before = t.read_files(filters=filt)
    assert len(before) == len(t.read_files())
    v = t.compact(cluster_by=["o_orderkey"], target_files=8)
    after = t.read_files(filters=filt)
    assert len(t.read_files()) == 8
    assert len(after) <= 2  # disjoint ranges: point lookup hits ~1 file
    # contents unchanged, history intact
    assert t.read().count() == orders.count()
    assert t.read(version=v - 1).count() == orders.count()
    got = t.read(filters=filt).collect()
    assert len(got) == orders.filter(F.col("o_orderkey") == key).count()


def test_zorder_compact_skips_on_both_dimensions(spark, tmp_path, orders):
    t = TxTable(spark, str(tmp_path / "t")).create(orders.repartition(4))
    t.compact(cluster_by=["o_orderkey", "o_custkey"], target_files=16, zorder=True)
    total = len(t.read_files())
    assert total == 16
    # mid-range point predicates on EITHER clustered column prune files
    for col in ("o_orderkey", "o_custkey"):
        mid = orders.approxQuantile(col, [0.5], 0.0)[0]
        key = orders.filter(F.col(col) >= mid).agg(F.min(col)).first()[0]
        filt = [(col, "=", key)]
        pruned = t.read_files(filters=filt)
        assert len(pruned) < total, f"no pruning on {col}"
        got = t.read(filters=filt).count()
        want = orders.filter(F.col(col) == key).count()
        assert got == want
    assert t.read().count() == orders.count()


def test_stats_survive_merge_rewrite(spark, tmp_path, orders):
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    t = TxTable(spark, str(tmp_path / "t")).create(base.repartitionByRange(4, "o_orderkey"))
    lo = base.agg(F.min("o_orderkey")).first()[0]
    upd = base.filter(F.col("o_orderkey") == lo).withColumn(
        "o_totalprice", F.lit(0.0)
    )
    t.merge(upd, ["o_orderkey"])
    # rewritten file got fresh stats: pruning on the key still exact
    filt = [("o_orderkey", "=", lo)]
    assert len(t.read_files(filters=filt)) < len(t.read_files())
    row = t.read(filters=filt).collect()
    assert len(row) == 1 and row[0]["o_totalprice"] == 0.0


def test_zorder_handles_temporal_columns(spark, tmp_path, orders):
    # o_orderdate is timestamp_ntz: quantiles go through the epoch
    # mapping, and its per-file bounds are stored as isoformat strings —
    # a temporal filter must both PRUNE and stay exact
    t = TxTable(spark, str(tmp_path / "t")).create(orders.repartition(4))
    t.compact(cluster_by=["o_orderdate", "o_custkey"], target_files=8, zorder=True)
    assert t.read().count() == orders.count()
    d = orders.select(F.max("o_orderdate")).first()[0]
    filt = [("o_orderdate", "=", d)]
    assert len(t.read_files(filters=filt)) < len(t.read_files())
    got = t.read(filters=filt).count()
    assert got == orders.filter(F.col("o_orderdate") == d).count()


def test_in_filter_skips_files_and_preserves_results(spark, tmp_path):
    """r9: the ``in`` op — the cell/bucket probe shape (IVF cells,
    SemDeDup hit cells) — must prune every file whose [min, max] excludes
    all probed values, keep files any value could hit, and stay
    result-transparent (the residual isin still applies)."""
    from sf_epa_data_ingestion_spark.storage import TxTable
    import pyspark.sql.functions as F

    rows = [(i, i % 16) for i in range(1600)]
    df = spark.createDataFrame(rows, "id long, cid int").repartitionByRange(8, "cid")
    t = TxTable(spark, str(tmp_path / "t")).create(df)
    all_files = t.read_files()
    assert len(all_files) == 8

    probe = [0, 1]  # lives in the first range files only
    pruned = t.read_files(filters=[("cid", "in", probe)])
    assert 0 < len(pruned) < len(all_files)

    got = sorted(r["id"] for r in t.read(filters=[("cid", "in", probe)]).collect())
    want = sorted(
        r["id"] for r in t.read().filter(F.col("cid").isin(probe)).collect()
    )
    assert got == want and len(got) == 200

    # empty probe: proves-empty everywhere -> zero files, zero rows
    assert t.read_files(filters=[("cid", "in", [])]) == []
    assert t.read(filters=[("cid", "in", [])]).count() == 0


def test_in_filter_string_probe_is_single_element(spark, tmp_path):
    """r9 ADVICE: a bare string probe must mean {that string}, not its
    characters (list("abc") == ['a','b','c'] would silently match wrong
    rows in both the residual isin and the bounds check)."""
    from sf_epa_data_ingestion_spark.storage import TxTable

    rows = [(1, "ab"), (2, "a"), (3, "b"), (4, "abc")]
    df = spark.createDataFrame(rows, "id long, k string")
    t = TxTable(spark, str(tmp_path / "t")).create(df.coalesce(1))
    got = sorted(r["id"] for r in t.read(filters=[("k", "in", "ab")]).collect())
    assert got == [1]  # NOT [2, 3] (per-character explosion)
    got = sorted(r["id"] for r in t.read(filters=[("k", "in", ["a", "b"])]).collect())
    assert got == [2, 3]


def test_zorder_compaction_tightens_in_probe_skipping(spark, tmp_path):
    """The maintenance the SemDeDup monitor's docstring prescribes,
    end-to-end: per-batch appends span many cells (wide per-file cid
    bounds -> the in-probe keeps every file), and a
    ``compact(zorder=["cid"])`` re-clusters so the same probe skips most
    files — with identical results before and after."""
    from sf_epa_data_ingestion_spark.storage import TxTable
    import pyspark.sql.functions as F

    t = TxTable(spark, str(tmp_path / "state")).create(
        spark.createDataFrame([], "id long, cid int")
    )
    # 6 "micro-batch" appends, each spanning all 16 cells (the monitor's
    # repartition(1) append shape)
    for b in range(6):
        rows = [(b * 1000 + i, i % 16) for i in range(160)]
        t.append(spark.createDataFrame(rows, "id long, cid int").coalesce(1))
    probe = [3, 7]
    filt = [("cid", "in", probe)]
    before_files = t.read_files(filters=filt)
    assert len(before_files) == len(t.read_files())  # wide bounds: no skip
    want = sorted(r["id"] for r in t.read(filters=filt).collect())

    t.compact(cluster_by=["cid"], zorder=True, target_files=8)
    after_files = t.read_files(filters=filt)
    assert len(after_files) < len(t.read_files())  # clustered: probe skips
    got = sorted(r["id"] for r in t.read(filters=filt).collect())
    assert got == want and len(got) == 6 * 160 * 2 // 16


def test_compact_only_small_bytes_never_rewrites_big_generations(spark, tmp_path):
    """r10: change-proportional OPTIMIZE — with ``only_small_bytes`` the
    rewrite bin-packs only the small accumulated appends; an earlier
    compacted (big) generation's files stay byte-identical on disk, and
    results are unchanged. This is what keeps in-monitor maintenance
    O(recent appends) instead of O(corpus) on a long-running stream."""
    import os

    from sf_epa_data_ingestion_spark.storage import TxTable
    import pyspark.sql.functions as F

    # a "big generation": one file with padded rows to exceed the
    # small-file threshold we use below
    pad = "x" * 2000
    big = spark.createDataFrame(
        [(i, i % 4, pad) for i in range(2000)], "id long, cid int, pad string"
    ).coalesce(1)
    t = TxTable(spark, str(tmp_path / "t")).create(big)
    big_files = {
        f: os.stat(os.path.join(t.root, f)).st_mtime_ns for f in t.read_files()
    }
    assert len(big_files) == 1
    threshold = os.path.getsize(os.path.join(t.root, next(iter(big_files))))

    # many small appends
    for b in range(8):
        t.append(
            spark.createDataFrame(
                [(10_000 + b * 10 + j, j % 4, "s") for j in range(4)],
                "id long, cid int, pad string",
            ).coalesce(1)
        )
    want = sorted(r["id"] for r in t.read().collect())
    assert len(t.read_files()) == 9

    t.compact(cluster_by=["cid"], target_files=2, only_small_bytes=threshold)
    after = t.read_files()
    # small files merged to the target; the big generation untouched
    assert len(after) == 3
    for f, mtime in big_files.items():
        assert f in after
        assert os.stat(os.path.join(t.root, f)).st_mtime_ns == mtime
    assert sorted(r["id"] for r in t.read().collect()) == want

    # no-gain call: already at/below target -> version unchanged, no-op
    v = t.versions()[-1]
    t.compact(cluster_by=["cid"], target_files=2, only_small_bytes=threshold)
    assert t.versions()[-1] == v
