"""Bloom-filter data skipping (storage/txlog.set_bloom — Delta's
delta.bloomFilter analog).

The contract: per-file m-bit/k-hash bitmaps of a string/long column ride
the commit stats; ``read(filters=[(col,'=',v)])`` / ``('in', vals)``
prunes files whose bitmap proves absence. Bounds prune RANGES of
write-ordered columns; blooms prune POINT probes on columns with no
write-order correlation (hash-distributed ids), where every file's
[min, max] spans the probe. Soundness invariants pinned here:

- the driver-side probe hash mirrors the Spark indexing expression
  bit-for-bit (pmod(xxhash64(col, CAST(i AS LONG)), m));
- a present value's file is NEVER pruned (no false negatives, by
  construction + property sweep);
- absent/old/odd stats entries keep their files;
- every write path regenerates bitmaps (append, merge, compact,
  delete_where);
- merge(prune_source_keys=...) returns the same table as an unpruned
  merge while rewriting no more files.
"""

import base64
import os

import pytest
import pyspark.sql.functions as F

from sf_epa_data_ingestion_spark.functions.refhash import (
    xxh64_long,
    xxh64_string,
)
from sf_epa_data_ingestion_spark.operators.mutate import merge_upsert
from sf_epa_data_ingestion_spark.storage import TxTable
from sf_epa_data_ingestion_spark.storage.txlog import (
    _bloom_may_contain,
    _bloom_positions_py,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk_unsorted(spark, tmp_path, n=400, files=8, name="tbl"):
    """A table whose ids are hash-scattered across ``files`` commits:
    every file's [min, max] id range spans ~the whole domain, so bounds
    can never prune an id probe — the layout blooms exist for."""
    t = TxTable(spark, str(tmp_path / name)).create_empty(
        "id long, tag string, val double"
    )
    t.set_bloom("id", m=1024, k=5, backfill=False)
    t.set_bloom("tag", m=1024, k=5, backfill=False)
    per = n // files
    for f in range(files):
        # stride-scattered ids: file f holds {f, f+files, f+2*files, ...}
        ids = [f + i * files for i in range(per)]
        df = spark.createDataFrame(
            [(i, f"tag{i}", float(i)) for i in ids],
            "id long, tag string, val double",
        ).repartition(1)
        t.append(df)
    return t, per, files


# -- hash-mirror parity -------------------------------------------------------


def test_probe_positions_mirror_spark_expression(spark):
    m, k = 1024, 5
    longs = [0, 1, -1, 42, 7_777_777, -(1 << 62), (1 << 62) + 17]
    strs = ["", "a", "hello world", "ünïcodé ✓", "x" * 100]
    pos = lambda c: F.array(*[
        F.pmod(F.xxhash64(F.col(c), F.lit(int(i)).cast("long")), F.lit(m))
        for i in range(k)
    ])
    got = {
        r["v"]: list(r["p"])
        for r in spark.createDataFrame([(v,) for v in longs], "v long")
        .select("v", pos("v").alias("p")).collect()
    }
    for v in longs:
        assert list(_bloom_positions_py(v, "long", m, k)) == got[v], v
    got_s = {
        r["v"]: list(r["p"])
        for r in spark.createDataFrame([(s,) for s in strs], "v string")
        .select("v", pos("v").alias("p")).collect()
    }
    for s in strs:
        assert list(_bloom_positions_py(s, "string", m, k)) == got_s[s], s
    # the base hashes themselves (belt and braces for the mirror)
    assert _bloom_positions_py(5, "long", m, 1)[0] == \
        xxh64_long(0, seed=xxh64_long(5)) % m
    assert _bloom_positions_py("q", "string", m, 1)[0] == \
        xxh64_long(0, seed=xxh64_string("q")) % m


# -- pruning + soundness ------------------------------------------------------


def test_point_probe_prunes_to_owning_file(spark, tmp_path):
    t, per, files = _mk_unsorted(spark, tmp_path)
    all_files = t.read_files()
    assert len(all_files) == files
    # bounds alone cannot prune this layout: strip blooms to prove it
    probe = [("id", "=", 13)]
    kept = t.read_files(filters=probe)
    assert len(kept) < files, "bloom pruned nothing"
    # no false negative: the row is found, and results == unpruned filter
    got = t.read(filters=probe)
    assert _rows(got) == _rows(t.read().filter(F.col("id") == 13))
    assert got.count() == 1


def test_bounds_alone_cannot_prune_this_layout(spark, tmp_path):
    # same table WITHOUT blooms: every file survives an id point probe
    t = TxTable(spark, str(tmp_path / "nb")).create_empty(
        "id long, tag string, val double"
    )
    per, files = 50, 8
    for f in range(files):
        ids = [f + i * files for i in range(per)]
        t.append(spark.createDataFrame(
            [(i, f"tag{i}", float(i)) for i in ids],
            "id long, tag string, val double",
        ).repartition(1))
    assert len(t.read_files(filters=[("id", "=", 13)])) == files


def test_absent_value_prunes_everything(spark, tmp_path):
    t, per, files = _mk_unsorted(spark, tmp_path)
    # id outside the domain: bounds prune it. Pick one INSIDE the domain
    # hash-likely absent: ids are 0..399; 250+ exist… use a string probe
    # on tag, absent value within lexical range ("tag150x" sorts inside).
    kept = t.read_files(filters=[("tag", "=", "tag150x")])
    assert len(kept) <= 2  # fpp may keep a stray file, never most
    assert t.read(filters=[("tag", "=", "tag150x")]).count() == 0


def test_in_probe_keeps_union_of_owning_files(spark, tmp_path):
    t, per, files = _mk_unsorted(spark, tmp_path)
    probe = [("id", "in", [3, 12])]  # files 3 and 4 own these
    kept = t.read_files(filters=probe)
    assert 1 <= len(kept) < files
    got = t.read(filters=probe)
    assert got.count() == 2
    assert _rows(got) == _rows(t.read().filter(F.col("id").isin([3, 12])))


def test_no_false_negatives_property_sweep(spark, tmp_path):
    t, per, files = _mk_unsorted(spark, tmp_path, n=160, files=4)
    for v in range(0, 160, 7):  # every 7th present id
        assert t.read(filters=[("id", "=", v)]).count() == 1, v
    for s in ("tag0", "tag93", "tag159"):
        assert t.read(filters=[("tag", "=", s)]).count() == 1, s


def test_null_and_mistyped_probes_keep_files(spark, tmp_path):
    t, per, files = _mk_unsorted(spark, tmp_path, n=80, files=4)
    # None in an in-probe: not prunable, must not raise
    assert t.read(filters=[("id", "in", [None, 9])]).count() == 1
    # mistyped probe (str against long col): bloom/bounds must not prune
    # on a wrong-type hash — all files kept, and the result equals the
    # unpruned filter (Spark's own string/long comparison semantics)
    kept = t.read_files(filters=[("id", "=", "9")])
    assert len(kept) == 4
    assert _rows(t.read(filters=[("id", "=", "9")])) == \
        _rows(t.read().filter(F.col("id") == "9"))


def test_old_files_without_blooms_are_kept(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "old")).create(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string")
    )
    t.set_bloom("id", m=256, k=3, backfill=False)
    t.append(spark.createDataFrame([(3, "c")], "id long, tag string"))
    # probe for a value only in the PRE-bloom file: that file has no
    # bitmap -> kept -> row found
    assert t.read(filters=[("id", "=", 1)]).count() == 1


def test_backfill_indexes_existing_files(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "bf")).create_empty("id long, tag string")
    for f in range(4):
        t.append(spark.createDataFrame(
            [(f + i * 4, f"t{f + i * 4}") for i in range(20)],
            "id long, tag string").repartition(1))
    assert len(t.read_files(filters=[("id", "=", 5)])) == 4
    t.set_bloom("id", m=1024, k=5)  # backfill=True default
    kept = t.read_files(filters=[("id", "=", 5)])
    assert len(kept) < 4
    assert t.read(filters=[("id", "=", 5)]).count() == 1
    # old bounds survived the stats republish (regression: wholesale
    # per-file stats replace must carry the previous entry forward)
    assert t.row_count() == 80


def test_all_null_file_prunes_every_probe(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "nl")).create_empty("id long, tag string")
    t.set_bloom("tag", m=256, k=3, backfill=False)
    t.append(spark.createDataFrame([(1, None), (2, None)], "id long, tag string"))
    t.append(spark.createDataFrame([(3, "x")], "id long, tag string"))
    kept = t.read_files(filters=[("tag", "=", "x")])
    assert len(kept) == 1  # the all-null file's zero bitmap pruned it
    assert t.read(filters=[("tag", "=", "x")]).count() == 1


def test_every_write_path_regenerates_bitmaps(spark, tmp_path):
    t, per, files = _mk_unsorted(spark, tmp_path, n=80, files=4)
    # merge rewrites touched files; compact rewrites everything
    src = spark.createDataFrame(
        [(9, "tag9", 999.0), (1000, "tag1000", 1.0)],
        "id long, tag string, val double")
    t.merge(src, ["id"])
    t.compact(target_files=2)
    t.delete_where(F.col("id") == 1000)
    stats = t._snapshot_full()[3]
    for f in t.read_files():
        ent = stats.get(f) or {}
        assert "__bloom" in ent, f
        assert set(ent["__bloom"]) == {"id", "tag"}
    # and the bitmaps still answer correctly after all three rewrites
    assert t.read(filters=[("id", "=", 9)]).count() == 1
    assert _rows(t.read(filters=[("id", "=", 9)]).select("val")) == [(999.0,)]
    assert t.read(filters=[("id", "=", 1000)]).count() == 0


def test_merge_prune_source_keys_equivalent_and_tighter(spark, tmp_path):
    t1, per, files = _mk_unsorted(spark, tmp_path, n=160, files=8, name="m1")
    t2, _, _ = _mk_unsorted(spark, tmp_path, n=160, files=8, name="m2")
    src = spark.createDataFrame(
        [(5, "tag5", -5.0), (900, "tagnew", 9.0)],
        "id long, tag string, val double")
    v_pre = t1.versions()[-1]
    files_before = set(t2.read_files())
    t1.merge(src, ["id"])                            # unpruned
    t2.merge(src, ["id"], prune_source_keys=100)     # pruned
    assert _rows(t1.read()) == _rows(t2.read())
    expected = merge_upsert(t1.read(version=v_pre), src, ["id"])
    assert _rows(t2.read()) == _rows(expected)
    # pruning rewrote at most as many files as discovery did (and with
    # this scattered layout, strictly fewer than the file count)
    c2 = t2._read_commit(t2.versions()[-1])
    assert 1 <= len(c2["remove"]) < files
    # untouched files survive byte-identical (same names still live)
    assert set(c2["remove"]) <= files_before


def test_merge_prune_overflow_disables_pruning(spark, tmp_path):
    t, per, files = _mk_unsorted(spark, tmp_path, n=80, files=4)
    src = spark.createDataFrame(
        [(i, f"tag{i}", 0.0) for i in range(30)],
        "id long, tag string, val double")
    # cap below the key count: pruning silently disabled, result exact
    t.merge(src, ["id"], prune_source_keys=10)
    got = t.read().filter(F.col("id") < 30)
    assert got.count() == 30
    assert got.filter(F.col("val") != 0.0).count() == 0


def test_drop_bloom_stops_future_indexing(spark, tmp_path):
    t, per, files = _mk_unsorted(spark, tmp_path, n=80, files=4)
    t.drop_bloom("id")
    t.append(spark.createDataFrame(
        [(5000, "t5000", 0.0)], "id long, tag string, val double"))
    stats = t._snapshot_full()[3]
    newest = t._read_commit(t.versions()[-1])["add"][0]
    assert "id" not in (stats[newest].get("__bloom") or {})
    assert "tag" in (stats[newest].get("__bloom") or {})  # still configured
    # old bitmaps remain sound evidence: present value still found
    assert t.read(filters=[("id", "=", 9)]).count() == 1


def test_set_bloom_rejects_bad_config(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "cfg")).create(
        spark.createDataFrame([(1, 2.0)], "id long, val double"))
    with pytest.raises(ValueError):
        t.set_bloom("nope")
    with pytest.raises(ValueError):
        t.set_bloom("val")  # double: not a mirrored type
    with pytest.raises(ValueError):
        t.set_bloom("id", m=100)  # not a multiple of 64


def test_malformed_entry_keeps_file():
    ok = {"m": 256, "k": 3, "t": "long",
          "b": base64.b64encode(bytes(32)).decode()}
    assert not _bloom_may_contain(ok, [7])          # zero bitmap: prunable
    assert _bloom_may_contain({"m": 256}, [7])      # missing fields: keep
    assert _bloom_may_contain({**ok, "b": "!!!"}, [7])   # bad base64: keep
    assert _bloom_may_contain({**ok, "b": "AAAA"}, [7])  # truncated: keep
    assert _bloom_may_contain(ok, [None])           # NULL probe: keep
    assert _bloom_may_contain(ok, ["seven"])        # mistyped: keep
    assert _bloom_may_contain(ok, [1 << 70])        # out of range: keep
    assert _bloom_may_contain({**ok, "m": 0}, [7])   # m=0: keep, no crash
    assert _bloom_may_contain({**ok, "m": -256}, [7])  # m<0: keep
    assert _bloom_may_contain({**ok, "k": 0}, [7])   # k=0: keep
    assert _bloom_may_contain(ok, [[1, 2]])          # unhashable: keep


def test_graded_bloom_layout_actually_prunes(spark):
    """The graded row (bloom_point_lookup in __spark_entry__) must not
    silently degrade into an unpruned scan: on its own materialized
    layout, the probe keeps strictly fewer files than live, and the
    absent digest alone keeps (almost) none."""
    import __spark_entry__ as e
    from sf_epa_data_ingestion_spark.storage import TxTable

    sf_dir = "/root/testdata/sf0.001"
    root = e._bloom_docs_dir(spark, sf_dir)
    t = TxTable(spark, os.path.join(root, "tbl"))
    live = t.read_files()
    assert len(live) == 8
    digests = [
        r["digest"]
        for r in e._t(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(e.BLOOM_PROBE_IDS))
        .select(F.md5(F.col("text")).alias("digest")).collect()
    ]
    kept = t.read_files(filters=[("digest", "in", digests)])
    assert 1 <= len(kept) < len(live)
    kept_absent = t.read_files(
        filters=[("digest", "in", [e.BLOOM_ABSENT_DIGEST])]
    )
    assert len(kept_absent) <= 1


def test_binary_column_bloom_roundtrip(spark, tmp_path):
    """Binary digests (the raw-bytes form of the md5/sha state tables)
    bloom-index and probe like strings: Spark hashes BinaryType as the
    byte block, mirrored by refhash.xxh64_bytes."""
    import hashlib

    t = TxTable(spark, str(tmp_path / "bin")).create_empty(
        "id long, digest binary"
    )
    t.set_bloom("digest", m=1024, k=5, backfill=False)
    files = 4
    digs = {i: hashlib.md5(str(i).encode()).digest() for i in range(80)}
    for f in range(files):
        t.append(spark.createDataFrame(
            [(i, digs[i]) for i in range(80) if i % files == f],
            "id long, digest binary").repartition(1))
    probe = digs[9]
    kept = t.read_files(filters=[("digest", "=", probe)])
    assert 1 <= len(kept) < files
    got = t.read(filters=[("digest", "=", probe)]).collect()
    assert [r["id"] for r in got] == [9]
    # bytearray probes normalize instead of exploding per byte
    got2 = t.read(filters=[("digest", "in", [bytearray(probe)])]).collect()
    assert [r["id"] for r in got2] == [9]
    # absent digest prunes everything
    absent = hashlib.md5(b"absent").digest()
    assert len(t.read_files(filters=[("digest", "=", absent)])) <= 1
    assert t.read(filters=[("digest", "=", absent)]).count() == 0
