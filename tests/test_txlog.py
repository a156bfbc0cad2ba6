"""txlog transactional table: ACID semantics + MERGE parity with mutate.

The contract under test (storage/txlog.py): same MERGE row semantics as
operators.mutate.merge_upsert (U1), plus the properties plain parquet
cannot give — atomic publish, snapshot isolation / time travel, optimistic
concurrency, and file-granular copy-on-write.
"""

import json
import os

import pytest
import pyspark.sql.functions as F

from sf_epa_data_ingestion_spark.operators.mutate import merge_upsert
from sf_epa_data_ingestion_spark.storage import ConcurrentCommitError, TxTable

SF001 = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def customers(spark):
    return spark.read.parquet(os.path.join(SF001, "customer.parquet"))


@pytest.fixture()
def table(spark, tmp_path, customers):
    return TxTable(spark, str(tmp_path / "tbl")).create(customers)


def test_create_read_roundtrip(table, customers):
    got = table.read()
    assert got.schema == customers.schema
    assert _rows(got) == _rows(customers)


def test_merge_matches_plain_merge_upsert(spark, table, customers):
    # source = 10 updated rows (perturbed balance) + 3 brand-new keys
    updates = (
        customers.orderBy("c_custkey").limit(10)
        .withColumn("c_acctbal", F.col("c_acctbal") + 1000)
    )
    inserts = (
        customers.orderBy(F.desc("c_custkey")).limit(3)
        .withColumn("c_custkey", F.col("c_custkey") + 1_000_000)
    )
    source = updates.unionByName(inserts)

    expected = merge_upsert(customers, source, ["c_custkey"])
    v = table.merge(source, ["c_custkey"])
    assert v == 1
    assert _rows(table.read()) == _rows(expected)
    # old snapshot untouched (time travel)
    assert _rows(table.read(version=0)) == _rows(customers)


def test_merge_is_file_granular(spark, tmp_path, customers):
    # 8 files; an upsert touching one key must rewrite exactly one of them
    t = TxTable(spark, str(tmp_path / "t8")).create(customers.repartition(8))
    before = set(t._snapshot()[1])
    one = customers.limit(1).withColumn("c_mktsegment", F.lit("REWRITTEN"))
    t.merge(one, ["c_custkey"])
    commit = t.commits()[-1]
    assert len(commit["remove"]) == 1
    assert set(commit["remove"]) <= before
    # table contents still correct
    assert t.read().filter(F.col("c_mktsegment") == "REWRITTEN").count() == 1
    assert t.read().count() == customers.count()


def test_crash_before_commit_is_invisible(spark, table, customers):
    # simulate a writer dying after staging data but before publishing:
    # stage files directly, never commit
    junk = customers.limit(5).withColumn("c_name", F.lit("GHOST"))
    table._stage(junk)
    got = table.read()
    assert got.filter(F.col("c_name") == "GHOST").count() == 0
    assert _rows(got) == _rows(customers)
    # vacuum clears the orphans (retention 0: no concurrent writers here)
    removed = table.vacuum(retention_seconds=0)
    assert removed  # the ghost files
    assert _rows(table.read()) == _rows(customers)


def test_concurrent_commit_conflict(table, customers):
    # a second writer publishing the same next version must fail loudly
    next_v = table.versions()[-1] + 1
    table._publish(next_v, {"add": [], "remove": []}, customers.schema.json())
    with pytest.raises(ConcurrentCommitError):
        table._publish(next_v, {"add": [], "remove": []}, customers.schema.json())


def test_append_overwrite_history_and_time_travel(spark, table, customers):
    n = customers.count()
    extra = customers.limit(7).withColumn("c_custkey", F.col("c_custkey") + 500_000)
    v1 = table.append(extra)
    assert table.read().count() == n + 7
    v2 = table.overwrite(customers.limit(2))
    assert (v1, v2) == (1, 2)
    assert table.read().count() == 2
    # every historical snapshot still reproducible
    assert table.read(version=0).count() == n
    assert table.read(version=1).count() == n + 7
    assert [c["version"] for c in table.commits()] == [0, 1, 2]


def test_vacuum_drops_old_generations_keeps_current(spark, table, customers):
    table.overwrite(customers.limit(3))
    removed = table.vacuum(keep_versions=1, retention_seconds=0)
    assert removed  # version-0 files physically gone
    assert table.read().count() == 3
    with pytest.raises(Exception):
        table.read(version=0).count()


def test_append_schema_evolution(spark, table, customers):
    n = customers.count()
    widened = customers.limit(4).withColumn("source", F.lit("round4"))
    # strict by default: mismatches are an error, not silent data loss
    with pytest.raises(ValueError):
        table.append(widened)
    table.append(widened, merge_schema=True)
    got = table.read()
    assert "source" in got.columns
    assert got.count() == n + 4
    # old rows read the evolved column as null; new rows carry the value
    assert got.filter(F.col("source") == "round4").count() == 4
    assert got.filter(F.col("source").isNull()).count() == n
    # narrower-than-table appends also evolve (absent column -> null)
    table.append(customers.limit(2).drop("c_mktsegment"), merge_schema=True)
    assert table.read().count() == n + 6


def test_change_feed_from_merge_and_append(spark, tmp_path, customers):
    t = TxTable(spark, str(tmp_path / "t")).create(
        customers.repartitionByRange(8, "c_custkey")
    )
    lo = customers.agg(F.min("c_custkey")).first()[0]
    upd = customers.filter(F.col("c_custkey") == lo).withColumn(
        "c_acctbal", F.lit(-1.0)
    )
    t.merge(upd, ["c_custkey"])  # v1: rewrites exactly one file
    cf = t.changes(0).cache()
    try:
        # deletes = the one touched file's old rows; inserts = its merged rows
        dels = cf.filter(F.col("_change_type") == "delete")
        ins = cf.filter(F.col("_change_type") == "insert")
        assert dels.count() == ins.count() > 0
        assert dels.count() < customers.count()  # file-granular, not full-table
        # the updated row appears as old image (delete) and new image (insert)
        assert dels.filter(F.col("c_custkey") == lo).first()["c_acctbal"] != -1.0
        assert ins.filter(F.col("c_custkey") == lo).first()["c_acctbal"] == -1.0
    finally:
        cf.unpersist()
    # append window: inserts only
    t.append(customers.limit(3).withColumn("c_custkey", F.col("c_custkey") + 900_000))
    cf2 = t.changes(1, 2)
    assert cf2.filter(F.col("_change_type") == "delete").count() == 0
    assert cf2.count() == 3


def test_commit_files_are_valid_json_log(table):
    log = table.commits()
    assert log[0]["version"] == 0
    assert log[0]["add"] and not log[0]["remove"]
    # schema is stored with every commit so snapshots are self-describing
    assert json.loads(log[0]["schema"])["type"] == "struct"


def test_check_constraints_enforced_on_writes(spark, tmp_path, customers):
    t = TxTable(spark, str(tmp_path / "t")).create(customers)
    t.set_constraint("key_nonneg", "c_custkey >= 0")
    assert t.constraints() == {"key_nonneg": "c_custkey >= 0"}
    bad = customers.limit(1).withColumn("c_custkey", F.lit(-5).cast("bigint"))
    # append, overwrite and merge all refuse invalid rows BEFORE commit
    with pytest.raises(ValueError, match="key_nonneg"):
        t.append(bad)
    with pytest.raises(ValueError, match="key_nonneg"):
        t.overwrite(bad)
    with pytest.raises(ValueError, match="key_nonneg"):
        t.merge(bad, ["c_custkey"])
    # the failed writes published nothing and left no visible rows
    assert t.read().filter(F.col("c_custkey") < 0).count() == 0
    # valid writes still flow
    t.append(customers.limit(1).withColumn("c_custkey", F.lit(999_999).cast("bigint")))
    assert t.read().count() == customers.count() + 1
    # cannot add a constraint existing data violates
    with pytest.raises(ValueError, match="existing rows"):
        t.set_constraint("impossible", "c_custkey > 999999999")
    t.drop_constraint("key_nonneg")
    assert t.constraints() == {}
    t.append(bad.withColumn("c_custkey", F.lit(-1).cast("bigint")))  # now allowed
    assert t.read().filter(F.col("c_custkey") < 0).count() == 1


def test_append_rejects_type_drift(spark, table, customers):
    drifted = customers.limit(1).withColumn(
        "c_acctbal", F.col("c_acctbal").cast("string")
    )
    with pytest.raises(ValueError, match="type drift"):
        table.append(drifted)
    with pytest.raises(ValueError, match="type drift"):
        table.append(drifted, merge_schema=True)  # evolution adds, never mutates


def test_vacuum_retention_protects_inflight_writers(spark, table, customers):
    # a concurrent writer mid-commit looks exactly like a crash orphan;
    # default retention must NOT delete its freshly staged files
    staged = table._stage(customers.limit(3))
    removed = table.vacuum()  # default retention window
    assert not removed
    for f in staged:
        assert os.path.exists(os.path.join(table.root, f))


def test_merge_and_overwrite_reject_type_drift(spark, table, customers):
    drifted = customers.limit(1).withColumn(
        "c_acctbal", F.col("c_acctbal").cast("string")
    )
    with pytest.raises(ValueError, match="type drift"):
        table.merge(drifted, ["c_custkey"])
    with pytest.raises(ValueError, match="type drift"):
        table.overwrite(drifted)
    # schema replacement is an explicit opt-in
    table.overwrite(drifted, overwrite_schema=True)
    assert dict(table.read().dtypes)["c_acctbal"] == "string"


def test_delete_where_is_file_granular_and_exact(spark, tmp_path, customers):
    t = TxTable(spark, str(tmp_path / "t")).create(
        customers.repartitionByRange(8, "c_custkey")
    )
    lo = customers.agg(F.min("c_custkey")).first()[0]
    v = t.delete_where(F.col("c_custkey") <= lo + 3)
    assert v == 1
    commit = t.commits()[-1]
    assert 1 <= len(commit["remove"]) < 8  # only files containing matches
    got = t.read()
    want = customers.filter(F.col("c_custkey") > lo + 3)
    assert got.count() == want.count()
    assert got.filter(F.col("c_custkey") <= lo + 3).count() == 0
    # no-match predicate is a version no-op (no empty commit)
    assert t.delete_where("c_custkey < -999") == v
    # SQL-string predicates work too
    t.delete_where(f"c_custkey = {lo + 4}")
    assert t.read().filter(F.col("c_custkey") == lo + 4).count() == 0


def test_update_where_rewrites_only_matching_rows(spark, tmp_path, customers):
    t = TxTable(spark, str(tmp_path / "t")).create(
        customers.repartitionByRange(8, "c_custkey")
    )
    lo = customers.agg(F.min("c_custkey")).first()[0]
    t.update_where(
        F.col("c_custkey") == lo,
        {"c_acctbal": "c_acctbal + 100.0", "c_mktsegment": F.lit("VIP")},
    )
    assert len(t.commits()[-1]["remove"]) == 1  # one touched file
    got = t.read()
    old = customers.filter(F.col("c_custkey") == lo).first()
    new = got.filter(F.col("c_custkey") == lo).first()
    assert new["c_mktsegment"] == "VIP"
    assert abs(new["c_acctbal"] - (old["c_acctbal"] + 100.0)) < 1e-6
    # all other rows byte-identical
    assert (
        got.filter(F.col("c_custkey") != lo)
        .exceptAll(customers.filter(F.col("c_custkey") != lo))
        .count()
        == 0
    )
    # constraints guard updates too
    t.set_constraint("bal_sane", "c_acctbal > -100000")
    with pytest.raises(ValueError, match="bal_sane"):
        t.update_where(F.col("c_custkey") == lo, {"c_acctbal": F.lit(-1e9)})


def test_restore_to_is_metadata_only_rollback(spark, tmp_path, customers):
    """RESTORE TO VERSION (r11): live files/stats/schema return to the
    target snapshot via one metadata commit; post-target files become
    unreferenced garbage; a vacuumed target fails loudly, untouched."""
    t = TxTable(spark, str(tmp_path / "t")).create(
        customers.repartitionByRange(4, "c_custkey")
    )
    v0_rows = _rows(t.read())
    extra = customers.limit(5).withColumn(
        "c_custkey", F.col("c_custkey") + 10_000_000
    )
    t.append(extra)
    lo = customers.agg(F.min("c_custkey")).first()[0]
    t.delete_where(F.col("c_custkey") == lo)
    assert _rows(t.read()) != v0_rows

    v = t.restore_to(0)
    assert v == t.versions()[-1]
    assert _rows(t.read()) == v0_rows
    # metadata-only: the restore commit stages no new data files
    assert t.commits()[-1]["add"] == [] or all(
        os.path.exists(os.path.join(t.root, f)) for f in t.commits()[-1]["add"]
    )
    # skipping stats survive the round-trip: a pruned probe still works
    probe = t.read(filters=[("c_custkey", "=", int(lo))])
    assert probe.filter(F.col("c_custkey") == lo).count() == 1

    # appending after a restore continues the log normally
    t.append(extra)
    assert t.read().count() == customers.count() + 5

    # a CHECK constraint added AFTER the target version still guards
    # the rollback: re-added files are validated, so a restore can
    # never resurrect rows the active constraint forbids
    t.delete_where(F.col("c_custkey") == lo)
    t.set_constraint("no_lo", f"c_custkey <> {lo}")
    v_before = t.versions()[-1]
    with pytest.raises(ValueError, match="no_lo"):
        t.restore_to(0)  # version 0 contains the forbidden key
    assert t.versions()[-1] == v_before  # log untouched on refusal
    t.drop_constraint("no_lo")

    # a restore whose target files were vacuumed fails closed
    t.overwrite(customers.limit(10))
    t.vacuum(keep_versions=1, retention_seconds=0)
    before = t.versions()[-1]
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        t.restore_to(0)
    assert t.versions()[-1] == before  # log untouched on failure


def test_nan_bounds_never_prune_matching_files(spark, tmp_path):
    """ADVICE r10: a double column containing NaN makes Spark's max()
    return NaN (sorts greatest); any(mn <= x <= NaN) is False for every
    probe, so an 'in'-probe would prune a file whose rows match. Bounds
    with NaN endpoints must be dropped at record time and ignored at
    probe time."""
    df = spark.createDataFrame(
        [(1, 2.5), (2, float("nan")), (3, 7.0)], "id long, x double"
    ).repartition(1)
    t = TxTable(spark, str(tmp_path / "t")).create(df)
    stats = t.commits()[-1].get("stats", {})
    for ent in stats.values():
        assert "x" not in ent, f"NaN-tainted bound recorded: {ent}"
    got = t.read(filters=[("x", "in", [2.5])]).filter(F.col("x") == 2.5)
    assert got.count() == 1
    # defense in depth: a legacy commit carrying a NaN bound is ignored
    from sf_epa_data_ingestion_spark.storage.txlog import _may_match

    assert _may_match({"x": [1.0, float("nan")]}, [("x", "in", [2.5])])
    assert _may_match({"x": [float("nan"), float("nan")]}, [("x", "=", 9.9)])


def test_replace_where_is_one_atomic_commit(spark, tmp_path, customers):
    """replace_where == delete_where + append row-for-row, but in ONE
    commit: removes and adds publish together, survivors of touched
    files ride the same staged write, and a predicate matching nothing
    still appends."""
    t1 = TxTable(spark, str(tmp_path / "a")).create(
        customers.repartitionByRange(4, "c_custkey")
    )
    t2 = TxTable(spark, str(tmp_path / "b")).create(
        customers.repartitionByRange(4, "c_custkey")
    )
    lo = customers.agg(F.min("c_custkey")).first()[0]
    cond = F.col("c_custkey") < lo + 50
    repl = customers.filter(cond).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1.0
    )

    v_before = t1.versions()[-1]
    t1.replace_where(cond, repl)
    assert t1.versions()[-1] == v_before + 1  # exactly one commit
    rec = t1.commits()[-1]
    assert rec["remove"] and rec["add"]  # removes+adds together
    t2.delete_where(cond)
    t2.append(repl)
    assert _rows(t1.read()) == _rows(t2.read())

    # nothing matches: still appends (delete half is a no-op)
    extra = customers.limit(3).withColumn(
        "c_custkey", F.col("c_custkey") + 77_000_000
    )
    t1.replace_where(F.col("c_custkey") == -1, extra)
    assert t1.read().filter(F.col("c_custkey") >= 77_000_000).count() == 3

    # constraints guard the union of survivors + replacement
    t1.set_constraint("bal_sane", "c_acctbal > -100000")
    with pytest.raises(ValueError, match="bal_sane"):
        t1.replace_where(cond, repl.withColumn("c_acctbal", F.lit(-1e9)))


def test_predicate_mutations_with_prune_filters_match_unpruned(spark, tmp_path, customers):
    """prune_filters pre-prunes the CoW discovery scan through the
    committed stats; over a range-clustered layout the pruned and
    unpruned forms must touch the same files and produce identical
    tables (the filters are implied by the predicate, so pruning can
    only skip provably-unmatching files)."""
    lo = customers.agg(F.min("c_custkey")).first()[0]
    ids = [int(lo), int(lo) + 1]
    t1 = TxTable(spark, str(tmp_path / "a")).create(
        customers.repartitionByRange(8, "c_custkey")
    )
    t2 = TxTable(spark, str(tmp_path / "b")).create(
        customers.repartitionByRange(8, "c_custkey")
    )
    t1.delete_where(F.col("c_custkey").isin(ids))
    t2.delete_where(
        F.col("c_custkey").isin(ids),
        prune_filters=[("c_custkey", "in", ids)],
    )
    assert _rows(t1.read()) == _rows(t2.read())
    assert len(t1.commits()[-1]["remove"]) == len(t2.commits()[-1]["remove"]) == 1

    repl = customers.filter(F.col("c_custkey").isin(ids)).withColumn(
        "c_acctbal", F.col("c_acctbal") + 9.0
    )
    t1.replace_where(F.col("c_custkey").isin(ids), repl)
    t2.replace_where(
        F.col("c_custkey").isin(ids), repl,
        prune_filters=[("c_custkey", "in", ids)],
    )
    assert _rows(t1.read()) == _rows(t2.read())


def test_history_and_time_travel(spark, tmp_path, customers):
    import time as _time

    t = TxTable(spark, str(tmp_path / "hist")).create(customers)
    n0 = customers.count()
    t_created = _time.time()

    extra = customers.limit(7).withColumn(
        "c_custkey", F.col("c_custkey") + 1_000_000)
    t.append(extra)
    t.delete_where(F.col("c_custkey") >= 1_000_000)
    t.compact(target_files=1)
    t.set_constraint("bal", "c_acctbal IS NOT NULL OR c_acctbal IS NULL")

    h = {r["version"]: r for r in t.describe_history().collect()}
    # the deprecated alias keeps working but warns (r11 ADVICE: the name
    # silently changed return type in r11 — now it's an explicit alias)
    with pytest.warns(DeprecationWarning):
        assert {r["version"] for r in t.history().collect()} == set(h)
    assert [h[v]["op"] for v in sorted(h)] == [
        "CREATE", "APPEND", "DELETE", "OPTIMIZE", "SET CONSTRAINT"]
    assert h[1]["rows_added"] == 7
    assert h[1]["files_added"] >= 1 and h[1]["files_removed"] == 0
    # DELETE's CoW: net row change = -7 (rewritten files minus the dupes)
    assert h[2]["rows_removed"] - h[2]["rows_added"] == 7
    assert h[3]["rows_added"] == h[3]["rows_removed"] == n0  # compaction moves, never changes
    assert h[4]["files_added"] == 0 and h[4]["rows_added"] == 0
    # timestamps are monotone and real
    ts = [h[v]["ts_ms"] for v in sorted(h)]
    assert ts == sorted(ts) and ts[0] > 1_500_000_000_000

    # time travel by timestamp: "now" resolves to the newest version,
    # the creation instant to an early one, pre-creation raises
    assert t.version_at_time(_time.time() + 1) == max(h)
    v_then = t.version_at_time(t_created)
    assert v_then in (0, 1)  # created just before t_created was taken
    assert t.read(version=v_then).count() in (n0, n0 + 7)
    with pytest.raises(ValueError):
        t.version_at_time(t_created - 3600)

    import datetime
    assert t.version_at_time(
        datetime.datetime.now() + datetime.timedelta(seconds=1)
    ) == max(h)


def test_commit_protocol_contract(spark, tmp_path, customers):
    """r11 VERDICT next-round #8 (stretch): the publish primitive is a
    ``CommitProtocol``. Contract pins: (1) a crash INSIDE publish —
    simulated by failing the link step, the non-atomic-rename analog —
    leaves NO visible commit, so readers stay on the old version and a
    retry succeeds (never a torn/half commit bricking the number);
    (2) racing writers serialize through ConcurrentCommitError; (3) the
    whole table protocol runs unchanged over a conditional-put backend
    (dict-arbitrated put-if-absent, the object-store shape)."""
    from sf_epa_data_ingestion_spark.storage.txlog import (
        ConcurrentCommitError,
        ConditionalPutCommit,
        PosixLinkCommit,
        TxTable,
    )

    # (1) crash inside publish: HALF the payload written to the temp
    # name, the link (the atomic visibility step) never happens — the
    # non-atomic-rename simulation: torn bytes exist on disk, but under
    # a name no reader treats as a commit
    class CrashingLink(PosixLinkCommit):
        def __init__(self):
            self.crashes_left = 1

        def publish(self, path, payload):
            if self.crashes_left:
                self.crashes_left -= 1
                with open(f"{path}.crashed.tmp", "w") as f:
                    f.write(payload[: len(payload) // 2])  # torn bytes
                raise OSError("simulated crash before the commit became visible")
            super().publish(path, payload)

    t = TxTable(spark, str(tmp_path / "crash"))
    t.create(customers.limit(10))
    t._commit_protocol = CrashingLink()  # crash the NEXT publish only
    v0 = t.versions()[-1]
    extra = customers.limit(3).withColumn(
        "c_custkey", F.col("c_custkey") + 1_000_000
    )
    with pytest.raises(OSError, match="simulated crash"):
        t.append(extra)
    # no torn commit VISIBLE: the torn temp is on disk, yet the log
    # still ends at v0, reads are intact, and the version number is not
    # bricked — the retry of the SAME number succeeds
    assert any(f.endswith(".crashed.tmp") for f in os.listdir(t.log_dir))
    assert t.versions()[-1] == v0
    assert t.read().count() == 10
    t.append(extra)
    assert t.read().count() == 13

    # (2) racing writers: the second publish of one version number loses
    t2 = TxTable(spark, str(tmp_path / "crash"))
    with pytest.raises(ConcurrentCommitError):
        t2._publish(t2.versions()[-1], {"add": [], "remove": []}, "{}")

    # (3) conditional-put backend: dict-arbitrated put-if-absent (the
    # S3 If-None-Match / GCS ifGenerationMatch=0 shape) carries the full
    # table protocol — create, append, CoW delete, snapshot read
    seen: dict[str, str] = {}

    def put_if_absent(path, payload):
        if path in seen or os.path.exists(path):
            raise FileExistsError(path)
        seen[path] = payload
        # the "store" here is the local fs; the PUT itself is atomic by
        # the object store's contract, so a plain temp+rename stands in
        tmp = path + ".put"
        with open(tmp, "w") as f:
            f.write(payload)
        os.rename(tmp, path)

    tc = TxTable(
        spark, str(tmp_path / "condput"),
        commit_protocol=ConditionalPutCommit(put_if_absent),
    )
    tc.create(customers.limit(10))
    tc.append(extra)
    tc.delete_where(F.col("c_custkey") >= 1_000_000)
    assert tc.read().count() == 10
    assert len(seen) == 3  # every commit went through the conditional put
    with pytest.raises(ConcurrentCommitError):
        tc._publish(1, {"add": [], "remove": []}, "{}")


def _condput_contention_worker(root: str, writer_id: int, n_commits: int,
                               results_path: str, barrier_path: str) -> None:
    """Subprocess body for the multi-process conditional-put race (module
    level so multiprocessing can spawn it). Each worker publishes through
    ``ConditionalPutCommit`` over a FILESYSTEM put-if-absent (os.link's
    EEXIST is the shared-FS stand-in for S3's If-None-Match 412) and, on
    losing a version number, retries cleanly at the next one — the
    optimistic-concurrency loop an object-store deployment runs."""
    import json
    import os
    import time

    from sf_epa_data_ingestion_spark.storage.txlog import ConditionalPutCommit

    def put_if_absent(path, payload):
        d, base = os.path.split(path)
        tmp = os.path.join(d, f".{base}.{os.getpid()}.cput.tmp")
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)  # atomic + exclusive on one FS namespace
        finally:
            os.unlink(tmp)

    # start barrier: maximize overlap so version numbers genuinely race
    while not os.path.exists(barrier_path):
        time.sleep(0.001)

    proto = ConditionalPutCommit(put_if_absent)
    pad = "x" * 200_000  # big enough that a torn write would be visible
    wins = []
    v = 0
    while len(wins) < n_commits:
        path = os.path.join(root, f"{v:012d}.json")
        payload = json.dumps(
            {"writer": writer_id, "seq": len(wins), "v": v, "pad": pad}
        )
        try:
            proto.publish(path, payload)
            wins.append(v)
        except FileExistsError:
            pass  # lost this version: re-read the tip (v+1) and retry
        v += 1
    with open(results_path, "w") as f:
        json.dump(wins, f)


def test_conditional_put_commit_multiprocess_contention(tmp_path):
    """r12 VERDICT next-round #7: the commit-protocol contract under REAL
    multi-process contention (the in-process dict arbitration of
    test_commit_protocol_contract can't see cross-process races). Four OS
    processes race ``put_if_absent`` on one shared directory while a
    concurrent scanner reads every visible commit; pins that (1) every
    version number has exactly ONE winner, (2) losers retry cleanly and
    all workers finish their quota, (3) the scanner never observes a torn
    payload (every visible file parses and carries the full pad), and
    (4) no tmp garbage survives the run."""
    import glob
    import multiprocessing as mp
    import threading

    root = tmp_path / "condput_race"
    root.mkdir()
    n_workers, n_commits = 4, 6
    barrier = str(tmp_path / "go")

    ctx = mp.get_context("fork")
    procs, result_paths = [], []
    for w in range(n_workers):
        rp = str(tmp_path / f"wins_{w}.json")
        result_paths.append(rp)
        p = ctx.Process(
            target=_condput_contention_worker,
            args=(str(root), w, n_commits, rp, barrier),
        )
        p.start()
        procs.append(p)

    # concurrent scanner: list-and-parse everything visible, repeatedly,
    # while the writers race — a torn or partially-visible commit fails
    # here, not just at the end
    torn: list[str] = []
    stop = threading.Event()

    def scan():
        while not stop.is_set():
            for f in glob.glob(str(root / "*.json")):
                try:
                    doc = json.loads(open(f).read())
                    if len(doc.get("pad", "")) != 200_000:
                        torn.append(f"short pad in {f}")
                except (OSError, ValueError) as exc:
                    torn.append(f"{f}: {exc}")

    scanner = threading.Thread(target=scan, daemon=True)
    scanner.start()
    open(barrier, "w").close()  # drop the start barrier

    for p in procs:
        p.join(120)
        assert p.exitcode == 0, f"worker exit {p.exitcode}"
    stop.set()
    scanner.join(30)

    assert not torn, torn[:5]

    wins_by_writer = [json.load(open(rp)) for rp in result_paths]
    assert all(len(w) == n_commits for w in wins_by_writer)
    all_wins = sorted(v for w in wins_by_writer for v in w)
    # exactly one winner per version: no double-award across processes
    assert len(all_wins) == len(set(all_wins)) == n_workers * n_commits
    # the files on disk are exactly the winners' versions, each naming
    # the writer that claims it
    files = sorted(glob.glob(str(root / "*.json")))
    assert len(files) == n_workers * n_commits
    for f in files:
        doc = json.loads(open(f).read())
        v = int(os.path.basename(f)[: -len(".json")])
        assert doc["v"] == v
        assert v in wins_by_writer[doc["writer"]]
    # no tmp orphans: every publish cleaned up, winner or loser
    assert not glob.glob(str(root / ".*tmp"))


def test_vacuum_sweeps_stale_publish_tmp_orphans(spark, tmp_path, customers):
    """r12 ADVICE: a writer that crashes between the commit-tmp write and
    the finally-unlink leaves a dot-prefixed tmp in the log dir —
    invisible to versions() (dotfiles skipped), but garbage forever
    before the sweep. vacuum must reclaim ones older than the retention
    window and keep fresh ones (a possibly-in-flight publisher)."""
    t = TxTable(spark, str(tmp_path / "sweep"))
    t.create(customers.limit(5))

    stale = os.path.join(t.log_dir, ".000000000042.json.999.dead.tmp")
    fresh = os.path.join(t.log_dir, ".000000000043.json.998.live.tmp")
    for p in (stale, fresh):
        with open(p, "w") as f:
            f.write("{}")
    old = __import__("time").time() - 7200
    os.utime(stale, (old, old))

    v0 = t.versions()
    removed = t.vacuum(keep_versions=1, retention_seconds=3600)
    assert any(f.endswith(".dead.tmp") for f in removed)
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)  # inside the retention window
    assert t.versions() == v0  # the log itself untouched
    assert t.read().count() == 5


def test_latest_map_sees_maps_in_create_commit_after_empty_probe(
        spark, tmp_path, customers):
    """r13 ADVICE: probing _latest_map on an EMPTY log must not cache an
    entry whose tip collides with a real v0 — an empty-log probe followed
    by a CREATE commit carrying a constraints map has to surface that map
    (tip sentinel -1, not 0)."""
    t = TxTable(spark, str(tmp_path / "v0maps"))
    assert t.constraints() == {}  # empty-log probe warms the cache

    # a CREATE commit that carries the map directly (the scenario the
    # -1 cursor exists for)
    os.makedirs(t.root, exist_ok=True)
    t._publish(
        0,
        {"add": [], "remove": [], "stats": {},
         "constraints": {"pk": "c_custkey IS NOT NULL"}},
        customers.schema.json(), op="CREATE",
    )
    assert t.constraints() == {"pk": "c_custkey IS NOT NULL"}
