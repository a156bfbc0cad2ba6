"""GenerationStore retirement safety (r10 VERDICT next-round #7 + ADVICE):
keep_latest=0 semantics, retention-by-age live-reader guard, and the
fail-closed contract for a reader that outlives retirement."""

import os

import pytest

from sf_epa_data_ingestion_spark.storage.txlog import TxTable
from sf_epa_data_ingestion_spark.streaming.generations import (
    GenerationStore,
    build_generation,
)


def _store_with_gens(spark, tmp_path, n):
    root = str(tmp_path / "store")
    store = GenerationStore(root)
    for g in range(1, n + 1):
        _gen_dir, table = build_generation(
            spark, root, g, {"gen": g}, "state", "id long"
        )
        table.append(spark.range(g).select(spark.range(1).columns[0]))
        store.publish(g, {})
    return store


def test_keep_latest_zero_keeps_only_the_latest(spark, tmp_path):
    store = _store_with_gens(spark, tmp_path, 3)
    # r10 ADVICE: 0 used to be a silently dead value (retired nothing)
    assert store.retire_below(keep_latest=0) == [1, 2]
    assert os.path.isdir(store.path(3))
    assert not os.path.isdir(store.path(1))
    assert not os.path.isdir(store.path(2))
    # records stay: history is never erased
    assert store.generations() == [1, 2, 3]
    with pytest.raises(ValueError, match=">= 0"):
        store.retire_below(keep_latest=-1)


def test_retention_by_age_protects_recent_cutovers(spark, tmp_path):
    store = _store_with_gens(spark, tmp_path, 3)
    # every successor record was just written: nothing is old enough
    assert store.retire_below(keep_latest=1, retention_seconds=3600) == []
    assert os.path.isdir(store.path(1))
    # age the records out (mtime rewind — the same trick txlog vacuum
    # retention tests use), then the same call retires
    for g in store.generations():
        rec = os.path.join(store.gens_dir, f"{g:05d}.json")
        os.utime(rec, (os.stat(rec).st_atime, os.stat(rec).st_mtime - 7200))
    assert store.retire_below(keep_latest=1, retention_seconds=3600) == [1, 2]


def test_reader_outliving_retirement_fails_closed(spark, tmp_path):
    store = _store_with_gens(spark, tmp_path, 2)
    old_state = TxTable(spark, os.path.join(store.path(1), "state"))
    assert old_state.read().count() == 1  # resolved pre-retirement

    store.retire_below(keep_latest=1)
    # the retired generation's reader gets a CLEAR error on its next
    # read — never partial rows
    with pytest.raises(FileNotFoundError, match="no txlog table"):
        TxTable(spark, os.path.join(store.path(1), "state")).read()
    with pytest.raises(FileNotFoundError, match="no txlog table"):
        old_state.read()
