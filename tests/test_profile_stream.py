"""Streaming data-quality profiling (streaming/profilemon.py): mergeable
per-batch sketches whose union equals the corpus profile, exactly-once
state, and null-rate drift alerts — through a REAL Structured Streaming
query with restart.

Pinned contract:
- rows/nulls/min/max/mean/variance from ``current_profile`` are EXACT
  equal to a one-shot batch derivation over the concatenated corpus;
- the unioned HLL estimate lands within the sketch's published error
  of the exact distinct count;
- replays are no-ops for both the state and the alerts table;
- a planted null-spike batch fires exactly its alert; stable batches
  fire none; and the alert decision is made against PRE-batch history
  (decisions-before-state ordering).
"""

import math

import pytest
import pyspark.sql.functions as F

from sf_epa_data_ingestion_spark.storage import TxTable
from sf_epa_data_ingestion_spark.streaming.profilemon import (
    ALERT_SCHEMA,
    STATE_SCHEMA,
    batch_profile_rows,
    current_profile,
    profile_appender,
)

SF001 = "/root/testdata/sf0.001"
NUMERIC = ("doc_id", "n_chars")


def _exact_profile(df):
    """One-shot batch oracle over the whole corpus."""
    out = {}
    n = df.count()
    for c in df.columns:
        row = df.agg(
            F.count(c).alias("nn"),
            F.count_distinct(F.col(c).cast("string")).alias("nd"),
        ).collect()[0]
        ent = {"rows": n, "nulls": n - row["nn"], "distinct": row["nd"]}
        if c in NUMERIC:
            m = df.agg(
                F.min(F.col(c).cast("double")).alias("mn"),
                F.max(F.col(c).cast("double")).alias("mx"),
                F.avg(F.col(c).cast("double")).alias("mean"),
                F.var_pop(F.col(c).cast("double")).alias("var"),
            ).collect()[0]
            ent.update(mn=m["mn"], mx=m["mx"], mean=m["mean"], var=m["var"])
        out[c] = ent
    return out


def test_stream_profile_merges_exactly_and_alerts_on_drift(spark, tmp_path):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    state = TxTable(spark, str(tmp_path / "state")).create_empty(STATE_SCHEMA)
    alerts = TxTable(spark, str(tmp_path / "alerts")).create_empty(ALERT_SCHEMA)
    sink = profile_appender(
        state, "profile-mon", alerts=alerts,
        null_jump=0.10, min_history_rows=100,
    )

    def run_once():
        q = (
            spark.readStream.schema(docs.schema).parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # wave 1: the corpus itself (establishes history; no alerts possible)
    docs.write.mode("overwrite").parquet(src)
    run_once()
    assert alerts.read().count() == 0

    # wave 2: same null profile under new ids — stable, must NOT alert
    wave2 = docs.withColumn("doc_id", F.col("doc_id") + 100_000)
    wave2.write.mode("append").parquet(src)
    run_once()
    assert alerts.read().count() == 0

    # wave 3: broken extractor — half the texts arrive NULL
    wave3 = (
        docs.withColumn("doc_id", F.col("doc_id") + 200_000)
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 2 == 0, F.col("text")),
        )
    )
    wave3.write.mode("append").parquet(src)
    run_once()
    fired = alerts.read().collect()
    assert [(r["col"], r["kind"]) for r in fired] == [("text", "null_rate")]
    assert fired[0]["observed"] == pytest.approx(0.5, abs=0.05)
    assert fired[0]["expected"] == pytest.approx(0.0, abs=0.01)

    # ---- merged profile == one-shot batch derivation over all waves ----
    corpus = docs.unionByName(wave2).unionByName(wave3)
    exact = _exact_profile(corpus)
    got = {r["col"]: r for r in current_profile(state).collect()}
    assert set(got) == set(corpus.columns)
    for c, e in exact.items():
        g = got[c]
        assert g["rows"] == e["rows"], c
        assert g["nulls"] == e["nulls"], c
        # HLL at lg_k=12: rsd ~1.6%; allow 3 sigma
        assert abs(g["distinct_est"] - e["distinct"]) <= max(
            3, 0.05 * e["distinct"]
        ), c
        if c in NUMERIC:
            assert g["mn"] == e["mn"] and g["mx"] == e["mx"], c
            assert g["mean"] == pytest.approx(e["mean"], rel=1e-9), c
            assert g["variance"] == pytest.approx(e["var"], rel=1e-6), c
        else:
            assert g["mn"] is None and g["mean"] is None, c

    # state is metadata-scale: columns x batches rows
    n_batches = state.read().select("batch_id").distinct().count()
    assert state.read().count() == n_batches * len(corpus.columns)

    # ---- replays are no-ops for BOTH tables ----
    ns, na = state.read().count(), alerts.read().count()
    sink(wave3, 0)  # old batch id replayed straight into the sink
    assert state.read().count() == ns
    assert alerts.read().count() == na


def test_batch_profile_rows_handles_all_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id long, s string"
    )
    rows = batch_profile_rows(df, 0)
    by_col = {r[1]: r for r in rows}
    assert by_col["s"][2] == 2 and by_col["s"][3] == 2  # n, nulls
    assert by_col["id"][3] == 0
    # numeric moments present for id, absent for s
    assert by_col["id"][5] == 1.0 and by_col["id"][6] == 2.0
    assert by_col["s"][5] is None
    # empty batch: zero rows per column, no crash
    empty = spark.createDataFrame([], "id long, s string")
    rows0 = batch_profile_rows(empty, 1)
    assert all(r[2] == 0 for r in rows0)
