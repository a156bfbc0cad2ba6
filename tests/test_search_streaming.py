"""Tests for the hybrid search index and the streaming freshness job."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sf_epa_data_ingestion_spark.operators import search
from sf_epa_data_ingestion_spark.streaming import events as ev
from sf_epa_data_ingestion_spark.streaming.freshness import start_freshness_job, stream_postings

DOCS = [
    (1, "spark engine shuffles data across executors", "DANGER"),
    (2, "the pesticide label warns about toxicity", "CAUTION"),
    (3, "spark spark spark tuning guide", "CAUTION"),
]


def _index(spark):
    docs = spark.createDataFrame(DOCS, ["id", "chunk", "signal_word"])
    postings = search.build_postings(docs)
    stats = search.build_token_stats(postings, n_docs=3)
    return docs, postings, stats


def test_lexical_search_ranks_by_tfidf(spark):
    _, postings, stats = _index(spark)
    out = search.lexical_search(postings, stats, "spark", k=2).collect()
    ids = [r["id"] for r in sorted(out, key=lambda r: -r["score"])]
    assert ids[0] == 3  # tf=3 beats tf=1
    assert set(ids) == {1, 3}


def test_hybrid_search_attribute_filter(spark):
    docs, postings, stats = _index(spark)
    out = search.hybrid_search(
        docs, postings, stats, "spark", attr_filters={"signal_word": "CAUTION"}
    ).collect()
    assert [r["id"] for r in out] == [3]  # doc 1 filtered out by attribute


def test_session_windows_batch_gap_semantics(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 10, t0),
        (2, 10, t0 + dt.timedelta(minutes=10)),   # same session
        (3, 10, t0 + dt.timedelta(minutes=50)),   # gap 40 > 30 -> new session
        (4, 11, t0),                               # other user
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = ev.session_windows_batch(df, gap_minutes=30).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[10]) == 2
    assert sorted(r["n_events"] for r in by_user[10]) == [1, 2]
    assert len(by_user[11]) == 1


def test_freshness_job_available_now(spark, tmp_path):
    chunks_path = os.path.join(str(tmp_path), "chunks")
    out_path = os.path.join(str(tmp_path), "postings")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    schema = StructType(
        [StructField("CHUNK_ID", LongType()), StructField("CHUNK", StringType())]
    )
    spark.createDataFrame([(1, "alpha beta"), (2, "beta gamma")], schema).write.mode(
        "overwrite"
    ).parquet(chunks_path)

    delta = stream_postings(spark, chunks_path, schema)
    q = start_freshness_job(delta, out_path, ckpt, available_now=True)
    q.awaitTermination(120)
    postings = spark.read.parquet(out_path)
    got = {(r["token"], r["id"]): r["tf"] for r in postings.collect()}
    assert got[("beta", 1)] == 1 and got[("beta", 2)] == 1
    assert ("alpha", 1) in got and ("gamma", 2) in got

    # incremental: append a new chunk file, catch up again, index extends
    spark.createDataFrame([(3, "delta alpha")], schema).write.mode("append").parquet(chunks_path)
    q2 = start_freshness_job(stream_postings(spark, chunks_path, schema), out_path, ckpt, available_now=True)
    q2.awaitTermination(120)
    got2 = {(r["token"], r["id"]) for r in spark.read.parquet(out_path).collect()}
    assert ("delta", 3) in got2 and ("alpha", 3) in got2


def test_stateful_running_user_stats(spark, tmp_path):
    """applyInPandasWithState: state must persist across micro-batches
    (two availableNow runs over a growing directory, same checkpoint)."""
    import datetime as dt
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )
    from sf_epa_data_ingestion_spark.streaming.stateful import running_user_stats

    src = os.path.join(str(tmp_path), "events")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    out = os.path.join(str(tmp_path), "out")
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            running_user_stats(stream)
            .writeStream.outputMode("update")
            .foreachBatch(lambda b, e: b.write.mode("append").parquet(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(10, t0, 1.0), (10, t0 + dt.timedelta(minutes=1), 2.0), (11, t0, 5.0)], schema
    ).write.mode("overwrite").parquet(src)
    run_once()

    spark.createDataFrame([(10, t0 + dt.timedelta(minutes=2), 4.0)], schema).write.mode(
        "append"
    ).parquet(src)
    run_once()

    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:
        if r["user_id"] not in latest or r["n_events"] > latest[r["user_id"]]["n_events"]:
            latest[r["user_id"]] = r
    # user 10: 2 events in batch 1, +1 in batch 2 -> state carried
    assert latest[10]["n_events"] == 3
    assert latest[10]["total_value"] == 7.0
    assert latest[11]["n_events"] == 1


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: one representative per content
    digest (arbitrary within a micro-batch, sticky across batches);
    duplicates inside the horizon are dropped across micro-batches;
    a duplicate far beyond the horizon is re-emitted (state was evicted)
    — the bounded-state trade documented in streaming/dedup.py."""
    import datetime as dt
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )
    from sf_epa_data_ingestion_spark.streaming.dedup import dedup_stream

    src = os.path.join(str(tmp_path), "docs")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    out = os.path.join(str(tmp_path), "out")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("text", StringType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            dedup_stream(stream, "ts", watermark="10 minutes")
            .writeStream.outputMode("append")
            .foreachBatch(lambda b, e: b.write.mode("append").parquet(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: A, B, and an in-batch duplicate of A (whitespace/case
    # variant — the digest normalizes) -> A kept once, B kept
    spark.createDataFrame(
        [
            (1, t0, "alpha doc"),
            (2, t0 + dt.timedelta(minutes=1), "beta doc"),
            (3, t0 + dt.timedelta(minutes=2), "  Alpha   DOC "),
        ],
        schema,
    ).write.mode("overwrite").parquet(src)
    run_once()

    # batch 2: near-time duplicate of A (state alive) dropped; C kept
    spark.createDataFrame(
        [
            (4, t0 + dt.timedelta(minutes=3), "alpha doc"),
            (5, t0 + dt.timedelta(minutes=4), "gamma doc"),
        ],
        schema,
    ).write.mode("append").parquet(src)
    run_once()

    kept = spark.read.parquet(out).collect()
    # one alpha variant (id 1 or 3), beta, gamma; the cross-batch dup
    # (id 4) is dropped
    assert sorted(r["doc_id"] for r in kept) in ([1, 2, 5], [2, 3, 5])
    assert len({r["text_hash"] for r in kept}) == 3

    # batch 3: duplicate of A one hour later — the watermark only
    # advances at batch END (it reflects event times seen in PRIOR
    # batches), so alpha's state is still live here and id 6 is dropped;
    # processing this batch then moves the watermark past alpha's expiry
    spark.createDataFrame([(6, t0 + dt.timedelta(hours=1), "alpha doc")], schema).write.mode(
        "append"
    ).parquet(src)
    run_once()
    assert 6 not in {r["doc_id"] for r in spark.read.parquet(out).collect()}

    # batch 4: with the watermark now beyond the original key's horizon
    # the state was evicted, so a fresh alpha duplicate is re-emitted —
    # the bounded-state trade in action
    spark.createDataFrame([(7, t0 + dt.timedelta(hours=2), "alpha doc")], schema).write.mode(
        "append"
    ).parquet(src)
    run_once()
    assert 7 in {r["doc_id"] for r in spark.read.parquet(out).collect()}


def test_stream_stream_attribution_join(spark, tmp_path):
    """Watermarked stream-stream interval join: purchases attribute to
    preceding clicks within the delay window, across micro-batches."""
    import datetime as dt
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )
    from sf_epa_data_ingestion_spark.streaming.joins import attribute_purchases

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    clicks_p = os.path.join(str(tmp_path), "clicks")
    purch_p = os.path.join(str(tmp_path), "purchases")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    out = os.path.join(str(tmp_path), "out")
    t0 = dt.datetime(2024, 1, 1)

    def run_once():
        c = spark.readStream.schema(schema).parquet(clicks_p)
        p = spark.readStream.schema(schema).parquet(purch_p)
        q = (
            attribute_purchases(c, p, max_delay="30 minutes", watermark="10 minutes")
            .writeStream.outputMode("append")
            .foreachBatch(lambda b, e: b.write.mode("append").parquet(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: user 1 clicks twice; user 2 clicks once
    spark.createDataFrame(
        [
            (1, t0, 1, "click", 0.0),
            (2, t0 + dt.timedelta(minutes=5), 1, "click", 0.0),
            (3, t0, 2, "click", 0.0),
        ],
        schema,
    ).write.mode("overwrite").parquet(clicks_p)
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(purch_p)
    run_once()

    # batch 2: user 1 purchases 10 min in (matches both clicks); user 2
    # purchases 2 hours later (outside the 30-minute window)
    spark.createDataFrame(
        [
            (10, t0 + dt.timedelta(minutes=10), 1, "purchase", 9.99),
            (11, t0 + dt.timedelta(hours=2), 2, "purchase", 5.0),
        ],
        schema,
    ).write.mode("append").parquet(purch_p)
    run_once()

    rows = spark.read.parquet(out).collect()
    got = {(r["click_id"], r["purchase_id"]) for r in rows}
    assert got == {(1, 10), (2, 10)}
    assert all(r["purchase_value"] == 9.99 for r in rows)


def test_apply_changes_maintains_postings_incrementally(spark, tmp_path):
    """txlog CDC -> incremental index maintenance: applying the change
    feed to the v0 index must equal a full rebuild of the v1 snapshot."""
    from sf_epa_data_ingestion_spark.operators.search import apply_changes, build_postings
    from sf_epa_data_ingestion_spark.storage import TxTable

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    t = TxTable(spark, str(tmp_path / "docs")).create(
        docs.repartitionByRange(4, "doc_id")
    )
    index_v0 = build_postings(t.read(), id_col="doc_id", text_col="text")

    lo = docs.agg(F.min("doc_id")).first()[0]
    updates = docs.filter(F.col("doc_id") <= lo + 3).withColumn(
        "text", F.concat(F.lit("fresh zebra tokens "), F.col("text"))
    )
    inserts = docs.limit(2).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    t.merge(updates.unionByName(inserts), ["doc_id"])

    incremental = apply_changes(
        index_v0, t.changes(0), id_col="doc_id", text_col="text"
    )
    rebuilt = build_postings(t.read(), id_col="doc_id", text_col="text")
    # identical (token, id, tf) multisets
    assert incremental.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(incremental).count() == 0
    # the new tokens are actually indexed
    assert incremental.filter(F.col("token") == "zebra").count() == 4
