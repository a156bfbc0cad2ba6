"""End-to-end streaming training-data ingestion (streaming/ingest.py):
quality gate -> in-batch + cross-batch exact dedup -> exactly-once txlog
append, through a REAL Structured Streaming query with restart."""

import pyspark.sql.functions as F

from sf_epa_data_ingestion_spark.operators.cleaning import c4_quality_filter
from sf_epa_data_ingestion_spark.operators.dedup import normalized_text
from sf_epa_data_ingestion_spark.storage import TxTable
from sf_epa_data_ingestion_spark.streaming.ingest import training_doc_appender

SF001 = "/root/testdata/sf0.001"


def _expected_corpus(docs):
    """Batch-side oracle: C4-keep docs, lowest id per normalized digest."""
    flags = c4_quality_filter(docs).select("doc_id", "keep")
    kept = docs.join(flags, "doc_id").filter("keep")
    kept = kept.withColumn("text_hash", F.md5(normalized_text(F.col("text"))))
    keep_ids = kept.groupBy("text_hash").agg(F.min("doc_id").alias("doc_id"))
    return kept.join(keep_ids, ["text_hash", "doc_id"])


def test_stream_ingest_gates_dedups_and_survives_restart(spark, tmp_path):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    # wave 1: the corpus itself plus junk that must be gated out
    junk = spark.createDataFrame(
        [(900001, "too short", "en", "junk", 9),
         (900002, "curly { brace " + "word " * 60, "en", "junk", 300)],
        docs.schema,
    )
    docs.unionByName(junk).write.mode("overwrite").parquet(src)

    t = TxTable(
        spark, str(tmp_path / "tbl")
    ).create(docs.withColumn("text_hash", F.lit("")).limit(0))
    sink = training_doc_appender(t, "doc-ingest")

    def run_once():
        q = (
            spark.readStream.schema(docs.schema).parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    expected = _expected_corpus(docs)
    got = t.read()
    assert got.count() == expected.count()
    # digests unique, junk gated
    assert got.select("text_hash").distinct().count() == got.count()
    assert got.filter(F.col("doc_id") >= 900000).count() == 0

    # wave 2 (restart with the same checkpoint): verbatim copies of
    # existing docs under new ids + one genuinely new document
    dupes = docs.limit(20).withColumn("doc_id", F.col("doc_id") + 800000)
    fresh = spark.createDataFrame(
        [(700001, "genuinely new clean document " + "alpha beta gamma " * 30,
          "en", "new", 500)],
        docs.schema,
    )
    dupes.unionByName(fresh).write.mode("append").parquet(src)
    run_once()

    got2 = t.read()
    # only the fresh document landed; every duplicate was rejected
    assert got2.count() == expected.count() + 1
    assert got2.filter(F.col("doc_id") == 700001).count() == 1
    assert got2.filter(F.col("doc_id") >= 800000).count() == 0
    assert got2.select("text_hash").distinct().count() == got2.count()

    # replaying the sink with an old batch id is acknowledged, not written
    n = got2.count()
    sink(dupes.unionByName(fresh).withColumn(
        "text_hash", F.md5(normalized_text(F.col("text")))), 0)
    assert t.read().count() == n


def test_stream_ingest_model_gate_survives_restart(spark, tmp_path):
    """r7: the TRAINED quality gate in the stream — a pre-trained
    (weights, bias) model scores every micro-batch (broadcast join, no
    training in the stream) and only docs at/above the threshold are
    admitted; exactly-once and restart semantics unchanged."""
    from sf_epa_data_ingestion_spark.functions.refhash import QLR_ONE
    from sf_epa_data_ingestion_spark.operators.quality_model import (
        score_docs_lr,
        train_quality_lr,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    model = train_quality_lr(docs)  # offline fit on the historical corpus
    thr = QLR_ONE // 2
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    docs.write.mode("overwrite").parquet(src)

    t = TxTable(
        spark, str(tmp_path / "tbl")
    ).create(docs.withColumn("text_hash", F.lit("")).limit(0))
    sink = training_doc_appender(
        t, "doc-ingest-model", quality_model=model, min_score_fp=thr
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

    run_once()
    # batch-side oracle: C4 keep AND model score >= thr, lowest id/digest
    kept = _expected_corpus(docs)
    admitted = kept.join(
        score_docs_lr(kept, model[0], model[1])
        .filter(F.col("score_fp") >= thr)
        .select(F.col("id").alias("doc_id")),
        "doc_id",
        "left_semi",
    )
    got = t.read()
    n_admitted = admitted.count()
    assert got.count() == n_admitted
    assert 0 < n_admitted < kept.count()  # the gate actually splits
    # every admitted doc scores above threshold
    low = score_docs_lr(got, model[0], model[1]).filter(F.col("score_fp") < thr)
    assert low.count() == 0

    # restart with only below-threshold docs (score < thr after C4):
    # nothing new may land, exactly-once preserved
    rejected = kept.join(
        admitted.select("doc_id"), "doc_id", "left_anti"
    ).drop("text_hash").withColumn("doc_id", F.col("doc_id") + 500000)
    rejected.write.mode("append").parquet(src)
    run_once()
    assert t.read().count() == n_admitted


def test_stream_ingest_bloom_probe_path_equivalent_and_pruned(spark, tmp_path):
    """dedup_probe_cap + set_bloom("text_hash"): the cross-batch anti-join
    reads the state through a bloom-pruned digest probe. Pinned: (a) the
    admitted corpus is IDENTICAL to the plain full-scan path, batch by
    batch; (b) the probe actually prunes state files — md5 digests are
    uniform, so only the bitmaps can (bounds span the whole hex space);
    (c) an over-cap batch falls back to the full scan, result unchanged."""
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    schema = docs.withColumn("text_hash", F.lit("")).limit(0)

    t_plain = TxTable(spark, str(tmp_path / "plain")).create(schema)
    t_bloom = TxTable(spark, str(tmp_path / "bloom")).create(schema)
    t_bloom.set_bloom("text_hash", m=4096, k=5, backfill=False)

    sink_plain = training_doc_appender(t_plain, "ing-plain", compact_files=None)
    sink_bloom = training_doc_appender(
        t_bloom, "ing-bloom", compact_files=None, dedup_probe_cap=500
    )

    # three waves: seed corpus, then a small trickle batch with dupes +
    # fresh docs (the probe path), then an over-cap batch (fallback path)
    wave1 = docs
    dupes = docs.limit(15).withColumn("doc_id", F.col("doc_id") + 800000)
    fresh = spark.createDataFrame(
        [(700001, "bloom probe fresh doc " + "delta epsilon zeta " * 40,
          "en", "new", 500)],
        docs.schema,
    )
    wave2 = dupes.unionByName(fresh)
    wave3 = docs.withColumn("doc_id", F.col("doc_id") + 600000)  # all dupes, over cap

    for b, wave in enumerate([wave1, wave2, wave3]):
        sink_plain(wave, b)
        sink_bloom(wave, b)
        a = sorted(tuple(r) for r in t_plain.read().collect())
        bdata = sorted(tuple(r) for r in t_bloom.read().collect())
        assert a == bdata, f"wave {b}: bloom path diverged"

    # the fresh doc landed once, dupes never
    got = t_bloom.read()
    assert got.filter(F.col("doc_id") == 700001).count() == 1
    assert got.filter(F.col("doc_id") >= 600000).count() == 1  # only 700001
    assert got.select("text_hash").distinct().count() == got.count()

    # pruning evidence: a single-digest probe against the multi-file
    # bloom state scans fewer files than live
    digest = got.limit(1).collect()[0]["text_hash"]
    live = t_bloom.read_files()
    kept = t_bloom.read_files(filters=[("text_hash", "in", [digest])])
    assert len(live) >= 2 and len(kept) < len(live)


def test_inbatch_dedup_keeps_whole_lowest_id_row_atomically(spark, tmp_path):
    """r15: the in-batch dedup moved from a row_number window to
    groupBy(digest).agg(min_by(struct(payload), id)) — map-side partial
    aggregation instead of shipping+sorting every duplicate. The one new
    hazard of the aggregate form is atomicity: a per-column min would mix
    fields from DIFFERENT duplicate rows. Three same-digest rows with
    pairwise-distinct payloads: the admitted row must be id 1's payload
    end to end, and payload column order must survive the rewrite."""
    body = "word " * 60  # passes the C4 gate (60 words, mean len 4)
    rows = [(3, body, "en", "c", 300), (1, body, "en", "a", 100),
            (2, body, "en", "b", 200)]
    batch = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, src string, n long"
    )
    t = TxTable(spark, str(tmp_path / "tbl")).create(
        batch.withColumn("text_hash", F.lit("")).limit(0)
    )
    sink = training_doc_appender(t, "dedup-pin")
    sink(batch, 0)
    out = t.read().collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert (r["doc_id"], r["src"], r["n"]) == (1, "a", 100)
    assert t.read().columns == [
        "doc_id", "text", "lang", "src", "n", "text_hash"
    ]
