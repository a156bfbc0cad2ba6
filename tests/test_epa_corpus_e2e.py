"""End-to-end EPA pipeline over the full 51-PDF reference corpus.

The reference ingests these exact files (epa_ingestion.py:485-494 stage
listing -> :763-764 PARSE_DOCUMENT + TEXT_CHUNKER -> postings); this test
drives the Spark-first replica over the real corpus: binary scan ->
extract -> chunk(1512/256) -> enrich -> postings, asserting per-file
extraction status (48 text-layer PDFs, 3 CCITTFax scans with no text
layer) and chunk invariants.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from sf_epa_data_ingestion_spark.functions.text import CHUNK_OVERLAP, CHUNK_SIZE
from sf_epa_data_ingestion_spark.operators import multimodal, search
from sf_epa_data_ingestion_spark.functions.text import chunk_documents
from sf_epa_data_ingestion_spark.sources.readers import load_binary_files

CORPUS = "/root/reference/epa_pdfs"

# image-only scans (CCITTFax, no text layer — OCR would be required;
# documented out of scope in functions/pdf.py)
SCANNED = {"AXXE.pdf", "CONDOR_.pdf", "CUTLASS_.pdf"}


needs_corpus = pytest.mark.skipif(
    not os.path.isdir(CORPUS), reason="reference corpus not present"
)


@needs_corpus
def test_binary_loader_sees_underscore_prefixed_files(spark):
    """Spark's InMemoryFileIndex silently drops `_`-prefixed names
    (the corpus ships _USF_0411.pdf); the listing-based loader must not."""
    files = load_binary_files(spark, CORPUS, suffix=".pdf")
    names = {r["path"].split("/")[-1] for r in files.select("path").collect()}
    assert len(names) == 51
    assert "_USF_0411.pdf" in names
    # the stock binaryFile source demonstrates the blind spot
    stock = spark.read.format("binaryFile").load(f"{CORPUS}/*.pdf").count()
    assert stock == 50


@needs_corpus
def test_full_corpus_extract_chunk_postings(spark):
    files = load_binary_files(spark, CORPUS, suffix=".pdf")
    parsed = (
        multimodal.parse_documents(files, strict=True)
        .withColumn("name", F.regexp_extract("path", r"([^/]+)$", 1))
        .persist()
    )
    status = {r["name"]: r["parse_status"] for r in parsed.collect()}
    assert len(status) == 51

    # text-layer coverage: exactly the 3 known scans fail, 48 extract
    empties = {n for n, s in status.items() if s != "stdlib"}
    assert empties == SCANNED, empties
    assert all(status[n] == "empty" for n in SCANNED)

    texted = parsed.filter(F.col("parse_status") == "stdlib")
    lengths = {r["name"]: r["n"] for r in texted.select("name", F.length("text").alias("n")).collect()}
    assert all(n > 1000 for n in lengths.values()), {
        k: v for k, v in lengths.items() if v <= 1000
    }

    # chunk(1512/256): every text-layer doc chunks; sizes bounded; chunk 0
    # exists for each; per-doc indices are dense from 0
    chunks = chunk_documents(
        texted.select("name", "text"), keep_cols=["name"]
    ).persist()
    stats = {
        r["name"]: (r["n"], r["max_len"], r["max_idx"])
        for r in chunks.groupBy("name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.length("chunk")).alias("max_len"),
            F.max("chunk_index").alias("max_idx"),
        )
        .collect()
    }
    assert set(stats) == set(lengths)
    for name, (n, max_len, max_idx) in stats.items():
        assert n >= 1 and max_idx == n - 1, (name, n, max_idx)
        assert max_len <= CHUNK_SIZE, (name, max_len)
        # a doc longer than one chunk must produce > 1 chunk given the
        # 256-char overlap stride
        if lengths[name] > CHUNK_SIZE:
            assert n >= 2, (name, lengths[name], n)

    total_chunks = sum(n for n, _, _ in stats.values())
    assert total_chunks > 300  # ~1.3 MB of text at a <=1512 stride

    # enrich + postings: the search index over real chunks must cover the
    # corpus and answer a label-domain term
    enriched = chunks.select(
        F.concat_ws("#", "name", F.col("chunk_index").cast("string")).alias("id"),
        "chunk",
    )
    postings = search.build_postings(enriched).persist()
    n_docs = postings.select("id").distinct().count()
    assert n_docs == total_chunks
    hits = (
        postings.filter(F.col("token") == "epa")
        .select(F.regexp_extract("id", r"^([^#]+)", 1).alias("name"))
        .distinct()
        .count()
    )
    assert hits >= 40, hits  # 'epa' appears in nearly every label
    parsed.unpersist(), chunks.unpersist(), postings.unpersist()


@needs_corpus
def test_corpus_freshness_drill_tx_hosted_index(spark, tmp_path):
    """r10 VERDICT next-round #8 (stretch): the reference's §3.3
    sub-pipeline (PDF -> chunk(1512/256) -> searchable index,
    epa_ingestion.py:763-764) composed with TARGET_LAG semantics
    (:844-854) as ONE user-visible scenario over the real 51-PDF
    corpus: chunks arrive in waves; each wave refreshes the TX-hosted
    index through the streaming sink; a reader that resolved its
    snapshot before the waves keeps getting generation-1 results
    BIT-FOR-BIT across two refresh cycles (one of which crashes
    mid-refresh and recovers through the sink's torn-refresh rollback);
    every generation's ranking equals the from-scratch batch derivation
    over exactly the documents that generation covers."""
    from sf_epa_data_ingestion_spark.storage.txindex import (
        load_tx_search_index,
        materialize_tx_search_index,
        refresh_tx_search_index,
    )
    from sf_epa_data_ingestion_spark.streaming.freshness import (
        tx_index_refresh_sink,
    )

    files = load_binary_files(spark, CORPUS, suffix=".pdf")
    texted = (
        multimodal.parse_documents(files, strict=True)
        .withColumn("name", F.regexp_extract("path", r"([^/]+)$", 1))
        .filter(F.col("parse_status") == "stdlib")
    )
    chunks = (
        chunk_documents(texted.select("name", "text"), keep_cols=["name"])
        .select(
            F.concat_ws("#", "name", F.col("chunk_index").cast("string")).alias("id"),
            "name",
            "chunk",
        )
        .persist()
    )
    names = sorted(r["name"] for r in texted.select("name").distinct().collect())
    wave_a, wave_b, wave_c = set(names[:30]), set(names[30:40]), set(names[40:])
    a = chunks.filter(F.col("name").isin(sorted(wave_a))).drop("name").persist()
    b = chunks.filter(F.col("name").isin(sorted(wave_b))).drop("name")
    c = chunks.filter(F.col("name").isin(sorted(wave_c))).drop("name")

    tx = str(tmp_path / "tx")
    materialize_tx_search_index(a, tx, id_col="id", text_col="chunk")
    queries = spark.createDataFrame(
        [(1, "epa registration label"), (2, "product active ingredient")],
        "query_id long, query_text string",
    )

    def _serve(snap):
        return sorted(
            (r["query_id"], r["id"], round(r["score"], 9))
            for r in snap.bm25_maxscore(queries, k=10).collect()
        )

    def _batch_derivation(corpus_chunks):
        n = corpus_chunks.count()
        postings = search.build_postings(corpus_chunks, id_col="id", text_col="chunk")
        stats = search.build_token_stats(postings, n_docs=n)
        dl = search.doc_lengths(corpus_chunks, id_col="id", text_col="chunk")
        return sorted(
            (r["query_id"], r["id"], round(r["score"], 9))
            for r in search.bm25_search_many(
                postings, stats, queries, n_docs=n, doclens=dl, k=10
            ).collect()
        )

    snap1 = load_tx_search_index(spark, tx)
    r1 = _serve(snap1)
    assert r1 and r1 == _batch_derivation(a)

    sink = tx_index_refresh_sink(spark, tx, "epa-drill", id_col="id", text_col="chunk")

    # --- cycle 1: wave B arrives; the refresh TEARS mid-flight (pieces
    # committed, manifest withheld), then the sink's replay of the same
    # batch recovers through the torn-refresh rollback and publishes
    b_changes = b.withColumn("_change_type", F.lit("insert"))
    refresh_tx_search_index(
        spark, tx, b_changes, id_col="id", text_col="chunk", _publish=False
    )
    assert _serve(snap1) == r1                          # reader mid-refresh
    assert load_tx_search_index(spark, tx).gen == 1     # cutover invisible
    sink(b_changes, 0)
    snap2 = load_tx_search_index(spark, tx)
    assert snap2.gen == 2
    r2 = _serve(snap2)
    ab = a.unionByName(b)
    assert r2 == _batch_derivation(ab) and r2 != r1
    assert _serve(snap1) == r1                          # reader still pinned

    # --- cycle 2: wave C arrives as a clean refresh; replay is a no-op
    c_changes = c.withColumn("_change_type", F.lit("insert"))
    sink(c_changes, 1)
    snap3 = load_tx_search_index(spark, tx)
    assert snap3.gen == 3
    r3 = _serve(snap3)
    assert r3 == _batch_derivation(ab.unionByName(c))
    sink(c_changes, 1)                                  # replayed micro-batch
    assert load_tx_search_index(spark, tx).gen == 3
    assert _serve(snap1) == r1 and _serve(snap2) == r2  # both held readers
    chunks.unpersist(), a.unpersist()
