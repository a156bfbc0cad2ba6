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
