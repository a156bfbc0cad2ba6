"""The reference's full entry-point-1 lifecycle (SURVEY §3.1), composed in
one run: seed ids -> distributed fetch -> normalize + persist 11 tables ->
pdf_to_download -> distributed binary download -> stage write ->
metadata MERGE -> stage catalog scan -> pdf_to_chunk -> delete+rechunk ->
status flip -> enrichment -> search index -> lexical hit.

Everything external (HTTP) is injected; every persisted table goes through
atomic_overwrite; assertions check the cross-stage contracts, not just
per-stage outputs."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import Window

from sf_epa_data_ingestion_spark import schemas
from sf_epa_data_ingestion_spark.operators import multimodal, mutate, search
from sf_epa_data_ingestion_spark.plans import epa_views, pipeline
from sf_epa_data_ingestion_spark.sources.readers import load_binary_stage
from sf_epa_data_ingestion_spark.sources.rest import download_binaries

from test_epa_pipeline import PAYLOADS, _fetcher  # reuse the synthetic EPA universe

PDF_BODIES = {
    "a_new.pdf": b"%PDF-1.4\nAlpha label: spark safety directions near water. " * 30,
    "b.pdf": b"%PDF-1.4\nBeta label: storage and disposal mixing chart. " * 30,
}


def test_full_lifecycle(spark, tmp_path):
    cfg = pipeline.PipelineConfig(warehouse=str(tmp_path / "wh"), environment="TEST")
    stage_dir = str(tmp_path / "stage" / "EPA_LABEL_PDF")
    os.makedirs(stage_dir)

    # stages 1-5: fetch -> normalize -> persist (CREATE OR REPLACE parity)
    ids = spark.createDataFrame([(k,) for k in [*PAYLOADS, "bad-id"]], ["id"])
    tables = pipeline.run_ingest(spark, ids, _fetcher, cfg)
    assert tables["EPA_PRODUCTS"].count() == 3  # bad-id became an error row, not a crash
    # persisted: re-readable from the warehouse path
    assert spark.read.parquet(cfg.table_path("EPA_PRODUCTS")).count() == 3

    # stage 6: incremental download plan (window dedup + anti-join, empty metadata)
    empty_meta = spark.createDataFrame([], schemas.EPA_PDF_INGESTION_METADATA)
    todo = pipeline.plan_downloads(tables, empty_meta)
    plan_rows = todo.collect()
    # latest-per-product only: a_new.pdf (not a_old), b.pdf; 300-3 has no files
    assert sorted(r["PDFFILE"] for r in plan_rows) == ["a_new.pdf", "b.pdf"]

    # stage 7: distributed binary download (injected) + stage write + MERGE
    urls = todo.select(F.concat(F.lit("http://epa/"), F.col("PDFFILE")).alias("url"))
    blobs = download_binaries(urls, lambda u: PDF_BODIES[u.rsplit("/", 1)[1]])
    assert {r["status"] for r in blobs.select("status").collect()} == {"ok"}
    for r in blobs.collect():  # tiny corpus: stage write via driver is fine in test
        with open(os.path.join(stage_dir, r["url"].rsplit("/", 1)[1]), "wb") as f:
            f.write(bytes(r["content"]))

    new_meta = todo.select(
        F.row_number().over(Window.orderBy("PDFFILE")).cast("int").alias("ID"),
        F.col("PRODUCTNAME").alias("PRODUCT_NAME"),
        F.concat(F.lit("stage/EPA_LABEL_PDF/"), F.col("PDFFILE")).alias("STAGE_FILE_PATH"),
        F.concat(F.lit("http://epa/"), F.col("PDFFILE")).alias("ORIGINAL_URL"),
        F.lit(100).cast("long").alias("FILE_SIZE_BYTES"),
        F.lit(None).cast("timestamp_ntz").alias("UPLOAD_TIMESTAMP"),
        F.lit("PENDING").alias("PROCESSING_STATUS"),
        F.col("EPAREGNO"),
        F.col("PDFFILE"),
        F.col("PDFFILE_ACCEPTED_DATE"),
        F.col("PDFFILE").alias("PDF_FILE_NAME"),
    )
    merged = pipeline.merge_download_metadata(empty_meta, new_meta.select(*[f.name for f in schemas.EPA_PDF_INGESTION_METADATA.fields]))
    assert merged.count() == 2

    # stage 8: directory-catalog scan joined to PENDING metadata
    catalog = load_binary_stage(spark, stage_dir).select(
        F.concat(F.lit("EPA_LABEL_PDF/"), F.col("relative_path")).alias("RELATIVE_PATH"),
        F.col("size").alias("SIZE"),
    )
    to_chunk = epa_views.pdf_to_chunk(catalog, merged)
    assert to_chunk.count() == 2

    # stage 9: parse (F3) + delete-insert rechunk (U4/U5/J5)
    parsed = multimodal.parse_documents(
        load_binary_stage(spark, stage_dir), path_col="relative_path"
    ).select(F.concat(F.lit("EPA_LABEL_PDF/"), F.col("path")).alias("RELATIVE_PATH"), F.col("text").alias("TEXT"))
    empty_chunks = spark.createDataFrame([], schemas.DOCS_CHUNKS_TABLE)
    chunks = pipeline.rechunk(empty_chunks, to_chunk.join(parsed, "RELATIVE_PATH").select("RELATIVE_PATH", "TEXT"))
    assert chunks.count() >= 2
    mutate.atomic_overwrite(chunks, cfg.table_path("DOCS_CHUNKS_TABLE"))
    chunks = spark.read.parquet(cfg.table_path("DOCS_CHUNKS_TABLE"))

    # stage 9b: status flip (U2) — suffix-LIKE update marks files CHUNKED
    flipped = mutate.update_from_join(
        merged,
        chunks.select("RELATIVE_PATH").distinct(),
        F.expr("t.STAGE_FILE_PATH LIKE '%' || s.RELATIVE_PATH"),
        {"PROCESSING_STATUS": F.lit("CHUNKED")},
    )
    assert {r["PROCESSING_STATUS"] for r in flipped.collect()} == {"CHUNKED"}

    # stage 10: enrichment (U3/J4/A1)
    enriched = pipeline.enrich_chunks(
        chunks, flipped, tables["EPA_COMPANY_INFO"], tables["EPA_PRODUCTS"], tables["EPA_TYPES"]
    )
    alpha = enriched.filter(F.col("RELATIVE_PATH") == "EPA_LABEL_PDF/a_new.pdf").first()
    assert alpha["PRODUCTNAME"] == "Alpha Pesticide"
    assert alpha["CATEGORY_EPA_TYPE"] == ["HERBICIDE", "RUP"]

    # stage 11: search service over enriched chunks
    docs = enriched.select(
        F.xxhash64("RELATIVE_PATH", "CHUNK").alias("id"), F.col("CHUNK").alias("chunk")
    )
    postings = search.build_postings(docs)
    stats = search.build_token_stats(postings, n_docs=docs.count())
    hits = search.lexical_search(postings, stats, "safety water", k=5)
    assert hits.count() > 0
