"""End-to-end EPA pipeline test on synthetic payloads (SURVEY §5 strategy):
fetch (injected) -> normalize to 11 tables -> pdf_to_download -> merge
metadata -> pdf_to_chunk -> rechunk -> enrich."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from sf_epa_data_ingestion_spark import schemas
from sf_epa_data_ingestion_spark.functions.strings import upper_columns
from sf_epa_data_ingestion_spark.plans import epa_views, normalize, pipeline
from sf_epa_data_ingestion_spark.sources.rest import fetch_payloads

PAYLOADS = {
    "100-1": {
        "eparegno": "100-1",
        "productname": "Alpha Pesticide",
        "registereddate": "2020-01-01",
        "signal_word": "CAUTION",
        "companyinfo": [{"name": "AlphaCorp", "city": "SF"}],
        "active_ingredients": [
            {"pc_code": "PC1", "active_ing": "glyphosate", "active_ing_percent": 41.0}
        ],
        "types": [{"type": "HERBICIDE"}, {"type": "RUP"}],
        "pdffiles": [
            {"epa_reg_num": "100-1", "pdffile": "a_old.pdf", "pdffile_accepted_date": "2021-05-01"},
            {"epa_reg_num": "100-1", "pdffile": "a_new.pdf", "pdffile_accepted_date": "2023-01-15"},
        ],
    },
    "200-2": {
        "eparegno": "200-2",
        "productname": "Beta Spray",
        "signal_word": "DANGER",
        # no companyinfo / types — the P8 existence-guard path
        "pdffiles": [
            {"epa_reg_num": "200-2", "pdffile": "b.pdf", "pdffile_accepted_date": "2022-07-01"}
        ],
    },
    "300-3": {
        "eparegno": "300-3",
        "productname": "Gamma Dust",
        "pdffiles": [],  # empty array -> no child rows, no download row
    },
}


def _fetcher(item_id: str):
    if item_id == "bad-id":
        raise RuntimeError("HTTP 404")
    return PAYLOADS.get(item_id)


def _normalized(spark):
    ids = spark.createDataFrame([(k,) for k in [*PAYLOADS, "bad-id"]], ["id"])
    raw = fetch_payloads(ids, _fetcher)
    parsed = normalize.parse_payloads(spark, raw.filter(F.col("status") == "ok"))
    return raw, {k: upper_columns(v) for k, v in normalize.normalize_all(parsed).items()}


def test_fetch_errors_become_data(spark):
    ids = spark.createDataFrame([("100-1",), ("bad-id",)], ["id"])
    rows = {r["id"]: r for r in fetch_payloads(ids, _fetcher).collect()}
    assert rows["100-1"]["status"] == "ok"
    assert json.loads(rows["100-1"]["payload"])["eparegno"] == "100-1"
    assert rows["bad-id"]["status"] == "error" and "404" in rows["bad-id"]["error"]


def test_normalize_parent_and_children(spark):
    _, tables = _normalized(spark)
    products = {r["EPAREGNO"]: r for r in tables["EPA_PRODUCTS"].collect()}
    assert set(products) == {"100-1", "200-2", "300-3"}
    assert products["100-1"]["SIGNAL_WORD"] == "CAUTION"
    assert products["300-3"]["PRODUCTNAME"] == "Gamma Dust"

    company = tables["EPA_COMPANY_INFO"].collect()
    assert len(company) == 1 and company[0]["NAME"] == "AlphaCorp"

    ing = tables["EPA_ACTIVE_INGREDIENTS"].collect()
    assert ing[0]["ACTIVE_ING_PERCENT"] == 41.0

    # P8: absent and empty arrays both yield zero child rows
    assert tables["EPA_TYPES"].filter(F.col("EPAREGNO") == "200-2").count() == 0
    assert tables["EPA_PDF_FILES"].filter(F.col("EPAREGNO") == "300-3").count() == 0


def test_pdf_to_download_dedups_and_antijoins(spark):
    _, tables = _normalized(spark)
    meta = spark.createDataFrame(
        [("b.pdf",)], ["PDFFILE"]
    )  # b.pdf already downloaded
    out = epa_views.pdf_to_download(tables["EPA_PRODUCTS"], tables["EPA_PDF_FILES"], meta)
    rows = out.collect()
    # 100-1: latest of two files by string-date DESC; 200-2 filtered by anti-join
    assert [(r["EPAREGNO"], r["PDFFILE"]) for r in rows] == [("100-1", "a_new.pdf")]


def test_merge_metadata_and_chunk_flow(spark):
    _, tables = _normalized(spark)
    meta_schema = schemas.EPA_PDF_INGESTION_METADATA
    empty_meta = spark.createDataFrame([], meta_schema)
    new_meta = spark.createDataFrame(
        [
            (
                1,
                "Alpha Pesticide",
                "stage/EPA_LABEL_PDF/a_new.pdf",
                "http://x/a_new.pdf",
                100,
                None,
                "PENDING",
                "100-1",
                "a_new.pdf",
                "2023-01-15",
                "a_new.pdf",
            )
        ],
        meta_schema,
    )
    merged = pipeline.merge_download_metadata(empty_meta, new_meta)
    assert merged.count() == 1

    stage_catalog = spark.createDataFrame(
        [("EPA_LABEL_PDF/a_new.pdf", 100)], ["RELATIVE_PATH", "SIZE"]
    )
    to_chunk = epa_views.pdf_to_chunk(stage_catalog, merged)
    assert to_chunk.count() == 1

    # rechunk: stale chunks for the path are purged, fresh ones appended
    chunks0 = spark.createDataFrame(
        [("EPA_LABEL_PDF/a_new.pdf", 1, None, None, "stale chunk", None, None, None, None, None),
         ("EPA_LABEL_PDF/other.pdf", 2, None, None, "kept chunk", None, None, None, None, None)],
        schemas.DOCS_CHUNKS_TABLE,
    )
    doc_text = to_chunk.withColumn("TEXT", F.lit("alpha beta gamma " * 40))
    new_chunks = pipeline.rechunk(chunks0, doc_text.select("RELATIVE_PATH", "TEXT"))
    got = new_chunks.collect()
    paths = {r["RELATIVE_PATH"] for r in got}
    assert "EPA_LABEL_PDF/other.pdf" in paths
    assert not any(r["CHUNK"] == "stale chunk" for r in got)
    assert any(r["RELATIVE_PATH"] == "EPA_LABEL_PDF/a_new.pdf" and "alpha" in (r["CHUNK"] or "") for r in got)


def test_enrich_chunks_joins_attributes(spark):
    _, tables = _normalized(spark)
    chunks = spark.createDataFrame(
        [("EPA_LABEL_PDF/a_new.pdf", 1, None, None, "c1", None, None, None, None, None)],
        schemas.DOCS_CHUNKS_TABLE,
    )
    meta = spark.createDataFrame(
        [(1, None, "stage/EPA_LABEL_PDF/a_new.pdf", None, None, None, "CHUNKED", "100-1", None, None, None)],
        schemas.EPA_PDF_INGESTION_METADATA,
    )
    out = pipeline.enrich_chunks(
        chunks,
        meta,
        tables["EPA_COMPANY_INFO"],
        tables["EPA_PRODUCTS"],
        tables["EPA_TYPES"],
    ).collect()
    (row,) = out
    assert row["COMPANYNAME"] == "AlphaCorp"
    assert row["PRODUCTNAME"] == "Alpha Pesticide"
    assert row["SIGNAL_WORD"] == "CAUTION"
    assert row["CATEGORY_EPA_TYPE"] == ["HERBICIDE", "RUP"]
