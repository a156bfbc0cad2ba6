"""End-to-end pipeline orchestration (entry point 1, SURVEY §3.1).

Driver-side control flow only — every data transformation is a DataFrame
plan. Mirrors the reference's stage gating (epa_ingestion.py:868-921):

  seed ids -> fetch payloads -> normalize to 11 tables -> pdf_to_download
  -> download -> merge metadata -> pdf_to_chunk -> delete+rechunk+enrich
  -> search index refresh

External effects (HTTP fetch/download) are injected callables so the whole
pipeline runs hermetically in tests; stage gating keeps the reference's
"skip stage when no work" semantics (epa_ingestion.py:892-920).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .. import schemas
from ..functions.strings import clean_filename, upper_columns
from ..functions.text import chunk_documents
from ..operators.mutate import add_columns_if_absent, atomic_overwrite, delete_using, merge_upsert
from ..operators.relational import enrich_left_joins, group_collect
from ..sources.rest import fetch_payloads
from . import epa_views, normalize


@dataclass
class PipelineConfig:
    """Environment-prefixed warehouse layout (§1.4): {env}_src_ingest etc."""

    warehouse: str
    environment: str = field(default_factory=lambda: os.environ.get("ENVIRONMENT", "DEV"))

    def table_path(self, name: str) -> str:
        return os.path.join(self.warehouse, self.environment.lower(), name.lower())


def run_ingest(
    spark: SparkSession,
    ids: DataFrame,
    fetcher: Callable[[str], dict | None],
    cfg: PipelineConfig,
) -> dict[str, DataFrame]:
    """Stages 1-5: fetch + normalize + persist the 10 entity tables
    (destructive recreate each run — CREATE OR REPLACE parity, §1.3)."""
    raw = fetch_payloads(ids, fetcher, id_col=ids.columns[0])
    parsed = normalize.parse_payloads(spark, raw.filter(F.col("status") == "ok"))
    tables = normalize.normalize_all(parsed)
    out: dict[str, DataFrame] = {}
    for name, df in tables.items():
        path = cfg.table_path(name)
        atomic_overwrite(upper_columns(df), path)
        out[name] = spark.read.parquet(path)
    return out


def plan_downloads(tables: dict[str, DataFrame], metadata: DataFrame) -> DataFrame:
    """Stage 6: the VW_PDF_TO_DOWNLOAD plan + cleaned target filename."""
    todo = epa_views.pdf_to_download(tables["EPA_PRODUCTS"], tables["EPA_PDF_FILES"], metadata)
    return todo.withColumn(
        "PDF_FILE_NAME",
        F.concat(clean_filename(F.concat_ws("_", F.col("PRODUCTNAME"), F.col("EPAREGNO"))), F.lit(".pdf")),
    )


def merge_download_metadata(metadata: DataFrame, new_meta: DataFrame) -> DataFrame:
    """Stage 7: the U1 MERGE (epa_ingestion.py:585-623) on EPAREGNO."""
    return merge_upsert(metadata, new_meta, on=["EPAREGNO"])


def rechunk(
    chunks: DataFrame,
    to_chunk: DataFrame,
    text_col: str = "TEXT",
) -> DataFrame:
    """Stage 9: delete-then-insert idempotent rechunk (U4+U5+J5,
    epa_ingestion.py:744-766): purge stale chunks for the files being
    rechunked, append fresh ones from the chunker."""
    kept = delete_using(chunks, to_chunk.select("RELATIVE_PATH"), ["RELATIVE_PATH"])
    fresh = chunk_documents(
        to_chunk, text_col=text_col, keep_cols=[c for c in to_chunk.columns if c != text_col]
    ).withColumnRenamed("chunk", "CHUNK")
    fresh = add_columns_if_absent(fresh, {c.name: c.dataType.simpleString() for c in schemas.DOCS_CHUNKS_TABLE.fields})
    kept = add_columns_if_absent(kept, {c.name: c.dataType.simpleString() for c in schemas.DOCS_CHUNKS_TABLE.fields})
    cols = [f.name for f in schemas.DOCS_CHUNKS_TABLE.fields]
    return kept.select(*cols).unionByName(fresh.select(*cols))


def enrich_chunks(chunks: DataFrame, metadata: DataFrame, company: DataFrame, products: DataFrame, types: DataFrame) -> DataFrame:
    """Stage 10: the U3/J4/A1 enrichment (epa_ingestion.py:807-826) —
    left-join company/product attributes + ARRAY_AGG'd types onto every
    chunk, keyed through metadata's regex-derived relative path."""
    meta_key = metadata.select(
        F.regexp_extract(F.col("STAGE_FILE_PATH"), r"EPA_LABEL_PDF/.*$", 0).alias("RELATIVE_PATH"),
        "EPAREGNO",
    ).filter(F.col("RELATIVE_PATH") != "")
    type_arrays = group_collect(types, ["EPAREGNO"], "TYPE", "CATEGORY_EPA_TYPE")
    enriched = enrich_left_joins(
        chunks.drop("COMPANYNAME", "PRODUCTNAME", "SIGNAL_WORD", "CATEGORY_EPA_TYPE"),
        [
            (meta_key, ["RELATIVE_PATH"]),
            (company.select("EPAREGNO", F.col("NAME").alias("COMPANYNAME")), ["EPAREGNO"]),
            (products.select("EPAREGNO", F.col("PRODUCTNAME"), F.col("SIGNAL_WORD")), ["EPAREGNO"]),
            (type_arrays, ["EPAREGNO"]),
        ],
    )
    return enriched.drop("EPAREGNO")
