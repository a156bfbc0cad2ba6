"""The reference's two named derived queries, as DataFrame plans.

- ``pdf_to_download``: VW_PDF_TO_DOWNLOAD (epa_ingestion.py:432-457) —
  products ⋈ pdf files (J1), latest-accepted-per-product window dedup
  (W1, string-date DESC ordering), anti-join against already-downloaded
  metadata (J2).
- ``pdf_to_chunk``: VW_PDF_TO_CHUNK (epa_ingestion.py:484-501) — stage
  directory catalog ⋈ PENDING metadata on a regex-derived key (J3 + P4).

Plan shape at scale: both are hub joins on ``EPAREGNO``/``RELATIVE_PATH``;
with the hub tables bucketed on the key these run shuffle-free, and the
metadata side (small: one row per downloaded file) broadcasts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.strings import regexp_substr
from ..operators.relational import anti_join, latest_per_key


def pdf_to_download(products: DataFrame, pdf_files: DataFrame, metadata: DataFrame) -> DataFrame:
    """VW_PDF_TO_DOWNLOAD semantics (epa_ingestion.py:447-456).

    Canonical join key is EPAREGNO (SURVEY §7 hard-part 4); the dedup
    orders the *string* date DESC (hard-part 2) with PDFFILE as a
    deterministic tiebreaker (the reference left ties engine-ordered).
    """
    joined = products.join(
        pdf_files.select("EPAREGNO", "PDFFILE", "PDFFILE_ACCEPTED_DATE"), "EPAREGNO", "inner"
    )
    latest = latest_per_key(
        joined,
        ["EPAREGNO"],
        [F.desc("PDFFILE_ACCEPTED_DATE"), F.asc("PDFFILE")],
    )
    return anti_join(latest, metadata.select("PDFFILE").filter(F.col("PDFFILE").isNotNull()), ["PDFFILE"])


def pdf_to_chunk(stage_catalog: DataFrame, metadata: DataFrame) -> DataFrame:
    """VW_PDF_TO_CHUNK semantics (epa_ingestion.py:484-501): stage files
    whose metadata row is PENDING, joined on the regex-derived relative
    path (REGEXP_SUBSTR -> NULL-on-miss parity via regexp_substr)."""
    pending = (
        metadata.filter(F.col("PROCESSING_STATUS") == "PENDING")
        .select(
            regexp_substr(F.col("STAGE_FILE_PATH"), r"EPA_LABEL_PDF/.*$").alias("META_RELATIVE_PATH"),
            "EPAREGNO",
            "PRODUCT_NAME",
            "PROCESSING_STATUS",
        )
        .filter(F.col("META_RELATIVE_PATH").isNotNull())
    )
    return stage_catalog.join(
        pending, stage_catalog["RELATIVE_PATH"] == pending["META_RELATIVE_PATH"], "inner"
    ).drop("META_RELATIVE_PATH")
