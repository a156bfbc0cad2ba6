"""Explicit schema contracts for every table in the EPA pipeline domain.

The reference declared these as warehouse DDL (create_tables,
epa_ingestion.py:118-261); here they are StructTypes — the ingest side
parses payloads against them (unknown keys dropped, missing keys null,
matching the reference's schema-on-read pandas behavior, SURVEY §1.3).

Type-mapping decisions (SURVEY §1.2): dates that the reference stored as
STRING stay strings (the latest-per-key dedup orders a STRING date —
epa_ingestion.py:451 — and correctness parity requires string ordering);
``active_ing_percent`` FLOAT -> double; autoincrement id -> long assigned
by row_number (documented non-gapless difference).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def _s(*names: str) -> list[StructField]:
    return [StructField(n, StringType()) for n in names]


# Parent table (epa_ingestion.py:123-136) — PK EPAREGNO.
EPA_PRODUCTS = StructType(
    _s(
        "EPAREGNO",
        "PRODUCTNAME",
        "REGISTEREDDATE",
        "CANCEL_FLAG",
        "CANCELLATIONREASON",
        "PRODUCT_STATUS",
        "PRODUCT_STATUS_DATE",
        "SIGNAL_WORD",
        "RUP_YN",
        "TRANSFER_FLAG",
    )
)

# Child tables, each FK EPAREGNO (epa_ingestion.py:139-232).
EPA_COMPANY_INFO = StructType(
    _s(
        "EPAREGNO",
        "NAME",
        "CONTACT_PERSON",
        "CO_DIVISION_NAME",
        "PHONE",
        "FAX",
        "EMAIL",
        "STREET",
        "PO_BOX",
        "CITY",
        "STATE",
        "ZIP_CODE",
    )
)
EPA_ACTIVE_INGREDIENTS = StructType(
    _s("EPAREGNO", "PC_CODE", "ACTIVE_ING", "CAS_NUMBER")
    + [StructField("ACTIVE_ING_PERCENT", DoubleType())]
)
EPA_SITES = StructType(_s("EPAREGNO", "SITE"))
EPA_PESTS = StructType(_s("EPAREGNO", "PEST"))
EPA_TYPES = StructType(_s("EPAREGNO", "TYPE"))
EPA_TRANSFER_HISTORY = StructType(
    _s("EPAREGNO", "PREVIOUS_EPAREGNO", "PREVIOUS_COMPANY", "TRANSFERRED_DATE")
)
EPA_PDF_FILES = StructType(
    _s("EPAREGNO", "EPA_REG_NUM", "PDFFILE", "PDFFILE_ACCEPTED_DATE")
)
EPA_ALT_BRAND_NAMES = StructType(_s("EPAREGNO", "ALTBRANDNAME"))
EPA_FORMULATIONS = StructType(_s("EPAREGNO", "FORMULATION"))

# State table surviving runs (epa_ingestion.py:235-249).
EPA_PDF_INGESTION_METADATA = StructType(
    [
        StructField("ID", LongType()),
        StructField("PRODUCT_NAME", StringType()),
        StructField("STAGE_FILE_PATH", StringType()),
        StructField("ORIGINAL_URL", StringType()),
        StructField("FILE_SIZE_BYTES", LongType()),
        StructField("UPLOAD_TIMESTAMP", TimestampNTZType()),
        StructField("PROCESSING_STATUS", StringType()),  # DEFAULT 'PENDING'
        StructField("EPAREGNO", StringType()),
        StructField("PDF_FILE_NAME", StringType()),
        StructField("PDFFILE_ACCEPTED_DATE", StringType()),
        StructField("PDFFILE", StringType()),
    ]
)

# Derived chunk corpus incl. the U6-widened enrichment columns
# (epa_ingestion.py:252-261, 797-805).
DOCS_CHUNKS_TABLE = StructType(
    [
        StructField("RELATIVE_PATH", StringType()),
        StructField("SIZE", LongType()),
        StructField("FILE_URL", StringType()),
        StructField("SCOPED_FILE_URL", StringType()),
        StructField("CHUNK", StringType()),
        StructField("CATEGORY", StringType()),
        StructField("COMPANYNAME", StringType()),
        StructField("PRODUCTNAME", StringType()),
        StructField("SIGNAL_WORD", StringType()),
        StructField("CATEGORY_EPA_TYPE", ArrayType(StringType())),
    ]
)

# The nested REST payload (epa_ingestion.py:313-393): ~10 scalars + 9
# arrays-of-structs. Parsed with from_json against this schema.
def _arr(*names: str) -> ArrayType:
    return ArrayType(StructType(_s(*names)))


EPA_PAYLOAD = StructType(
    _s(
        "eparegno",
        "productname",
        "registereddate",
        "cancel_flag",
        "cancellationreason",
        "product_status",
        "product_status_date",
        "signal_word",
        "rup_yn",
        "transfer_flag",
    )
    + [
        StructField(
            "companyinfo",
            _arr(
                "name",
                "contact_person",
                "co_division_name",
                "phone",
                "fax",
                "email",
                "street",
                "po_box",
                "city",
                "state",
                "zip_code",
            ),
        ),
        StructField(
            "active_ingredients",
            ArrayType(
                StructType(
                    _s("pc_code", "active_ing", "cas_number")
                    + [StructField("active_ing_percent", DoubleType())]
                )
            ),
        ),
        StructField("sites", _arr("site")),
        StructField("pests", _arr("pest")),
        StructField("formulations", _arr("formulation")),
        StructField("altbrandnames", _arr("altbrandname")),
        StructField("pdffiles", _arr("epa_reg_num", "pdffile", "pdffile_accepted_date")),
        StructField("types", _arr("type")),
        StructField("transfer_history", _arr("previous_eparegno", "previous_company", "transferred_date")),
    ]
)

#: child table name -> (payload array field, child columns in payload order)
CHILD_TABLES: dict[str, tuple[str, StructType]] = {
    "EPA_COMPANY_INFO": ("companyinfo", EPA_COMPANY_INFO),
    "EPA_ACTIVE_INGREDIENTS": ("active_ingredients", EPA_ACTIVE_INGREDIENTS),
    "EPA_SITES": ("sites", EPA_SITES),
    "EPA_PESTS": ("pests", EPA_PESTS),
    "EPA_FORMULATIONS": ("formulations", EPA_FORMULATIONS),
    "EPA_ALT_BRAND_NAMES": ("altbrandnames", EPA_ALT_BRAND_NAMES),
    "EPA_PDF_FILES": ("pdffiles", EPA_PDF_FILES),
    "EPA_TYPES": ("types", EPA_TYPES),
    "EPA_TRANSFER_HISTORY": ("transfer_history", EPA_TRANSFER_HISTORY),
}
