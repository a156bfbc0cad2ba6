"""Payload normalization: nested EPA JSON -> parent + 9 child DataFrames.

The reference looped per-payload on the driver, building a pandas frame per
nested array and appending each to the warehouse
(process_and_load_data, epa_ingestion.py:303-427). Spark-first version:
*all* payloads land as one DataFrame of JSON strings, are parsed once with
``from_json`` against the declared schema, and each table is a single
``explode`` + ``select`` over the whole corpus — per-table work is one
distributed plan, not a driver loop.

Semantics parity:
- P8 existence guards (``if data.get('companyinfo')``, epa_ingestion.py:
  339-393): ``explode`` (not explode_outer) drops rows whose array is
  null/empty — same drop-if-absent behavior.
- F6 uppercase column discipline (epa_ingestion.py:325 et al.).
- P3 parent projection of the 10 named scalars (epa_ingestion.py:313-324).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..schemas import CHILD_TABLES, EPA_PAYLOAD, EPA_PRODUCTS


def parse_payloads(spark: SparkSession, payloads: DataFrame, json_col: str = "payload") -> DataFrame:
    """JSON string column -> typed struct column ``data`` (unknown keys
    dropped, missing keys null — schema-on-read parity, SURVEY §1.3)."""
    return payloads.withColumn("data", F.from_json(F.col(json_col), EPA_PAYLOAD))


def products_table(parsed: DataFrame) -> DataFrame:
    """Parent EPA_PRODUCTS rows (epa_ingestion.py:313-324). Rows whose
    payload failed to parse (data null) are dropped, matching the
    reference's per-item try/except skip (epa_ingestion.py:426)."""
    cols = [F.col(f"data.{f.name.lower()}").alias(f.name) for f in EPA_PRODUCTS.fields]
    return parsed.filter(F.col("data").isNotNull()).select(*cols)


def child_table(parsed: DataFrame, table: str) -> DataFrame:
    """One child table: explode the nested array, prefix the FK, uppercase.

    ``explode`` yields zero rows for null/empty arrays — the P8 guard."""
    array_field, schema = CHILD_TABLES[table]
    key = F.col("data.eparegno")
    row = F.explode(F.col(f"data.{array_field}")).alias("row")
    exploded = parsed.filter(F.col("data").isNotNull()).select(key.alias("EPAREGNO"), row)
    cols = [F.col("EPAREGNO")]
    for field in schema.fields:
        if field.name == "EPAREGNO":
            continue
        cols.append(F.col(f"row.{field.name.lower()}").cast(field.dataType).alias(field.name))
    return exploded.select(*cols)


def normalize_all(parsed: DataFrame) -> dict[str, DataFrame]:
    """The full hub-and-spoke decomposition: EPA_PRODUCTS + 9 children."""
    out = {"EPA_PRODUCTS": products_table(parsed)}
    for table in CHILD_TABLES:
        out[table] = child_table(parsed, table)
    return out
