"""Distributed REST ingestion (S3/S4/D1/D2 in SURVEY §2).

The reference fetched one product at a time on the driver with a hard
5-second sleep (fetch_epa_data, epa_ingestion.py:107-116; loop :306, sleep
:424) — a 0.2 items/s ceiling. Spark-first version: the id list is a
DataFrame, partitioned across executors; each partition fetches its ids
inside ``mapInPandas`` with a per-partition rate limiter, and *errors
become data* (status/error columns) instead of crashes — the reference's
per-item try/except log-and-continue (epa_ingestion.py:426) as a column.

The HTTP call is injected (``fetcher``) so tests run hermetically and the
EPA endpoint is never hit from CI. At 1000 executors a 0.5 s per-partition
politeness delay still yields ~2000 items/s aggregate — 10^4 × the
reference — while staying polite per connection.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

FETCH_RESULT_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("payload", StringType()),
        StructField("status", StringType(), False),
        StructField("error", StringType()),
    ]
)

Fetcher = Callable[[str], dict | None]


def fetch_payloads(
    ids: DataFrame,
    fetcher: Fetcher,
    id_col: str = "id",
    delay_s: float = 0.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Fan the id list across executors; one JSON payload row per id.

    ``fetcher(id) -> dict`` runs inside the executor; exceptions are
    captured per-row into (status='error', error=msg). ``delay_s`` is the
    per-partition politeness delay between calls (token-bucket analog of
    the reference's sleep, but paid per partition, not per item globally).
    """
    src = ids.select(id_col)
    if num_partitions:
        src = src.repartition(num_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        first = True
        for pdf in batches:
            rows = []
            for item_id in pdf[id_col]:
                if not first and delay_s:
                    time.sleep(delay_s)
                first = False
                try:
                    payload = fetcher(item_id)
                    rows.append(
                        {
                            "id": item_id,
                            "payload": json.dumps(payload) if payload is not None else None,
                            "status": "ok" if payload is not None else "empty",
                            "error": None,
                        }
                    )
                except Exception as exc:  # noqa: BLE001 — errors become data
                    rows.append({"id": item_id, "payload": None, "status": "error", "error": str(exc)})
            yield pd.DataFrame(rows, columns=["id", "payload", "status", "error"])

    return src.mapInPandas(run, schema=FETCH_RESULT_SCHEMA)


def download_binaries(
    work: DataFrame,
    downloader: Callable[[str], bytes],
    url_col: str = "url",
    delay_s: float = 0.0,
) -> DataFrame:
    """S4/D2: distributed binary download; returns url, content, n_bytes,
    status, error. Content is written onward by the caller (e.g. to the
    stage directory) — kept as a column so the write is a normal sink."""
    from pyspark.sql.types import BinaryType, LongType

    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("content", BinaryType()),
            StructField("n_bytes", LongType()),
            StructField("status", StringType(), False),
            StructField("error", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url in pdf[url_col]:
                if delay_s:
                    time.sleep(delay_s)
                try:
                    blob = downloader(url)
                    rows.append(
                        {"url": url, "content": blob, "n_bytes": len(blob), "status": "ok", "error": None}
                    )
                except Exception as exc:  # noqa: BLE001
                    rows.append({"url": url, "content": None, "n_bytes": 0, "status": "error", "error": str(exc)})
            yield pd.DataFrame(rows, columns=["url", "content", "n_bytes", "status", "error"])

    return work.select(url_col).mapInPandas(run, schema=schema)
