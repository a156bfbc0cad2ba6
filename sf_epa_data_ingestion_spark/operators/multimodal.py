"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The reference's binary path is PDFs in a file stage queried through a
directory table (epa_ingestion.py:485-494) and parsed by a warehouse
built-in (PARSE_DOCUMENT, epa_ingestion.py:763). Generalized here for
training-data pipelines: every asset is a row with

    asset_id bigint, modality string, content binary,
    meta struct<width int, height int, sample_rate int,
               duration_ms bigint, mime string>

The Spark-side plumbing (schema, partition sizing, UDF signatures, batch
shapes) is real and tested; the actual codec work is stubbed because
image/audio libraries are not in this environment — each stub either
raises ``NotImplementedError`` (strict mode) or produces a deterministic
fake derived from the bytes (test mode), clearly marked below.

Scale notes: binary rows are large — ``mapInPandas`` streams Arrow batches
so executor memory holds one batch, not one partition; keep
``spark.sql.files.maxPartitionBytes`` at 128 MB so scan tasks stay bounded,
and avoid shuffling content columns (project metadata first, join content
back by id only when needed).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_META = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("mime", StringType()),
    ]
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("content", BinaryType()),
        StructField("meta", ASSET_META),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("feature", StringType()),
    ]
)


def _fake_decode(content: bytes, modality: str) -> str:
    """STUB — deterministic fake standing in for a real decoder
    (PIL/librosa/ffmpeg are not installed in this container). Produces a
    stable pseudo-feature from the bytes so plumbing is end-to-end
    testable. Replace the body with the real codec in production."""
    h = hashlib.sha256(content or b"").hexdigest()
    return f"{modality}:{h[:16]}"


def decode_features(assets: DataFrame, strict: bool = False) -> DataFrame:
    """Decode/feature-extract each asset via ``mapInPandas``.

    ``strict=True`` raises NotImplementedError at the decode site — the
    documented behavior when real codecs are required but unavailable.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real image/audio/video decoding requires codec libraries "
                    "not present in this environment; run with strict=False "
                    "for the deterministic fake path"
                )
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "digest": pdf["content"].map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "feature": [
                        _fake_decode(c, m)
                        for c, m in zip(pdf["content"], pdf["modality"])
                    ],
                }
            )
            yield out

    return assets.mapInPandas(gen, schema=FEATURE_SCHEMA)


def parse_documents(
    files: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    strict: bool = False,
) -> DataFrame:
    """F3: PDF -> layout text (the reference's ``PARSE_DOCUMENT(@stage,
    relative_path, {'mode':'LAYOUT'})``, epa_ingestion.py:763-764), as an
    Arrow-batched pandas UDF over a ``binaryFile``-shaped DataFrame.

    Parser ladder, per document:
    1. ``pypdf`` when installed (full-fidelity);
    2. the repo's pure-stdlib content-stream extractor
       (``functions/pdf.py`` — FlateDecode + Tj/TJ tokenizer; real text,
       verified against the reference's 51-PDF golden corpus);
    3. printable-ASCII runs, only when 2 yields nothing AND
       ``strict=False`` (e.g. non-Flate encodings).
    ``strict=True`` reports rung-2 misses as ``parse_status='empty'``
    instead of falling back — the production posture where garbage text
    is worse than a parse failure routed to a retry queue.
    """
    out_schema = StructType(
        [
            StructField("path", StringType()),
            StructField("text", StringType()),
            StructField("parse_status", StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import pypdf  # type: ignore

            have_pypdf = True
        except ImportError:
            have_pypdf = False
        import io as _io
        import re as _re

        from ..functions.pdf import extract_text as _stdlib_extract

        for pdf in batches:
            rows = []
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                try:
                    if have_pypdf:
                        reader = pypdf.PdfReader(_io.BytesIO(blob))
                        text = "\n\n".join(p.extract_text() or "" for p in reader.pages)
                        status = "pypdf"
                    else:
                        text = _stdlib_extract(blob or b"")
                        status = "stdlib"
                        if not text.strip():
                            if strict:
                                status = "empty"
                            else:
                                runs = _re.findall(rb"[\x20-\x7e]{4,}", blob or b"")
                                text = "\n".join(r.decode("ascii") for r in runs)
                                status = "ascii-fallback"
                    rows.append({"path": path, "text": text, "parse_status": status})
                except Exception as exc:  # noqa: BLE001 — errors become data
                    rows.append({"path": path, "text": None, "parse_status": f"error: {exc}"})
            yield pd.DataFrame(rows, columns=["path", "text", "parse_status"])

    return files.select(
        F.col(path_col).alias(path_col), F.col(content_col).alias(content_col)
    ).mapInPandas(gen, schema=out_schema)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """STUB image resize: passes bytes through and records the requested
    geometry in ``meta`` (real implementation: PIL in the pandas UDF).
    The Spark plumbing — struct update without shuffling content — is real."""
    return assets.withColumn(
        "meta",
        F.when(
            F.col("modality") == "image",
            F.struct(
                F.lit(width).alias("width"),
                F.lit(height).alias("height"),
                F.col("meta.sample_rate").alias("sample_rate"),
                F.col("meta.duration_ms").alias("duration_ms"),
                F.col("meta.mime").alias("mime"),
            ),
        ).otherwise(F.col("meta")),
    )


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB video frame sampling: emits one row per sampled timestamp with
    a deterministic fake frame digest (real implementation: ffmpeg/pyav in
    mapInPandas). Output schema: asset_id, frame_ts_ms, frame_digest."""
    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("frame_ts_ms", LongType(), False),
            StructField("frame_digest", StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["modality"] != "video":
                    continue
                dur = (r["meta"]["duration_ms"] or 0) if r["meta"] is not None else 0
                for ts in range(0, int(dur), every_ms):
                    rows.append(
                        {
                            "asset_id": r["asset_id"],
                            "frame_ts_ms": ts,
                            "frame_digest": _fake_decode(
                                (r["content"] or b"") + ts.to_bytes(8, "little"), "frame"
                            ),
                        }
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_ts_ms", "frame_digest"])

    return assets.mapInPandas(gen, schema=out_schema)
