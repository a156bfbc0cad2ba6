"""Multimodal plumbing tests: decode stubs, resize/frame-sample shapes, the
F3 document-parse path, and the full binary-stage -> parse -> chunk ->
index -> search pipeline."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from sf_epa_data_ingestion_spark.functions import text
from sf_epa_data_ingestion_spark.operators import multimodal, search
from sf_epa_data_ingestion_spark.sources.readers import load_binary_stage


def _assets(spark):
    rows = [
        (1, "image", b"\x89PNGfakebytes", (640, 480, None, None, "image/png")),
        (2, "audio", b"RIFFfakewav", (None, None, 16000, 2000, "audio/wav")),
        (3, "video", b"\x00\x00ftypmp4", (1920, 1080, None, 3500, "video/mp4")),
    ]
    return spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)


def test_decode_features_deterministic(spark):
    out = {r["asset_id"]: r for r in multimodal.decode_features(_assets(spark)).collect()}
    assert out[1]["n_bytes"] == len(b"\x89PNGfakebytes")
    assert out[1]["feature"].startswith("image:")
    # determinism: same bytes -> same feature
    again = {r["asset_id"]: r for r in multimodal.decode_features(_assets(spark)).collect()}
    assert out[1]["feature"] == again[1]["feature"]


def test_decode_features_strict_raises(spark):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc_info:
        multimodal.decode_features(_assets(spark), strict=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or "real image/audio" in str(
        exc_info.value
    )


def test_resize_updates_only_images(spark):
    out = {
        r["asset_id"]: r["meta"]
        for r in multimodal.resize_images(_assets(spark), 64, 64).collect()
    }
    assert (out[1]["width"], out[1]["height"]) == (64, 64)
    assert out[2]["sample_rate"] == 16000  # audio meta untouched
    assert out[3]["width"] == 1920  # video meta untouched


def test_sample_frames_schedule(spark):
    frames = multimodal.sample_frames(_assets(spark), every_ms=1000).collect()
    # only the video asset (3500 ms) emits frames: at 0, 1000, 2000, 3000
    assert {r["asset_id"] for r in frames} == {3}
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 1000, 2000, 3000]
    assert len({r["frame_digest"] for r in frames}) == 4  # per-ts digests differ


def test_document_path_end_to_end(spark, tmp_path):
    """S6 binary stage -> F3 parse -> J5 chunk -> X1 index -> lexical hit."""
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    body = (
        b"%PDF-1.4 fake\n"
        b"Pesticide label: spark safety directions and storage instructions. "
        + b"Apply the product carefully near water. " * 40
    )
    with open(os.path.join(stage, "label_one.pdf"), "wb") as f:
        f.write(body)
    with open(os.path.join(stage, "label_two.pdf"), "wb") as f:
        f.write(b"%PDF-1.4 other\nCompletely unrelated mixing ratios table. " * 30)

    files = load_binary_stage(spark, stage)
    parsed = multimodal.parse_documents(files, path_col="relative_path")
    assert {r["parse_status"] for r in parsed.select("parse_status").collect()} == {
        "ascii-fallback"
    }

    chunks = text.chunk_documents(
        parsed.select(F.col("path").alias("doc"), "text"), chunk_size=256, overlap=64
    )
    n_chunks = chunks.count()
    assert n_chunks > 2  # the repeated body must split into several chunks

    ids = chunks.select(
        F.xxhash64("doc", "chunk_index").alias("id"), F.col("chunk")
    )
    postings = search.build_postings(ids, id_col="id", text_col="chunk")
    stats = search.build_token_stats(postings, n_docs=n_chunks)
    hits = search.lexical_search(postings, stats, "safety storage", k=5).collect()
    assert len(hits) > 0  # chunks from label_one rank for its terms


EPA_PDF_DIR = "/root/reference/epa_pdfs"


@pytest.mark.skipif(not os.path.isdir(EPA_PDF_DIR), reason="reference corpus absent")
def test_real_epa_pdfs_end_to_end(spark):
    """F3 with REAL bytes: the reference's 51-PDF golden corpus (SURVEY §5,
    reference entry point 3) through binaryFile scan -> pure-stdlib
    content-stream extraction -> the reference's 1512/256 chunk geometry.
    Verified properties: the extractor (not the ASCII fallback) handles the
    overwhelming majority of the corpus, the text is real label language,
    and the chunker produces a healthy chunk stream from it."""
    files = load_binary_stage(spark, EPA_PDF_DIR, glob="*.pdf")
    parsed = multimodal.parse_documents(files, path_col="relative_path").cache()
    try:
        rows = parsed.collect()
        # 51 on disk; `_USF_0411.pdf` is skipped by Hadoop's hidden-file
        # PathFilter (leading `_`, same rule that hides `_SUCCESS`)
        assert len(rows) == 50
        stdlib_ok = [
            r for r in rows if r["parse_status"] == "stdlib" and len(r["text"] or "") > 500
        ]
        # measured: 47/50 parse via the stdlib rung; the 3 misses are
        # image-only scanned faxes (CCITTFaxDecode, no text layer — OCR
        # territory, beyond any text extractor)
        assert len(stdlib_ok) >= 46
        # the Identity-H composite-font PDF decodes via its ToUnicode CMap
        lifegard = [r for r in stdlib_ok if "LifeGard" in r["path"]]
        assert lifegard and "epa reg" in lifegard[0]["text"].lower()
        corpus = " ".join(r["text"].lower() for r in stdlib_ok)
        for phrase in ("epa", "keep out of reach of children", "precautionary"):
            assert phrase in corpus, f"expected label phrase {phrase!r} in extracted text"

        chunks = text.chunk_documents(
            parsed.filter(F.col("text").isNotNull()).select(
                F.col("path").alias("doc"), "text"
            ),
            chunk_size=1512,
            overlap=256,
        )
        assert chunks.count() > 100
    finally:
        parsed.unpersist()
