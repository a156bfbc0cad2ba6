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


# ---------------------------------------------------------------------------
# Real stdlib codecs (r5): PNG pixels and WAV samples, not digests
# ---------------------------------------------------------------------------


def test_png_round_trip_all_channel_counts():
    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs

    rng = np.random.default_rng(3)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 17, ch), dtype=np.uint8)
        back = codecs.decode_png(codecs.encode_png(img))
        assert back.shape == img.shape and (back == img).all(), ch


def test_png_decode_handles_all_filter_types():
    """The encoder only emits filter 0; real PNGs use 1-4. Synthesize
    each filter's wire format directly and require exact pixels back."""
    import struct
    import zlib

    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    h, w, ch = img.shape

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    for ftype in (1, 2, 3, 4):
        rows, prev = [], np.zeros(w * ch, dtype=int)
        for y in range(h):
            line = img[y].reshape(-1).astype(int)
            enc = np.zeros(w * ch, dtype=np.uint8)
            for x in range(w * ch):
                left = line[x - ch] if x >= ch else 0
                up, ul = int(prev[x]), (int(prev[x - ch]) if x >= ch else 0)
                pred = {1: left, 2: up, 3: (left + up) >> 1}.get(ftype)
                if pred is None:  # Paeth
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                enc[x] = (line[x] - pred) & 0xFF
            rows.append(bytes([ftype]) + enc.tobytes())
            prev = line
        data = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b"")
        )
        assert (codecs.decode_png(data) == img).all(), ftype


def test_wav_round_trip_and_stereo():
    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs

    t = np.linspace(0, 1, 8000)
    stereo = np.stack([np.sin(40 * t), np.cos(25 * t)], axis=1)
    back, rate = codecs.decode_wav(codecs.encode_wav(stereo, 16000))
    assert rate == 16000 and back.shape == (8000, 2)
    assert np.abs(back - stereo).max() < 1e-3


def test_decode_features_real_png_and_wav(spark):
    """End-to-end through mapInPandas: real PNG and WAV assets produce
    pixel/sample-derived features; a malformed PNG becomes an error row
    (errors-as-data); an undecodable format still raises under strict."""
    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    png = codecs.encode_png(img)
    wav = codecs.encode_wav(np.sin(np.linspace(0, 30, 4000)), 8000)
    bad_png = png[:40]  # truncated: valid signature, broken chunks
    rows = [
        (1, "image", png, (6, 8, None, None, "image/png")),
        (2, "audio", wav, (None, None, 8000, 500, "audio/wav")),
        (3, "image", bad_png, (None, None, None, None, "image/png")),
        (4, "video", b"\x00\x00ftypmp4", (None, None, None, 100, "video/mp4")),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)
    out = {r["asset_id"]: r["feature"] for r in multimodal.decode_features(df).collect()}
    assert out[1] == f"png:6x8x3:mean={img.mean():.3f}"
    assert out[2].startswith("wav:8000hz:4000x1:rms=")
    assert out[3].startswith("error:")
    assert out[4].startswith("video:")  # fake path for real-codec-less formats
    # strict: the video row (no stdlib codec) must still raise
    with pytest.raises(Exception) as exc_info:
        multimodal.decode_features(df, strict=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or "codec" in str(exc_info.value)


def test_resize_images_really_resizes_png(spark):
    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    rows = [
        (1, "image", codecs.encode_png(img), (12, 10, None, None, "image/png")),
        (2, "audio", b"RIFFnotawav", (None, None, 16000, 100, "audio/wav")),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)
    out = {r["asset_id"]: r for r in multimodal.resize_images(df, 5, 4).collect()}
    resized = codecs.decode_png(bytes(out[1]["content"]))
    assert resized.shape == (4, 5, 3)
    assert (resized == codecs.resize_nearest(img, 5, 4)).all()
    assert (out[1]["meta"]["width"], out[1]["meta"]["height"]) == (5, 4)
    assert bytes(out[2]["content"]) == b"RIFFnotawav"  # non-image untouched
    assert out[2]["meta"]["sample_rate"] == 16000


def test_gif_round_trip_and_compositing():
    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs

    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 256, size=(7, 9), dtype=np.uint8) for _ in range(3)]
    out = codecs.decode_gif_frames(codecs.encode_gif(frames, [100, 250, 400]))
    assert [t for t, _ in out] == [100, 350, 750]
    for (_, got), src in zip(out, frames):
        assert got.shape == (7, 9, 3)
        assert (got[:, :, 0] == src).all()  # grayscale palette: R==G==B==index


def test_sample_frames_real_gif(spark):
    """A real animated GIF drives the sampling clock from its own frame
    delays and digests actual composited pixels; an mp4 asset keeps the
    fake-digest schedule from meta duration."""
    import hashlib as _hashlib

    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs

    rng = np.random.default_rng(8)
    frames = [rng.integers(0, 256, size=(5, 6), dtype=np.uint8) for _ in range(2)]
    gif = codecs.encode_gif(frames, [1000, 1500])  # ends at t=2500ms
    rows = [
        (7, "video", gif, (6, 5, None, 99999, "image/gif")),  # meta lies: ignored
        (8, "video", b"\x00\x00ftypmp4", (None, None, None, 2100, "video/mp4")),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)
    out = multimodal.sample_frames(df, every_ms=1000).collect()
    by_asset = {}
    for r in out:
        by_asset.setdefault(r["asset_id"], []).append((r["frame_ts_ms"], r["frame_digest"]))
    # GIF: duration 2500ms -> ts 0,1000,2000; frame 0 shows until 1000
    gif_rows = sorted(by_asset[7])
    assert [t for t, _ in gif_rows] == [0, 1000, 2000]
    decoded = codecs.decode_gif_frames(gif)
    d0 = "gif:" + _hashlib.md5(decoded[0][1].tobytes()).hexdigest()
    d1 = "gif:" + _hashlib.md5(decoded[1][1].tobytes()).hexdigest()
    assert [d for _, d in gif_rows] == [d0, d1, d1]
    # mp4 keeps the fake path over meta duration (0,1000,2000)
    assert [t for t, _ in sorted(by_asset[8])] == [0, 1000, 2000]
    assert all(d.startswith("frame:") for _, d in by_asset[8])


# ---------------------------------------------------------------------------
# Baseline JPEG codec: spec-level pins (the encoder cannot mask decoder
# bugs — expectations below come from ITU-T T.81, not from the encoder)
# ---------------------------------------------------------------------------


def test_jpeg_flat_block_decodes_bit_exact():
    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs

    img = np.full((8, 8), 200, dtype=np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg_gray(img))
    assert out.shape == (8, 8, 1)
    assert (out[:, :, 0] == 200).all()  # DC-only block: exact by spec


def test_jpeg_transform_path_lossless_with_unit_quant(monkeypatch):
    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs

    monkeypatch.setattr(codecs, "STD_LUM_Q", np.ones(64, dtype=np.int32))
    y, x = np.mgrid[0:16, 0:24]
    img = ((y * 3 + x * 5) % 256).astype(np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg_gray(img))[:, :, 0]
    assert (out == img).all()  # unit quant: FDCT->IDCT must round-trip exactly


def test_jpeg_color_subsampling_and_restarts():
    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs

    y, x = np.mgrid[0:33, 0:41]  # odd dims exercise edge cropping
    gray = ((y * 4 + x * 3) % 256).astype(np.uint8)
    img = np.stack([gray] * 3, axis=2)  # constant chroma: 4:2:0 near-lossless
    for subsample in (False, True):
        data = codecs.encode_jpeg_color(img, qscale=0.25, subsample=subsample, restart=2)
        out = codecs.decode_jpeg(data)
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1, subsample


def test_jpeg_feature_and_resize_through_spark(spark):
    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs

    rng = np.random.default_rng(13)
    base = rng.integers(0, 256, size=(4, 5, 3)).astype(np.float64)
    img = np.clip(np.round(np.kron(base, np.ones((8, 8, 1)))), 0, 255).astype(np.uint8)
    jpg = codecs.encode_jpeg_color(img, qscale=0.5, subsample=False)
    rows = [(1, "image", jpg, (40, 32, None, None, "image/jpeg"))]
    df = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)
    feat = multimodal.decode_features(df).collect()[0]["feature"]
    decoded = codecs.decode_jpeg(jpg)
    assert feat == f"jpeg:40x32x3:mean={decoded.mean():.3f}"
    out = multimodal.resize_images(df, 10, 8).collect()[0]
    resized = codecs.decode_jpeg(bytes(out["content"]))
    assert resized.shape == (8, 10, 3)
    # re-encode is lossy (random content, every pixel a block edge after
    # the resize); fine-quant re-encode must stay close to the reference
    expect = codecs.resize_nearest(decoded, 10, 8)
    assert np.abs(resized.astype(int) - expect.astype(int)).mean() < 10


def test_image_dhash_invariances_and_near_dup_pairs(spark):
    """dHash must be invariant to global brightness shift and to moderate
    rescaling of the same scene, and distinct scenes must land far apart;
    image_near_dup_pairs finds exactly the near pairs via the pigeonhole
    Hamming join."""
    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs
    from sf_epa_data_ingestion_spark.operators.multimodal import (
        image_dhash,
        image_near_dup_pairs,
    )

    rng = np.random.default_rng(21)
    # smooth base scene (random 6x8 upsampled) so rescaling is stable
    base = rng.integers(30, 200, size=(6, 8, 3)).astype(np.float64)
    scene = np.clip(np.round(np.kron(base, np.ones((16, 16, 1)))), 0, 255).astype(np.uint8)
    brighter = np.clip(scene.astype(int) + 40, 0, 255).astype(np.uint8)
    rescaled = codecs.resize_nearest(scene, 64, 48)
    other = np.clip(
        np.round(np.kron(rng.integers(30, 200, size=(6, 8, 3)).astype(np.float64),
                         np.ones((16, 16, 1)))), 0, 255
    ).astype(np.uint8)
    rows = [
        (1, "image", codecs.encode_png(scene), (None, None, None, None, "image/png")),
        (2, "image", codecs.encode_png(brighter), (None, None, None, None, "image/png")),
        (3, "image", codecs.encode_jpeg_color(rescaled, qscale=0.25, subsample=False),
         (None, None, None, None, "image/jpeg")),
        (4, "image", codecs.encode_png(other), (None, None, None, None, "image/png")),
        (5, "image", b"not an image at all", (None, None, None, None, "image/bmp")),
        (6, "audio", b"RIFF....WAVE", (None, None, 8000, 10, "audio/wav")),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)
    hashes = {r["id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert set(hashes) == {1, 2, 3, 4}  # undecodable + audio dropped

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(hashes[1], hashes[2]) <= 2   # brightness shift: near-identical
    assert ham(hashes[1], hashes[3]) <= 10  # rescale+jpeg: still near
    assert ham(hashes[1], hashes[4]) > 16   # different scene: far

    pairs = {(r["id_a"], r["id_b"]) for r in image_near_dup_pairs(df, max_hamming=10).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_audio_embedding_discriminates_tones(spark):
    """Real DSP: a 440 Hz tone's log-mel embedding must match its own
    duplicate exactly, sit close to a phase-shifted copy, and separate
    clearly from a high tone and from white noise."""
    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs
    from sf_epa_data_ingestion_spark.operators.multimodal import audio_embedding

    rate = 16000
    t = np.arange(rate) / rate  # 1 s
    tone_low = np.sin(2 * np.pi * 440 * t)
    tone_low_phase = np.sin(2 * np.pi * 440 * t + 1.0)
    tone_high = np.sin(2 * np.pi * 4400 * t)
    rng = np.random.default_rng(17)
    noise = rng.uniform(-0.8, 0.8, size=rate)
    rows = [
        (1, "audio", codecs.encode_wav(tone_low, rate), (None, None, rate, 1000, "audio/wav")),
        (2, "audio", codecs.encode_wav(tone_low, rate), (None, None, rate, 1000, "audio/wav")),
        (3, "audio", codecs.encode_wav(tone_low_phase, rate), (None, None, rate, 1000, "audio/wav")),
        (4, "audio", codecs.encode_wav(tone_high, rate), (None, None, rate, 1000, "audio/wav")),
        (5, "audio", codecs.encode_wav(noise, rate), (None, None, rate, 1000, "audio/wav")),
        (6, "audio", b"RIFFbroken", (None, None, rate, 1, "audio/wav")),
        (7, "image", b"\x89PNGnope", (None, None, None, None, "image/png")),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)
    out = {r["id"]: np.array(r["embedding"]) for r in audio_embedding(df).collect()}
    assert set(out) == {1, 2, 3, 4, 5}  # broken WAV + image dropped

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert (out[1] == out[2]).all()          # identical bytes: identical
    assert cos(out[1], out[3]) > 0.999       # phase shift: near-identical
    assert cos(out[1], out[4]) < 0.97        # different pitch: separated
    assert cos(out[1], out[5]) < 0.97        # noise: separated


def test_sample_frames_real_mjpeg_avi(spark):
    """A real MJPEG AVI: RIFF parse -> JPEG frame decode; the sampling
    schedule comes from the container's fps, digests from real pixels."""
    import hashlib as _hashlib

    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs

    rng = np.random.default_rng(19)
    base = [rng.integers(30, 220, size=(3, 4, 3)).astype(np.float64) for _ in range(4)]
    frames = [
        np.clip(np.round(np.kron(b, np.ones((8, 8, 1)))), 0, 255).astype(np.uint8)
        for b in base
    ]
    avi = codecs.encode_avi_mjpeg(frames, fps=2.0)  # 4 frames -> 2000 ms
    rows = [(9, "video", avi, (32, 24, None, 123, "video/x-msvideo"))]
    df = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)
    out = sorted(
        ((r["frame_ts_ms"], r["frame_digest"]) for r in
         multimodal.sample_frames(df, every_ms=500).collect())
    )
    # duration 2000ms, sampled at 0,500,1000,1500 -> frames 0,1,2,3
    decoded, fps = codecs.decode_avi_frames(avi)
    assert fps == 2.0
    expect = [
        (ts, "avi:" + _hashlib.md5(decoded[min(int(ts * fps / 1000), 3)].tobytes()).hexdigest())
        for ts in (0, 500, 1000, 1500)
    ]
    assert out == expect
    # feature path reports the real container geometry
    feat = multimodal.decode_features(df).collect()[0]["feature"]
    assert feat == "avi:32x24:4f:2.0fps"


def test_audio_embeddings_compose_with_similarity_ops(spark):
    """The multimodal -> similarity composition: log-mel embeddings feed
    operators/similarity.embedding_near_dup_pairs directly — duplicate
    audio clips surface as an exact-cosine near-dup pair."""
    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs
    from sf_epa_data_ingestion_spark.operators import similarity
    from sf_epa_data_ingestion_spark.operators.multimodal import audio_embedding

    rate = 16000
    t = np.arange(rate // 2) / rate
    clips = {
        1: np.sin(2 * np.pi * 330 * t),
        2: np.sin(2 * np.pi * 330 * t),          # exact duplicate of 1
        3: np.sin(2 * np.pi * 330 * t + 0.7),    # phase-shifted near-dup
        4: np.sin(2 * np.pi * 2900 * t),         # different content
    }
    rows = [
        (i, "audio", codecs.encode_wav(x, rate), (None, None, rate, 500, "audio/wav"))
        for i, x in clips.items()
    ]
    df = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)
    emb = audio_embedding(df).select(
        F.col("id").alias("vec_id"),
        F.col("embedding").cast("array<float>").alias("embedding"),
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs(
            emb, threshold=0.999, exact=True
        ).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_mp4_container_metadata_is_real(spark):
    """mp4 sample data is honestly undecodable here, but the ISO-BMFF
    container parses for real: decode_features reports true duration,
    track count and codec fourccs; strict still raises (no pixel path)."""
    from sf_epa_data_ingestion_spark.functions import codecs

    mp4 = codecs.encode_mp4_stub(5500, ["avc1", "mp4a"])
    rows = [(11, "video", mp4, (None, None, None, 999, "video/mp4"))]
    df = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)
    feat = multimodal.decode_features(df).collect()[0]["feature"]
    assert feat == "mp4:2trk:avc1+mp4a:5500ms:samples-undecoded"
    with pytest.raises(Exception) as exc_info:
        multimodal.decode_features(df, strict=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or "codec" in str(exc_info.value)


def test_sample_frames_zero_delay_gif(spark):
    """An animated GIF whose frame delays are all 0 (players clamp these
    to ~100ms) has cumulative duration 0; it must still surface one row
    at ts=0 with the first composited frame instead of vanishing
    (advisor finding, round 5)."""
    import hashlib as _hashlib

    import numpy as np

    from sf_epa_data_ingestion_spark.functions import codecs

    rng = np.random.default_rng(12)
    frames = [rng.integers(0, 256, size=(4, 4), dtype=np.uint8) for _ in range(3)]
    gif = codecs.encode_gif(frames, [0, 0, 0])
    rows = [(21, "video", gif, (4, 4, None, None, "image/gif"))]
    df = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)
    out = multimodal.sample_frames(df, every_ms=1000).collect()
    assert len(out) == 1
    decoded = codecs.decode_gif_frames(gif)
    assert out[0]["frame_ts_ms"] == 0
    assert out[0]["frame_digest"] == (
        "gif:" + _hashlib.md5(decoded[0][1].tobytes()).hexdigest()
    )


def test_parse_mp4_meta_rejects_overlong_trailing_box():
    """A trailing box whose declared size overruns the file must raise
    'truncated box' — the old bounds check tolerated up to 8 bytes of
    overrun (advisor finding, round 5)."""
    import struct

    import pytest

    from sf_epa_data_ingestion_spark.functions import codecs

    good = codecs.encode_mp4_stub(1000, ["avc1"])
    assert codecs.parse_mp4_meta(good)["duration_ms"] == 1000
    # append a box claiming 4 bytes more than remain (<= 8-byte overrun,
    # which the loose check used to let through)
    bad = good + struct.pack(">I", 12) + b"free"  # 12-byte box, 8 present
    with pytest.raises(ValueError, match="truncated box"):
        codecs.parse_mp4_meta(bad)
