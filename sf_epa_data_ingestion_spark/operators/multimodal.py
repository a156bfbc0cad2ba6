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
shapes) is real and tested. Codec status (r5): PNG, baseline JPEG and
GIF images plus PCM WAV audio decode FOR REAL via the pure-stdlib/numpy
codecs in ``functions/codecs.py`` (zlib + scanline unfiltering; huffman
+ 8x8 DCT; variable-width LZW with disposal compositing; RIFF/PCM via
the stdlib ``wave`` module) — pixels and samples, not digests.
``resize_images`` re-encodes genuinely resized PNGs and JPEGs, and
``sample_frames`` walks real GIF frame delays and real MJPEG-AVI
streams (RIFF parse + per-frame JPEG decode). Only formats whose codecs
truly need external libraries (mp4/h264, exotic image formats) remain
behind a deterministic fake: strict mode
raises ``NotImplementedError`` at those decode sites, test mode derives
a stable pseudo-feature from the bytes, both clearly marked below.

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
    """STUB — deterministic fake standing in for decoders whose codecs
    genuinely need external libraries (mp4-style containers, exotic
    image formats). Produces a stable pseudo-feature from the bytes so
    plumbing is end-to-end testable. PNG, baseline JPEG, GIF and WAV
    never reach this — they take the real codecs in
    ``functions/codecs.py``."""
    h = hashlib.sha256(content or b"").hexdigest()
    return f"{modality}:{h[:16]}"


def _real_feature(content: bytes) -> str | None:
    """Real decode for the formats the stdlib+numpy codecs handle: PNG
    and baseline-JPEG pixels (geometry + mean intensity), GIF animation
    shape (frames + duration), PCM WAV samples (rate, shape, RMS).
    Returns None for anything else — caller picks fake/strict."""
    from sf_epa_data_ingestion_spark.functions import codecs

    if codecs.is_png(content):
        img = codecs.decode_png(content)
        h, w, ch = img.shape
        return f"png:{w}x{h}x{ch}:mean={img.mean():.3f}"
    if codecs.is_jpeg(content):
        img = codecs.decode_jpeg(content)
        h, w, ch = img.shape
        return f"jpeg:{w}x{h}x{ch}:mean={img.mean():.3f}"
    if codecs.is_gif(content):
        frames = codecs.decode_gif_frames(content)
        if not frames:
            raise ValueError("GIF with no frames")
        dur, last = frames[-1]
        return f"gif:{last.shape[1]}x{last.shape[0]}:{len(frames)}f:{dur}ms"
    if codecs.is_wav(content):
        samples, rate = codecs.decode_wav(content)
        rms = float((samples**2).mean() ** 0.5) if samples.size else 0.0
        return f"wav:{rate}hz:{samples.shape[0]}x{samples.shape[1]}:rms={rms:.4f}"
    if codecs.is_avi(content):
        frames, fps = codecs.decode_avi_frames(content)
        if not frames:
            raise ValueError("AVI with no frames")
        h, w = frames[0].shape[:2]
        return f"avi:{w}x{h}:{len(frames)}f:{fps:.1f}fps"
    return None


def decode_features(assets: DataFrame, strict: bool = False) -> DataFrame:
    """Decode/feature-extract each asset via ``mapInPandas``.

    PNG, baseline JPEG, GIF, MJPEG-AVI and PCM WAV content decodes for
    real (``functions/codecs.py``), and mp4 reports true container
    metadata; when ``strict=False`` a malformed real-format asset
    becomes an ``error:`` feature row (errors-as-data, same posture as
    PDF parsing) rather than failing the batch — ``strict=True``
    re-raises decode errors and fails the batch, the fail-loud mode for
    pipelines that must not silently drop assets. For content without a
    stdlib codec,
    ``strict=True`` raises NotImplementedError at the decode site — the
    documented behavior when real codecs are required but unavailable —
    and ``strict=False`` emits the deterministic fake."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            features = []
            for c, m in zip(pdf["content"], pdf["modality"]):
                c = bytes(c) if c is not None else b""
                try:
                    feat = _real_feature(c)
                # malformed real-format bytes surface as ValueError from the
                # codecs' own checks OR as low-level decode errors
                # (IndexError / struct.error / zlib.error / wave.Error on
                # truncated streams) — all become error rows, not batch
                # failures
                except Exception as exc:  # noqa: BLE001 — errors become data
                    if strict:
                        raise
                    feat = f"error: {exc.__class__.__name__}: {exc}"
                if feat is None:
                    if strict:
                        raise NotImplementedError(
                            f"real {m} decoding for this format requires codec "
                            "libraries not present in this environment; only "
                            "PNG/baseline-JPEG/GIF images, MJPEG-AVI video "
                            "and PCM WAV audio decode natively — run with "
                            "strict=False for the metadata/fake path"
                        )
                    from sf_epa_data_ingestion_spark.functions import codecs

                    if codecs.is_mp4(c):
                        # the ISO-BMFF CONTAINER parses without codecs —
                        # report real duration/tracks/fourccs; only the
                        # h264/h265 sample data stays undecodable
                        try:
                            mm = codecs.parse_mp4_meta(c)
                            feat = (
                                f"mp4:{mm['n_tracks']}trk:"
                                f"{'+'.join(mm['codecs']) or 'none'}:"
                                f"{mm['duration_ms']}ms:samples-undecoded"
                            )
                        except Exception:  # noqa: BLE001 — malformed box tree
                            feat = _fake_decode(c, m)
                    else:
                        feat = _fake_decode(c, m)
                features.append(feat)
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "digest": pdf["content"].map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "feature": features,
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
    """Resize image assets to (width, height).

    PNG content is resized FOR REAL: decode (functions/codecs.py) →
    nearest-neighbor index-map resize → re-encode; content bytes AND meta
    geometry both change. Non-PNG image formats keep the stub behavior
    (bytes pass through, meta records the requested geometry) — their
    codecs need libraries this environment lacks. Non-image assets are
    untouched. One mapInPandas, no shuffle of content."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sf_epa_data_ingestion_spark.functions import codecs

        for pdf in batches:
            contents, metas = [], []
            for c, m, meta in zip(pdf["content"], pdf["modality"], pdf["meta"]):
                meta = dict(meta) if meta is not None else {
                    "width": None, "height": None, "sample_rate": None,
                    "duration_ms": None, "mime": None,
                }
                if m == "image":
                    raw = bytes(c) if c is not None else b""
                    try:
                        if codecs.is_png(raw):
                            img = codecs.decode_png(raw)
                            c = codecs.encode_png(
                                codecs.resize_nearest(img, width, height)
                            )
                        elif codecs.is_jpeg(raw):
                            img = codecs.resize_nearest(
                                codecs.decode_jpeg(raw), width, height
                            )
                            # qscale 0.25: resized assets re-encode at high
                            # fidelity — resizing shouldn't add quant loss
                            c = (
                                codecs.encode_jpeg_gray(img[:, :, 0], qscale=0.25)
                                if img.shape[2] == 1
                                else codecs.encode_jpeg_color(
                                    img, qscale=0.25, subsample=False
                                )
                            )
                    except Exception:  # noqa: BLE001 — malformed content:
                        pass  # stub behavior (meta only)
                    meta = {**meta, "width": width, "height": height}
                contents.append(c)
                metas.append(meta)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "content": contents,
                    "meta": metas,
                }
            )

    return assets.mapInPandas(gen, schema=ASSET_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one row per sampled timestamp with a digest
    of the frame displayed at that instant.

    Animated GIF content decodes FOR REAL (functions/codecs.py: LZW +
    disposal-aware compositing): the sampling clock walks the actual
    frame delays, the emitted digest is md5 of the composited RGB
    pixels, and the schedule covers the true animation duration (meta
    duration_ms is ignored for GIFs — the container knows better).
    Other containers (mp4 etc.) genuinely need ffmpeg/pyav and keep the
    deterministic fake digest over the meta-declared duration. Output
    schema: asset_id, frame_ts_ms, frame_digest."""
    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("frame_ts_ms", LongType(), False),
            StructField("frame_digest", StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sf_epa_data_ingestion_spark.functions import codecs

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["modality"] != "video":
                    continue
                content = bytes(r["content"]) if r["content"] is not None else b""
                if codecs.is_avi(content):
                    # real container: frame timestamps from the stream fps
                    try:
                        avi_frames, fps = codecs.decode_avi_frames(content)
                    except Exception:  # noqa: BLE001 — malformed AVI
                        avi_frames, fps = [], 1.0
                    dur = int(len(avi_frames) / fps * 1000)
                    for ts in range(0, dur, every_ms):
                        fi = min(int(ts * fps / 1000), len(avi_frames) - 1)
                        rows.append(
                            {
                                "asset_id": r["asset_id"],
                                "frame_ts_ms": ts,
                                "frame_digest": "avi:"
                                + hashlib.md5(avi_frames[fi].tobytes()).hexdigest(),
                            }
                        )
                    continue
                if codecs.is_gif(content):
                    try:
                        frames = codecs.decode_gif_frames(content)
                    except Exception:  # noqa: BLE001 — malformed GIF
                        frames = []
                    dur = frames[-1][0] if frames else 0
                    if frames and dur <= 0:
                        # all-zero frame delays (players clamp to ~100ms):
                        # cumulative duration is 0, so the sampling loop
                        # below would emit nothing — keep the asset visible
                        # with one row at ts=0, the first composited frame
                        rows.append(
                            {
                                "asset_id": r["asset_id"],
                                "frame_ts_ms": 0,
                                "frame_digest": "gif:"
                                + hashlib.md5(frames[0][1].tobytes()).hexdigest(),
                            }
                        )
                        continue
                    fi = 0
                    for ts in range(0, int(dur), every_ms):
                        # frame displayed at ts = first frame whose
                        # cumulative end-time exceeds ts (ts grows
                        # monotonically, so the cursor never rewinds)
                        while fi < len(frames) - 1 and frames[fi][0] <= ts:
                            fi += 1
                        rows.append(
                            {
                                "asset_id": r["asset_id"],
                                "frame_ts_ms": ts,
                                "frame_digest": "gif:"
                                + hashlib.md5(frames[fi][1].tobytes()).hexdigest(),
                            }
                        )
                    continue
                dur = (r["meta"]["duration_ms"] or 0) if r["meta"] is not None else 0
                for ts in range(0, int(dur), every_ms):
                    rows.append(
                        {
                            "asset_id": r["asset_id"],
                            "frame_ts_ms": ts,
                            "frame_digest": _fake_decode(
                                content + ts.to_bytes(8, "little"), "frame"
                            ),
                        }
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_ts_ms", "frame_digest"])

    return assets.mapInPandas(gen, schema=out_schema)


def image_dhash(assets: DataFrame) -> DataFrame:
    """64-bit difference hash per decodable image: decode (PNG / baseline
    JPEG / first GIF frame), average channels to gray, nearest-resize to
    9x8, set bit (row*8+col) iff pixel[row, col+1] > pixel[row, col].
    dHash is brightness- and scale-invariant enough to catch re-encoded /
    resized copies — the image analog of SimHash for text.

    Returns (id, dhash) for assets whose content decoded; undecodable or
    non-image rows are dropped (they can't carry a perceptual hash).
    Scan-shaped: one mapInPandas, no shuffle.
    """
    out_schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("dhash", LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from sf_epa_data_ingestion_spark.functions import codecs

        for pdf in batches:
            ids, hashes = [], []
            for aid, m, c in zip(pdf["asset_id"], pdf["modality"], pdf["content"]):
                if m != "image" and m != "video":
                    continue
                raw = bytes(c) if c is not None else b""
                try:
                    if codecs.is_png(raw):
                        img = codecs.decode_png(raw)
                    elif codecs.is_jpeg(raw):
                        img = codecs.decode_jpeg(raw)
                    elif codecs.is_gif(raw):
                        frames = codecs.decode_gif_frames(raw)
                        if not frames:
                            continue
                        img = frames[0][1]
                    elif codecs.is_avi(raw):
                        avi_frames, _fps = codecs.decode_avi_frames(raw)
                        if not avi_frames:
                            continue
                        img = avi_frames[0]
                    else:
                        continue
                except Exception:  # noqa: BLE001 — undecodable: no hash
                    continue
                gray = img.astype(np.float64).mean(axis=2)
                small = codecs.resize_nearest(gray, 9, 8)  # (8 rows, 9 cols)
                bits = (small[:, 1:] > small[:, :-1]).reshape(-1)  # 64 bits
                h = 0
                for i, b in enumerate(bits):
                    if b:
                        h |= 1 << i
                ids.append(int(aid))
                hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame({"id": ids, "dhash": hashes})

    return assets.mapInPandas(gen, schema=out_schema)


def image_near_dup_pairs(assets: DataFrame, max_hamming: int = 10) -> DataFrame:
    """Near-duplicate image pairs: real-decoded dHash signatures joined by
    the same 4-block pigeonhole Hamming join the text SimHash path uses
    (``operators/dedup.hamming_near_pairs``) — candidate generation is 4
    hash joins on 16-bit blocks, never an all-pairs compare, so the
    multimodal dedup path scales exactly like the text one.
    Returns (id_a, id_b, hamming)."""
    from sf_epa_data_ingestion_spark.operators.dedup import hamming_near_pairs

    return hamming_near_pairs(image_dhash(assets), "dhash", max_hamming)


def audio_embedding(
    assets: DataFrame,
    n_mels: int = 32,
    frame: int = 400,
    hop: int = 160,
) -> DataFrame:
    """Real audio feature extraction for PCM WAV assets: frame the mono
    mix (``frame`` samples, ``hop`` step), Hann window, rFFT power
    spectrum, triangular mel filterbank (HTK 2595*log10(1+f/700) spacing
    over 0..rate/2), log-compress, then average over time — a fixed-size
    ``array<float>`` embedding per asset, directly composable with the
    similarity operators (brute-force / LSH cosine top-k, embedding
    near-dup) for audio-level dedup.

    All numpy inside one ``mapInPandas`` — scan-shaped, no shuffle.
    Undecodable or non-WAV rows are dropped. Returns
    (id, embedding, sample_rate, n_frames).
    """
    from pyspark.sql.types import ArrayType, FloatType

    out_schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("embedding", ArrayType(FloatType())),
            StructField("sample_rate", IntegerType()),
            StructField("n_frames", IntegerType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from sf_epa_data_ingestion_spark.functions import codecs

        window = np.hanning(frame)
        n_bins = frame // 2 + 1

        def mel_bank(rate: int) -> np.ndarray:
            def mel(f):
                return 2595.0 * np.log10(1.0 + f / 700.0)

            def imel(m):
                return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

            edges_hz = imel(np.linspace(0.0, mel(rate / 2.0), n_mels + 2))
            bin_hz = np.arange(n_bins) * rate / frame
            bank = np.zeros((n_mels, n_bins))
            for m in range(n_mels):
                lo, mid, hi = edges_hz[m], edges_hz[m + 1], edges_hz[m + 2]
                up = (bin_hz - lo) / max(mid - lo, 1e-9)
                down = (hi - bin_hz) / max(hi - mid, 1e-9)
                bank[m] = np.clip(np.minimum(up, down), 0.0, None)
            return bank

        for pdf in batches:
            rows = []
            for aid, c in zip(pdf["asset_id"], pdf["content"]):
                raw = bytes(c) if c is not None else b""
                if not codecs.is_wav(raw):
                    continue
                try:
                    samples, rate = codecs.decode_wav(raw)
                except Exception:  # noqa: BLE001 — undecodable: skip
                    continue
                mono = samples.mean(axis=1)
                if mono.size < frame:
                    mono = np.pad(mono, (0, frame - mono.size))
                n_frames = 1 + (mono.size - frame) // hop
                idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
                frames = mono[idx] * window[None, :]
                power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
                mels = np.log10(power @ mel_bank(rate).T + 1e-10)
                emb = mels.mean(axis=0).astype(np.float32)
                rows.append(
                    {
                        "id": int(aid),
                        "embedding": emb,
                        "sample_rate": int(rate),
                        "n_frames": int(n_frames),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["id", "embedding", "sample_rate", "n_frames"]
            )

    return assets.mapInPandas(gen, schema=out_schema)
