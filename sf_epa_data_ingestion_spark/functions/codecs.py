"""Pure-stdlib media codecs for the multimodal operators.

The container has no PIL/librosa/ffmpeg, but two of the three big
modalities have formats whose codecs need nothing beyond the standard
library: PNG is zlib (stdlib) + per-row unfiltering, and WAV is RIFF
framing around raw PCM (stdlib ``wave``). Implementing those for real —
instead of stubbing every decode — means the multimodal pipeline
(operators/multimodal.py) does genuine pixel/sample work end-to-end for
PNG images and PCM WAV audio; only JPEG (DCT) and video containers stay
behind the documented fake, because their codecs genuinely need
libraries this environment lacks.

PNG support: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA); all five scanline filters; single IDAT stream
(multiple IDAT chunks are concatenated per spec). Interlaced (Adam7)
images are rejected — rare in training corpora and decodable only with
seven-pass logic that isn't worth the surface here.

Everything returns/accepts numpy arrays (H, W, C) uint8; the encoder
exists so tests can synthesize corpora without fixtures on disk.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bool(data) and data[:8] == _PNG_MAGIC


def is_wav(data: bytes) -> bool:
    return bool(data) and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array. Raises ValueError on anything
    outside the supported profile (the caller routes that to the
    error-as-data path, same as PDF parsing)."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth}")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported color type {color}")
    if interlace:
        raise ValueError("interlaced (Adam7) PNG not supported")
    ch = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub — sequential in x, loop over pixels
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif ftype == 2:  # Up
            line += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                up = int(prev[x])
                ul = int(prev[x - ch]) if x >= ch else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = line
        prev = line
    img = out.reshape(height, width, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        img = plte[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """(H, W, C) or (H, W) uint8 -> PNG bytes (filter 0 rows, one IDAT).
    Exists so tests can synthesize image corpora without binary fixtures."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize via index maps — the
    library-free resize used by operators/multimodal.resize_images."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples float64 in [-1, 1] shaped (n, channels),
    sample_rate). 8/16/32-bit integer PCM via the stdlib ``wave``
    module."""
    with wave.open(io.BytesIO(data)) as f:
        rate = f.getframerate()
        n_ch = f.getnchannels()
        width = f.getsampwidth()
        frames = f.readframes(f.getnframes())
    if width == 1:  # unsigned 8-bit
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    return x.reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, channels) float in [-1, 1] -> 16-bit PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# GIF (LZW is pure bit-twiddling — no external codec needed), enough to make
# video-style frame sampling REAL for one actual animated format.
# ---------------------------------------------------------------------------

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes) -> bool:
    return bool(data) and data[:6] in _GIF_MAGICS


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: variable code width starting at min_code_size+1,
    CLEAR resets the table, EOI terminates."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset():
        nonlocal table, width, next_code
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1
        next_code = eoi + 1

    width = next_code = 0
    reset()
    acc = nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                table.append(prev + [entry[0]])
                next_code += 1
            else:  # KwKwK case
                entry = prev + [prev[0]]
                table.append(entry)
                next_code += 1
            out.extend(entry)
            prev = entry
            if next_code == (1 << width) and width < 12:
                width += 1
    return out


def decode_gif_frames(data: bytes) -> list[tuple[int, np.ndarray]]:
    """GIF bytes -> [(cumulative_delay_ms, (H, W, 3) uint8 RGB frame)].

    Frames are composited onto the logical-screen canvas honoring
    transparency and disposal methods 0/1 (draw over) and 2 (restore to
    background); method 3 (restore-previous) is treated as 2 — rare, and
    the error is bounded to the next frame's untouched region. Raises
    ValueError outside the supported profile."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    w, h = struct.unpack("<HH", data[6:10])
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    frames: list[tuple[int, np.ndarray]] = []
    t_ms = 0
    delay_ms, transparent, disposal = 0, None, 0
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # graphics control
                size = data[pos]
                gflags = data[pos + 1]
                delay_ms = struct.unpack("<H", data[pos + 2 : pos + 4])[0] * 10
                transparent = data[pos + 4] if gflags & 1 else None
                disposal = (gflags >> 2) & 7
                pos += size + 1
            while data[pos] != 0:  # skip (remaining) sub-blocks
                pos += data[pos] + 1
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            ix, iy, iw, ih = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            iflags = data[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
                pos += 3 * n
            if iflags & 0x40:
                raise ValueError("interlaced GIF not supported")
            if ct is None:
                raise ValueError("image without color table")
            min_code = data[pos]
            pos += 1
            chunks = []
            while data[pos] != 0:
                ln = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + ln])
                pos += ln + 1
            pos += 1
            idx = np.array(_lzw_decode(b"".join(chunks), min_code), dtype=np.int32)
            if idx.size != iw * ih:
                raise ValueError("LZW pixel count mismatch")
            idx = idx.reshape(ih, iw)
            region = canvas[iy : iy + ih, ix : ix + iw]
            rgb = ct[idx.clip(0, len(ct) - 1)]
            if transparent is not None:
                mask = (idx != transparent)[:, :, None]
                region[:] = np.where(mask, rgb, region)
            else:
                region[:] = rgb
            t_ms += delay_ms
            frames.append((t_ms, canvas.copy()))
            if disposal == 2 or disposal == 3:
                canvas[iy : iy + ih, ix : ix + iw] = 0
            delay_ms, transparent, disposal = 0, None, 0
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    return frames


def encode_gif(frames: list[np.ndarray], delays_ms: list[int]) -> bytes:
    """Minimal animated-GIF encoder for tests: one global 256-entry
    grayscale palette, each (H, W) uint8 frame stored as its own image
    with LZW root codes + periodic CLEAR (valid, uncompressed-style)."""
    h, w = frames[0].shape
    out = [b"GIF89a", struct.pack("<HH", w, h), bytes([0xF7, 0, 0])]
    out.append(bytes(v for i in range(256) for v in (i, i, i)))  # gray GCT
    for img, delay in zip(frames, delays_ms):
        out.append(b"\x21\xf9\x04\x00" + struct.pack("<H", delay // 10) + b"\x00\x00")
        out.append(b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00")
        min_code = 8
        clear = 1 << min_code
        codes: list[int] = []
        for i, px in enumerate(img.reshape(-1).tolist()):
            if i % 200 == 0:
                codes.append(clear)  # keep width at 9 bits throughout
            codes.append(px)
        codes.append(clear + 1)  # EOI
        acc = nbits = 0
        payload = bytearray()
        for c in codes:
            acc |= c << nbits
            nbits += 9
            while nbits >= 8:
                payload.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            payload.append(acc & 0xFF)
        out.append(bytes([min_code]))
        for i in range(0, len(payload), 255):
            block = payload[i : i + 255]
            out.append(bytes([len(block)]) + bytes(block))
        out.append(b"\x00")
    out.append(b"\x3b")
    return b"".join(out)
