"""Pure-stdlib/numpy media codecs for the multimodal operators.

The container has no PIL/librosa/ffmpeg, but the dominant training-
corpus formats are decodable with nothing beyond the standard library
plus numpy: PNG is zlib + per-row unfiltering, WAV is RIFF framing
around raw PCM (stdlib ``wave``), GIF is variable-width LZW, and
baseline JPEG is huffman coding + an 8x8 DCT — pure arithmetic.
Implementing those for real — instead of stubbing every decode — means
the multimodal pipeline (operators/multimodal.py) does genuine
pixel/sample work end-to-end — including MJPEG-AVI video (RIFF framing
around JPEG frames) and real mp4 CONTAINER metadata (ISO-BMFF box
walk); only compressed video sample data (h264/h265) and exotic image
formats stay behind the documented fake.

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


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81 sequential DCT). Huffman coding and the 8x8
# DCT are pure arithmetic — numpy covers them without external codecs.
# Decoder profile: SOF0, 8-bit, grayscale or YCbCr at 4:4:4 / 4:2:2 /
# 4:2:0, restart markers; progressive (SOF2) and arithmetic coding are
# rejected with ValueError. The encoder exists for tests and for
# resize_images' re-encode: Annex K tables, uniform quality scale, no
# optimized huffman — correct output, not a size-optimal one. Correctness
# is pinned spec-level in tests: a flat block must decode bit-exact (DC
# path vs the standard), an all-ones quant table round-trips a gradient
# with zero error (transform path), and constant-chroma content survives
# 4:2:0 within +-1 (subsampling path) — the encoder cannot mask decoder
# bugs because those expectations come from the spec, not from the
# encoder. Per-block Python loops: fine for the asset sizes the tests
# and feature extraction touch; swap in a C codec at production scale.
# ---------------------------------------------------------------------------


ZIGZAG = np.array([
     0, 1, 8,16, 9, 2, 3,10,17,24,32,25,18,11, 4, 5,
    12,19,26,33,40,48,41,34,27,20,13, 6, 7,14,21,28,
    35,42,49,56,57,50,43,36,29,22,15,23,30,37,44,51,
    58,59,52,45,38,31,39,46,53,60,61,54,47,55,62,63], dtype=np.int32)

def _idct_matrix():
    # 8x8 DCT-III basis: x = C^T X C with scale factors
    k = np.arange(8)
    C = np.cos((2*k[:, None] + 1) * k[None, :] * np.pi / 16)  # (n, u)
    a = np.full(8, np.sqrt(2/8)); a[0] = np.sqrt(1/8)
    return C * a[None, :]

_IDCT = _idct_matrix()

def idct2(block):  # block: (..., 8, 8) coefficients (u,v)
    return _IDCT @ block @ _IDCT.T

def fdct2(pix):
    return _IDCT.T @ pix @ _IDCT

def is_jpeg(data: bytes) -> bool:
    return bool(data) and data[:2] == b"\xff\xd8"


class _BitReader:
    def __init__(self, data, pos):
        self.data, self.pos = data, pos
        self.acc, self.n = 0, 0
    def bits(self, n):
        if n == 0: return 0
        while self.n < n:
            self._fill_one()
        v = (self.acc >> (self.n - n)) & ((1 << n) - 1)
        self.n -= n
        self.acc &= (1 << self.n) - 1
        return v
    def _fill_one(self):
        if self.pos >= len(self.data):
            self.acc = (self.acc << 8); self.n += 8; return
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos+1] if self.pos+1 < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 2
                self.acc = (self.acc << 8) | 0xFF; self.n += 8; return
            else:
                # marker: pad zeros, do not consume
                self.acc = (self.acc << 8); self.n += 8; return
        self.pos += 1
        self.acc = (self.acc << 8) | b; self.n += 8
    def align_restart(self):
        # drop partial bits, expect FFD0-FFD7, consume it
        self.acc, self.n = 0, 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos+1] <= 0xD7:
                self.pos += 2
                return True
            self.pos += 1
        return False

def _build_huff(bits_counts, symbols):
    """Return dict code->(length, symbol) lookup via (length, code)."""
    lut = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits_counts[ln-1]):
            lut[(ln, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return lut

def _read_huff_symbol(br, lut):
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bits(1)
        s = lut.get((ln, code))
        if s is not None:
            return s
    raise ValueError("bad huffman code")

def _extend(v, t):
    return v - (1 << t) + 1 if t and v < (1 << (t-1)) else v

def decode_jpeg(data: bytes) -> np.ndarray:
    if not (len(data) > 3 and data[0] == 0xFF and data[1] == 0xD8):
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt = {}
    huff_dc, huff_ac = {}, {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos+1]
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", data[pos+2:pos+4])[0]
        body = data[pos+4:pos+2+seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body[i:i+64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(body[i:i+128], dtype=">u2").astype(np.int32)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                counts = list(body[i+1:i+17])
                n = sum(counts)
                syms = list(body[i+17:i+17+n])
                lut = _build_huff(counts, syms)
                (huff_ac if tc else huff_dc)[th] = lut
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], struct.unpack(">H", body[1:3])[0], struct.unpack(">H", body[3:5])[0], body[5]
            if prec != 8: raise ValueError("only 8-bit")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6+3*c], body[7+3*c], body[8+3*c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scomp = []
            for c in range(ns):
                cs, tt = body[1+2*c], body[2+2*c]
                scomp.append({"cs": cs, "td": tt >> 4, "ta": tt & 15})
            pos = pos + 2 + seglen
            return _decode_scan(data, pos, frame, scomp, qt, huff_dc, huff_ac, restart_interval)
        pos += 2 + seglen
    raise ValueError("no SOS")

def _decode_scan(data, pos, frame, scomp, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps); vmax = max(c["v"] for c in comps)
    mcux = (w + 8*hmax - 1) // (8*hmax)
    mcuy = (h + 8*vmax - 1) // (8*vmax)
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    br = _BitReader(data, pos)
    pred = [0]*len(comps)
    by_id = {c["cs"]: i for i, c in enumerate(scomp)}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                if not br.align_restart():
                    raise ValueError("missing restart marker")
                pred = [0]*len(comps)
            for ci, comp in enumerate(comps):
                sc = scomp[by_id[comp["id"]]] if comp["id"] in by_id else scomp[ci]
                dlut = huff_dc[sc["td"]]; alut = huff_ac[sc["ta"]]
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeffs = np.zeros(64, dtype=np.int32)
                        t = _read_huff_symbol(br, dlut)
                        diff = _extend(br.bits(t), t)
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _read_huff_symbol(br, alut)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            if k > 63: raise ValueError("AC overflow")
                            coeffs[k] = _extend(br.bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coeffs * q
                        pix = idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my*comp["v"] + by)*8; x0 = (mx*comp["h"] + bx)*8
                        planes[ci][y0:y0+8, x0:x0+8] = pix
            n_mcu += 1
    # upsample to full size
    out = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        img = out[0][:, :, None]
    else:
        y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
        r = y + 1.402*cr
        g = y - 0.344136*cb - 0.714136*cr
        b = y + 1.772*cb
        img = np.stack([r, g, b], axis=2)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)



# Annex K tables
STD_LUM_Q = np.array([
 16,11,10,16,24,40,51,61, 12,12,14,19,26,58,60,55,
 14,13,16,24,40,57,69,56, 14,17,22,29,51,87,80,62,
 18,22,37,56,68,109,103,77, 24,35,55,64,81,104,113,92,
 49,64,78,87,103,121,120,101, 72,92,95,98,112,100,103,99], dtype=np.int32)
STD_CHR_Q = np.array([
 17,18,24,47,99,99,99,99, 18,21,26,66,99,99,99,99,
 24,26,56,99,99,99,99,99, 47,66,99,99,99,99,99,99,
 99,99,99,99,99,99,99,99, 99,99,99,99,99,99,99,99,
 99,99,99,99,99,99,99,99, 99,99,99,99,99,99,99,99], dtype=np.int32)

DC_LUM_COUNTS = [0,1,5,1,1,1,1,1,1,0,0,0,0,0,0,0]
DC_LUM_SYMS = list(range(12))
AC_LUM_COUNTS = [0,2,1,3,3,2,4,3,5,5,4,4,0,0,1,0x7d]
AC_LUM_SYMS = [
 0x01,0x02,0x03,0x00,0x04,0x11,0x05,0x12,0x21,0x31,0x41,0x06,0x13,0x51,0x61,0x07,
 0x22,0x71,0x14,0x32,0x81,0x91,0xa1,0x08,0x23,0x42,0xb1,0xc1,0x15,0x52,0xd1,0xf0,
 0x24,0x33,0x62,0x72,0x82,0x09,0x0a,0x16,0x17,0x18,0x19,0x1a,0x25,0x26,0x27,0x28,
 0x29,0x2a,0x34,0x35,0x36,0x37,0x38,0x39,0x3a,0x43,0x44,0x45,0x46,0x47,0x48,0x49,
 0x4a,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5a,0x63,0x64,0x65,0x66,0x67,0x68,0x69,
 0x6a,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7a,0x83,0x84,0x85,0x86,0x87,0x88,0x89,
 0x8a,0x92,0x93,0x94,0x95,0x96,0x97,0x98,0x99,0x9a,0xa2,0xa3,0xa4,0xa5,0xa6,0xa7,
 0xa8,0xa9,0xaa,0xb2,0xb3,0xb4,0xb5,0xb6,0xb7,0xb8,0xb9,0xba,0xc2,0xc3,0xc4,0xc5,
 0xc6,0xc7,0xc8,0xc9,0xca,0xd2,0xd3,0xd4,0xd5,0xd6,0xd7,0xd8,0xd9,0xda,0xe1,0xe2,
 0xe3,0xe4,0xe5,0xe6,0xe7,0xe8,0xe9,0xea,0xf1,0xf2,0xf3,0xf4,0xf5,0xf6,0xf7,0xf8,
 0xf9,0xfa]

def _codes(counts, syms):
    table = {}
    code = 0; k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln-1]):
            table[syms[k]] = (ln, code); k += 1; code += 1
        code <<= 1
    return table

class _BitWriter:
    def __init__(self): self.buf = bytearray(); self.acc = 0; self.n = 0
    def put(self, code, ln):
        self.acc = (self.acc << ln) | code; self.n += ln
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF: self.buf.append(0)
            self.n -= 8
            self.acc &= (1 << self.n) - 1
    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)

def _mag(v):
    t = 0; a = abs(v)
    while a: t += 1; a >>= 1
    return t

def encode_jpeg_gray(img, qscale=1.0):
    h, w = img.shape
    q = np.maximum(1, (STD_LUM_Q * qscale).astype(np.int32))
    dc_t = _codes(DC_LUM_COUNTS, DC_LUM_SYMS)
    ac_t = _codes(AC_LUM_COUNTS, AC_LUM_SYMS)
    out = bytearray(b"\xff\xd8")
    zz = q[ZIGZAG]  # wait: table in DQT is in zigzag order: q_zigzag[i] = q_natural[ZIGZAG[i]]
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes(int(x) for x in q[ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">H", 11) + bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    def dht(tc, th, counts, syms):
        return (b"\xff\xc4" + struct.pack(">H", 19 + len(syms)) + bytes([(tc<<4)|th]) +
                bytes(counts) + bytes(syms))
    out += dht(0, 0, DC_LUM_COUNTS, DC_LUM_SYMS)
    out += dht(1, 0, AC_LUM_COUNTS, AC_LUM_SYMS)
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    bw = _BitWriter()
    pred = 0
    H = (h + 7)//8*8; W = (w + 7)//8*8
    padded = np.pad(img.astype(np.float64), ((0, H-h), (0, W-w)), mode="edge")
    for y0 in range(0, H, 8):
        for x0 in range(0, W, 8):
            block = padded[y0:y0+8, x0:x0+8] - 128.0
            coef = fdct2(block)
            qc = np.round(coef.reshape(-1) / q.astype(np.float64)).astype(np.int32)
            zzc = qc[ZIGZAG]
            # DC
            diff = int(zzc[0]) - pred; pred = int(zzc[0])
            t = _mag(diff)
            ln, code = dc_t[t]; bw.put(code, ln)
            if t: bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
            # AC
            run = 0
            last_nz = 0
            for k in range(1, 64):
                if zzc[k]: last_nz = k
            for k in range(1, last_nz+1):
                v = int(zzc[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_t[0xF0]; bw.put(code, ln); run -= 16
                s = _mag(v)
                ln, code = ac_t[(run << 4) | s]; bw.put(code, ln)
                bw.put(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                ln, code = ac_t[0x00]; bw.put(code, ln)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_color(rgb, qscale=1.0, subsample=True, restart=0):
    """RGB (H,W,3) -> baseline JPEG, 4:2:0 when subsample else 4:4:4.
    Luma huffman tables reused for chroma (legal)."""
    h, w, _ = rgb.shape
    r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299*r + 0.587*g + 0.114*b
    cb = -0.168736*r - 0.331264*g + 0.5*b + 128.0
    cr = 0.5*r - 0.418688*g - 0.081312*b + 128.0
    ql = np.maximum(1, (STD_LUM_Q * qscale).astype(np.int32))
    qc = np.maximum(1, (STD_CHR_Q * qscale).astype(np.int32))
    dc_t = _codes(DC_LUM_COUNTS, DC_LUM_SYMS)
    ac_t = _codes(AC_LUM_COUNTS, AC_LUM_SYMS)
    hs, vs = (2, 2) if subsample else (1, 1)
    mcux = (w + 8*hs - 1)//(8*hs); mcuy = (h + 8*vs - 1)//(8*vs)

    def pad_to(p, H, W):
        return np.pad(p, ((0, H - p.shape[0]), (0, W - p.shape[1])), mode="edge")
    Yp = pad_to(y, mcuy*8*vs, mcux*8*hs)
    if subsample:
        H2, W2 = mcuy*8, mcux*8
        cbp = pad_to(cb, mcuy*8*2, mcux*8*2)
        crp = pad_to(cr, mcuy*8*2, mcux*8*2)
        cbp = cbp.reshape(H2, 2, W2, 2).mean(axis=(1, 3))
        crp = crp.reshape(H2, 2, W2, 2).mean(axis=(1, 3))
    else:
        cbp = pad_to(cb, mcuy*8, mcux*8); crp = pad_to(cr, mcuy*8, mcux*8)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes(int(x) for x in ql[ZIGZAG])
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([1]) + bytes(int(x) for x in qc[ZIGZAG])
    samp = 0x22 if subsample else 0x11
    out += (b"\xff\xc0" + struct.pack(">H", 17) + bytes([8]) + struct.pack(">HH", h, w)
            + bytes([3, 1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]))
    def dht(tc, th, counts, syms):
        return (b"\xff\xc4" + struct.pack(">H", 19 + len(syms)) + bytes([(tc<<4)|th]) +
                bytes(counts) + bytes(syms))
    out += dht(0, 0, DC_LUM_COUNTS, DC_LUM_SYMS)
    out += dht(1, 0, AC_LUM_COUNTS, AC_LUM_SYMS)
    if restart:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart)
    out += b"\xff\xda" + struct.pack(">H", 12) + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])

    bw = _BitWriter()
    pred = [0, 0, 0]

    def emit_block(plane, y0, x0, q, ci):
        block = plane[y0:y0+8, x0:x0+8] - 128.0
        coef = fdct2(block)
        qcf = np.round(coef.reshape(-1) / q.astype(np.float64)).astype(np.int32)
        zzc = qcf[ZIGZAG]
        diff = int(zzc[0]) - pred[ci]; pred[ci] = int(zzc[0])
        t = _mag(diff)
        ln, code = dc_t[t]; bw.put(code, ln)
        if t: bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0; last_nz = 0
        for k in range(1, 64):
            if zzc[k]: last_nz = k
        for k in range(1, last_nz+1):
            v = int(zzc[k])
            if v == 0:
                run += 1; continue
            while run > 15:
                ln, code = ac_t[0xF0]; bw.put(code, ln); run -= 16
            s = _mag(v)
            ln, code = ac_t[(run << 4) | s]; bw.put(code, ln)
            bw.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            ln, code = ac_t[0x00]; bw.put(code, ln)

    n_mcu = 0; rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                bw.flush()
                out_len_marker = bytes([0xFF, 0xD0 + (rst & 7)])
                out += bw.buf + out_len_marker
                bw.buf = bytearray(); bw.acc = 0; bw.n = 0
                rst += 1
                pred[:] = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    emit_block(Yp, (my*vs+by)*8, (mx*hs+bx)*8, ql, 0)
            emit_block(cbp, my*8, mx*8, qc, 1)
            emit_block(crp, my*8, mx*8, qc, 2)
            n_mcu += 1
    bw.flush()
    out += bw.buf + b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Motion-JPEG AVI: RIFF framing (stdlib struct) around JPEG frames (decoded
# by decode_jpeg above) — a REAL video container end-to-end, closing the
# video modality for the one format this environment can honestly handle.
# ---------------------------------------------------------------------------


def is_avi(data: bytes) -> bool:
    return bool(data) and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def decode_avi_frames(data: bytes) -> tuple[list[np.ndarray], float]:
    """MJPEG AVI bytes -> (frames as (H, W, C) uint8 arrays, fps).

    Walks the RIFF tree: ``avih`` gives the microseconds-per-frame,
    ``movi`` holds ``..db``/``..dc`` chunks whose payloads are complete
    JPEGs. Non-JPEG streams raise ValueError (only MJPEG is decodable
    without external codecs)."""
    if not is_avi(data):
        raise ValueError("not an AVI (bad RIFF signature)")
    frames: list[np.ndarray] = []
    us_per_frame = 40000  # 25 fps default if avih is absent

    def walk(pos: int, end: int) -> None:
        nonlocal us_per_frame
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            if cid in (b"RIFF", b"LIST"):
                walk(body_start + 4, body_start + size)  # skip the list type
            elif cid == b"avih":
                (us,) = struct.unpack("<I", data[body_start : body_start + 4])
                if us:
                    us_per_frame = us
            elif cid[2:4] in (b"db", b"dc") and size > 0:
                payload = data[body_start : body_start + size]
                if not is_jpeg(payload):
                    raise ValueError("non-MJPEG stream chunk (only MJPEG supported)")
                frames.append(decode_jpeg(payload))
            pos = body_start + size + (size & 1)  # chunks are word-aligned

    walk(8 + 4, len(data))
    return frames, 1e6 / us_per_frame


def encode_avi_mjpeg(frames: list[np.ndarray], fps: float = 10.0) -> bytes:
    """Minimal MJPEG AVI for tests: one video stream, each (H, W, 3) or
    (H, W) uint8 frame stored as a ``00dc`` JPEG chunk."""
    jpegs = [
        encode_jpeg_gray(f) if f.ndim == 2 else encode_jpeg_color(f, subsample=False)
        for f in frames
    ]
    h, w = frames[0].shape[:2]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", len(body) + 4) + ltype + body

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1e6 / fps), 0, 0, 0x10, len(jpegs), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIIhhhh",
        0, 0, 0, 0, 1, int(fps), 0, len(jpegs), 0, 0xFFFFFFFF, 0, 0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF: the sample data (h264/h265) genuinely needs external
# codecs, but the CONTAINER is plain big-endian box framing — parse it for
# real metadata (duration, tracks, codec fourccs) so mp4 assets report
# truth instead of a fake digest; only pixel decode stays stubbed.
# ---------------------------------------------------------------------------


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def parse_mp4_meta(data: bytes) -> dict:
    """ISO-BMFF bytes -> {duration_ms, n_tracks, codecs: [fourcc, ...]}.

    Walks the box tree: ``mvhd`` gives timescale+duration, each ``trak``'s
    ``stsd`` lists its sample-description fourcc (avc1, mp4a, ...).
    Raises ValueError when the required boxes are missing/truncated."""
    if not is_mp4(data):
        raise ValueError("not an MP4 (no ftyp)")
    meta = {"duration_ms": None, "n_tracks": 0, "codecs": []}
    containers = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", data[pos : pos + 4])
            btype = data[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
                body = pos + 16
            elif size == 0:  # to end of file
                size = end - pos
            if size < 8 or pos + size > end:
                raise ValueError("truncated box")
            if btype in containers:
                if btype == b"trak":
                    meta["n_tracks"] += 1
                walk(body, pos + size)
            elif btype == b"mvhd":
                version = data[body]
                if version == 1:
                    timescale, duration = struct.unpack(
                        ">IQ", data[body + 20 : body + 32]
                    )
                else:
                    timescale, duration = struct.unpack(
                        ">II", data[body + 12 : body + 20]
                    )
                if timescale:
                    meta["duration_ms"] = int(duration * 1000 / timescale)
            elif btype == b"stsd":
                (n_entries,) = struct.unpack(">I", data[body + 4 : body + 8])
                p = body + 8
                for _ in range(n_entries):
                    if p + 8 > pos + size:
                        break
                    fourcc = data[p + 4 : p + 8].decode("latin-1")
                    meta["codecs"].append(fourcc)
                    (esz,) = struct.unpack(">I", data[p : p + 4])
                    p += max(esz, 8)
            pos += size

    walk(0, len(data))
    if meta["duration_ms"] is None and meta["n_tracks"] == 0:
        raise ValueError("no moov metadata found")
    return meta


def encode_mp4_stub(duration_ms: int, codecs_list: list[str]) -> bytes:
    """Minimal structurally-valid ISO-BMFF for tests: ftyp + moov with
    mvhd (1000 Hz timescale) and one trak/stsd per codec fourcc. Carries
    NO sample data — exists to exercise the container parser."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    mvhd = box(
        b"mvhd",
        b"\x00" + b"\x00" * 3 + struct.pack(">II", 0, 0)
        + struct.pack(">II", 1000, duration_ms) + b"\x00" * 80,
    )
    traks = b""
    for cc in codecs_list:
        entry = struct.pack(">I", 16) + cc.encode("latin-1") + b"\x00" * 8
        stsd = box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)
        traks += box(b"trak", box(b"mdia", box(b"minf", box(b"stbl", stsd))))
    moov = box(b"moov", mvhd + traks)
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov
