"""Minimal pure-stdlib PDF text extraction (F3).

The reference parses its EPA label PDFs with a managed warehouse builtin
(``PARSE_DOCUMENT(@stage, relative_path, {'mode':'LAYOUT'})``,
/root/reference/epa_ingestion.py:763-764). No PDF library ships in this
container and installs are disallowed, so this module implements the
subset of ISO 32000 (the public PDF spec) needed to read text from
ordinary generated PDFs using only ``zlib`` + ``re``:

- every ``stream ... endstream`` body is tried as a FlateDecode content
  stream (raw bodies are also accepted when they already contain text
  operators — uncompressed PDFs);
- content streams are tokenized sequentially; text-showing operators
  ``Tj``, ``'``, ``"`` and ``TJ`` emit their literal-string operands,
  with PDF escape sequences (``\\(`` ``\\)`` ``\\\\`` ``\\n`` ``\\ooo``
  and line continuations) decoded per spec §7.3.4.2;
- text positioning operators (``Td``/``TD``/``Tm``/``T*``/``ET``) drive
  line breaks: a vertical move starts a new output line, matching how
  layout-mode extractors reconstruct reading order.

- Type0/Identity-H composite fonts: every ToUnicode CMap stream in the
  file (``beginbfchar``/``beginbfrange`` sections, spec §9.10.3) is
  parsed and merged into one code→unicode map, and hex-string operands
  (``<..> Tj``) are decoded through it as CIDs (greedy 2-byte-then-1-byte
  match). Merging instead of tracking the per-page font resource chain is
  a deliberate simplification: documents overwhelmingly use one composite
  font, and a collision merely maps a glyph through the wrong font's
  table — acceptable for indexing, vastly better than dropping the text.

Still out of scope: image-only PDFs (scanned faxes — CCITTFaxDecode
pages carry no text layer at all; 3 of the 51 reference PDFs are such
scans and need OCR, which no text extractor can do), and predictor-coded
object streams.

Pure functions over ``bytes`` — usable from any executor-side pandas UDF
without SparkContext access.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_WHITESPACE = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

_ESCAPES = {
    ord("n"): "\n",
    ord("r"): "\r",
    ord("t"): "\t",
    ord("b"): "\b",
    ord("f"): "\f",
    ord("("): "(",
    ord(")"): ")",
    ord("\\"): "\\",
}


def _decode_literal(raw: bytes) -> str:
    """Decode a PDF literal string body (between the parens) per §7.3.4.2:
    backslash escapes, octal codes, escaped newlines; bytes map through
    Latin-1 (the usual StandardEncoding-compatible approximation)."""
    out: list[str] = []
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(chr(c))
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = raw[i]
        if e in _ESCAPES:
            out.append(_ESCAPES[e])
            i += 1
        elif 0x30 <= e <= 0x37:  # \ooo octal, 1-3 digits
            j = i
            while j < n and j - i < 3 and 0x30 <= raw[j] <= 0x37:
                j += 1
            out.append(chr(int(raw[i:j], 8) & 0xFF))
            i = j
        elif e in (0x0A, 0x0D):  # line continuation
            i += 1
            if e == 0x0D and i < n and raw[i] == 0x0A:
                i += 1
        else:  # unknown escape: the backslash is dropped (spec)
            out.append(chr(e))
            i += 1
    return "".join(out)


def _scan_literal(buf: bytes, start: int) -> tuple[bytes, int]:
    """Return (body, index-after-closing-paren) for the literal string whose
    ``(`` is at ``start``. Parens nest; escaped parens don't count."""
    depth, i, n = 1, start + 1, len(buf)
    begin = i
    while i < n and depth:
        c = buf[i]
        if c == 0x5C:
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
        i += 1
    return buf[begin : i - 1], i


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_HEX_OR_ARR_RE = re.compile(rb"<([0-9A-Fa-f]+)>|\[((?:\s*<[0-9A-Fa-f]+>\s*)+)\]")


def _utf16be(hexs: bytes) -> str:
    raw = bytes.fromhex(hexs.decode("ascii"))
    if len(raw) % 2:
        raw += b"\x00"
    try:
        return raw.decode("utf-16-be", errors="ignore")
    except UnicodeDecodeError:
        return ""


def parse_tounicode_cmaps(data: bytes) -> dict[bytes, str]:
    """Merge every ToUnicode CMap stream in the file into one
    code(bytes)→unicode map (spec §9.10.3). Codes keep their byte width
    (1 for simple fonts, 2 for Identity-H CID fonts) so the decoder can
    greedy-match."""
    cmap: dict[bytes, str] = {}
    for body in _STREAM_RE.findall(data):
        try:
            decoded = zlib.decompress(body)
        except zlib.error:
            decoded = body
        if b"beginbfchar" not in decoded and b"beginbfrange" not in decoded:
            continue
        for sec in _BFCHAR_RE.findall(decoded):
            pairs = _HEX_RE.findall(sec)
            for src, dst in zip(pairs[0::2], pairs[1::2]):
                code = bytes.fromhex(src.decode("ascii"))
                cmap[code] = _utf16be(dst)
        for sec in _BFRANGE_RE.findall(decoded):
            toks = _HEX_OR_ARR_RE.findall(sec)
            for k in range(0, len(toks) - 2, 3):
                lo_h = toks[k][0]
                hi_h = toks[k + 1][0]
                dst_h, dst_arr = toks[k + 2]
                if not lo_h or not hi_h:
                    continue
                lo = int(lo_h, 16)
                hi = int(hi_h, 16)
                width = len(lo_h) // 2
                if dst_arr:  # [<d1> <d2> ...] one target per code
                    dsts = _HEX_RE.findall(dst_arr)
                    for off, d in enumerate(dsts):
                        if lo + off <= hi:
                            cmap[(lo + off).to_bytes(width, "big")] = _utf16be(d)
                elif dst_h:  # <dstStart>: consecutive targets
                    base_raw = bytes.fromhex(dst_h.decode("ascii"))
                    base = int.from_bytes(base_raw, "big")
                    span = len(base_raw)
                    for off in range(min(hi - lo + 1, 0x10000)):
                        try:
                            tgt = (base + off).to_bytes(max(span, 2), "big")
                            code = (lo + off).to_bytes(width, "big")
                        except OverflowError:
                            # a range crossing its byte-width boundary is
                            # malformed per spec; drop the overflowing
                            # tail instead of losing the whole document
                            break
                        cmap[code] = tgt.decode("utf-16-be", errors="ignore")
    return cmap


def _decode_cids(hexs: bytes, cmap: dict[bytes, str]) -> str:
    """Decode a hex-string operand through the merged ToUnicode map:
    greedy 2-byte match (Identity-H CIDs), then 1-byte (simple fonts)."""
    try:
        raw = bytes.fromhex(
            hexs.decode("ascii") + ("0" if len(hexs) % 2 else "")
        )
    except ValueError:
        return ""
    out: list[str] = []
    i, n = 0, len(raw)
    while i < n:
        two = raw[i : i + 2]
        if len(two) == 2 and two in cmap:
            out.append(cmap[two])
            i += 2
            continue
        one = raw[i : i + 1]
        if one in cmap:
            out.append(cmap[one])
            i += 1
            continue
        i += 2  # unmapped code: Identity-H codes are 2 bytes; skip
    return "".join(out)


def _extract_content_text(content: bytes, cmap: dict[bytes, str] | None = None) -> str:
    """Walk one decoded content stream; emit text in operator order with
    line breaks on vertical moves."""
    parts: list[str] = []
    stack: list[object] = []  # operand stack: str (from literals) | float
    last_y: float | None = None
    i, n = 0, len(content)

    def newline() -> None:
        if parts and parts[-1] != "\n":
            parts.append("\n")

    def flush_strings(tokens: list[object]) -> None:
        for t in tokens:
            if isinstance(t, str):
                parts.append(t)
            elif isinstance(t, float) and t < -150.0:
                # large negative TJ kern = inter-word gap
                if parts and not parts[-1].endswith((" ", "\n")):
                    parts.append(" ")

    while i < n:
        c = content[i]
        if c in _WHITESPACE:
            i += 1
        elif c == 0x28:  # ( literal string
            body, i = _scan_literal(content, i)
            stack.append(_decode_literal(body))
        elif c == 0x3C:  # < hex string or << dict
            if i + 1 < n and content[i + 1] == 0x3C:
                i += 2
            else:
                j = content.find(b">", i + 1)
                if cmap and j > 0:
                    # CID hex string: decode through the ToUnicode map
                    stack.append(_decode_cids(content[i + 1 : j], cmap))
                i = n if j < 0 else j + 1
        elif c == 0x25:  # % comment to EOL
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == 0x2F:  # /Name
            j = i + 1
            while j < n and content[j] not in _WHITESPACE and content[j] not in _DELIM:
                j += 1
            i = j
        elif c in b"[]>{}":
            if c == 0x5B:  # [ begins a TJ array: mark it on the stack
                stack.append("\x00[")
            i += 1
        else:  # number or operator token
            j = i
            while j < n and content[j] not in _WHITESPACE and content[j] not in _DELIM:
                j += 1
            tok = content[i:j]
            i = j if j > i else i + 1
            if not tok:
                continue
            try:
                stack.append(float(tok))
                continue
            except ValueError:
                pass
            op = tok
            if op == b"Tj" or op == b"'" or op == b'"':
                if op == b"'":
                    newline()
                flush_strings([t for t in stack if isinstance(t, str) and t != "\x00["][-1:])
                stack.clear()
            elif op == b"TJ":
                try:
                    mark = len(stack) - 1 - stack[::-1].index("\x00[")
                except ValueError:
                    mark = 0
                flush_strings(stack[mark + 1 :])
                stack.clear()
            elif op in (b"Td", b"TD"):
                if len(stack) >= 2 and isinstance(stack[-1], float) and stack[-1] != 0.0:
                    newline()
                stack.clear()
            elif op == b"Tm":
                if len(stack) >= 6 and isinstance(stack[-1], float):
                    y = stack[-1]
                    if last_y is not None and abs(y - last_y) > 0.1:
                        newline()
                    last_y = y
                stack.clear()
            elif op in (b"T*", b"ET"):
                newline()
                stack.clear()
            else:
                stack.clear()
    return "".join(parts)


def extract_text(data: bytes) -> str:
    """Extract text from a PDF file's bytes. Returns the concatenated text
    of every content stream that yields any (streams are visited in file
    order — generated PDFs write pages sequentially, so this is reading
    order in practice)."""
    if not data:
        return ""
    cmap = parse_tounicode_cmaps(data)
    texts: list[str] = []
    for body in _STREAM_RE.findall(data):
        try:
            decoded = zlib.decompress(body)
        except zlib.error:
            decoded = body  # uncompressed content streams are legal
        if b"Tj" not in decoded and b"TJ" not in decoded:
            continue
        t = _extract_content_text(decoded, cmap).strip()
        if t:
            texts.append(t)
    return "\n\n".join(texts)
