"""Unit tests for the pure-stdlib PDF text extractor (functions/pdf.py),
including the ToUnicode CMap rung for Type0/Identity-H composite fonts.
No Spark needed — pure functions over bytes."""

import zlib

from sf_epa_data_ingestion_spark.functions.pdf import (
    _decode_cids,
    extract_text,
    parse_tounicode_cmaps,
)


def _stream(body: bytes) -> bytes:
    comp = zlib.compress(body)
    return b"stream\n" + comp + b"\nendstream"


CMAP_BODY = b"""
/CIDInit /ProcSet findresource begin
begincmap
2 beginbfchar
<0041> <0048>
<0042> <0065006C006C006F>
endbfchar
1 beginbfrange
<0050> <0052> <0061>
endbfrange
endcmap
"""


def test_parse_bfchar_and_bfrange():
    data = _stream(CMAP_BODY)
    cmap = parse_tounicode_cmaps(data)
    assert cmap[b"\x00\x41"] == "H"          # single bfchar
    assert cmap[b"\x00\x42"] == "ello"       # multi-char UTF-16BE target
    # bfrange <0050>..<0052> -> 'a','b','c'
    assert [cmap[bytes([0, c])] for c in (0x50, 0x51, 0x52)] == ["a", "b", "c"]


def test_decode_cids_greedy():
    cmap = {b"\x00\x41": "H", b"\x00\x42": "i", b"\x21": "!"}
    # two 2-byte CIDs, then a 1-byte simple-font code
    assert _decode_cids(b"00410042" + b"21", cmap) == "Hi!"
    # unmapped 2-byte code is skipped, not garbled
    assert _decode_cids(b"FFFF0041", cmap) == "H"


def test_extract_text_hex_strings_through_cmap():
    content = b"BT <0041> Tj <0042> Tj ET"
    pdf = _stream(CMAP_BODY) + b"\n" + _stream(content)
    out = extract_text(pdf)
    assert "Hello" in out.replace("\n", "")


def test_extract_text_literal_strings_unaffected():
    pdf = _stream(b"BT (plain text) Tj ET")
    assert "plain text" in extract_text(pdf)


def test_real_identity_h_pdf_if_present():
    import os

    path = "/root/reference/epa_pdfs/LifeGard_Technical_Liquid.pdf"
    if not os.path.exists(path):
        return
    t = extract_text(open(path, "rb").read())
    assert len(t) > 5000
    assert "epa reg" in t.lower()


def test_bfrange_overflow_is_clamped_not_fatal():
    # a range whose consecutive targets cross the 2-byte boundary is
    # malformed; the tail is dropped, the document is not lost
    body = b"1 beginbfrange <00FE> <0101> <FFFE> endbfrange"
    cmap = parse_tounicode_cmaps(_stream(body))
    assert cmap[b"\x00\xfe"] == "￾"
    assert b"\x01\x00" not in cmap  # overflowing tail dropped
