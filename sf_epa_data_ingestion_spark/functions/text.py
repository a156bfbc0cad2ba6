"""Text functions: recursive chunker (UDTF), tokenization, language ID,
quality scoring, token counting, fingerprinting.

Reference parity (citations into /root/reference/):
- The reference's single UDF is the ``text_chunker`` UDTF
  (epa_ingestion.py:265-294): a recursive character splitter
  (chunk_size=1512, overlap=256, separators ["\\n\\n", "\\n", " ", ""])
  applied laterally per document (epa_ingestion.py:761-764). Reimplemented
  from scratch below (no langchain dependency) as (a) a plain function with
  golden tests, (b) an Arrow-batched pandas UDF + explode for DataFrame
  use, (c) a Spark UDTF class for SQL ``LATERAL`` parity.

Language-ID / quality / token-count / fingerprint are the
training-data-pipeline extensions (north star): all but the rolling-hash
fingerprint are pure column expressions (JVM-side, codegen'd, and
SQL-oracle-expressible); the winnowing fingerprint is a pandas UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType, StringType

CHUNK_SIZE = 1512  # epa_ingestion.py:283
CHUNK_OVERLAP = 256  # epa_ingestion.py:284
SEPARATORS: tuple[str, ...] = ("\n\n", "\n", " ", "")


# ---------------------------------------------------------------------------
# Recursive character splitter (pure Python, deterministic)
# ---------------------------------------------------------------------------

def _atomize(text: str, separators: Sequence[str], chunk_size: int) -> list[str]:
    """Split ``text`` into atoms each <= chunk_size, preferring the earliest
    separator present; separators are kept attached to the preceding atom so
    ``''.join(atoms) == text`` (lossless)."""
    if len(text) <= chunk_size:
        return [text] if text else []
    sep = separators[-1]
    rest: Sequence[str] = ()
    for i, s in enumerate(separators):
        if s == "":
            sep, rest = s, ()
            break
        if s in text:
            sep, rest = s, separators[i + 1 :]
            break
    if sep == "":
        return [text[i : i + chunk_size] for i in range(0, len(text), chunk_size)]
    pieces = text.split(sep)
    # re-attach the separator to each piece except the last
    atoms: list[str] = []
    for j, piece in enumerate(pieces):
        with_sep = piece + (sep if j < len(pieces) - 1 else "")
        if len(with_sep) <= chunk_size:
            if with_sep:
                atoms.append(with_sep)
        else:
            atoms.extend(_atomize(with_sep, rest if rest else ("",), chunk_size))
    return atoms


def split_text(
    text: str | None,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    separators: Sequence[str] = SEPARATORS,
) -> list[str]:
    """Recursive character split with overlap.

    Atoms (boundary-snapped pieces <= chunk_size) are packed greedily into
    chunks <= chunk_size; each new chunk restarts from the trailing atoms of
    the previous one covering <= ``overlap`` characters (boundary-snapped,
    so actual overlap may be smaller — never larger). Deterministic.
    """
    if not text:
        return []
    atoms = _atomize(text, tuple(separators), chunk_size)
    chunks: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for atom in atoms:
        if cur and cur_len + len(atom) > chunk_size:
            chunks.append("".join(cur))
            # carry trailing atoms up to `overlap` chars into the next chunk
            carry: list[str] = []
            carry_len = 0
            for prev in reversed(cur):
                if carry_len + len(prev) > overlap:
                    break
                carry.insert(0, prev)
                carry_len += len(prev)
            cur, cur_len = carry, carry_len
            # an atom longer than chunk_size - overlap could loop; guard
            if cur_len + len(atom) > chunk_size:
                cur, cur_len = [], 0
        cur.append(atom)
        cur_len += len(atom)
    if cur:
        # the buffer always holds at least one atom appended after the last
        # emit (carry-over alone is never left as the tail), so this is
        # never a pure duplicate of the previous chunk.
        chunks.append("".join(cur))
    return [c for c in chunks if c.strip()]


def make_chunks_udf(chunk_size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP):
    """Arrow-batched chunker UDF factory: one array<string> per text."""

    @pandas_udf(ArrayType(StringType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: split_text(t, chunk_size, overlap))

    return _udf


#: default chunker at the reference's 1512/256 geometry
chunks_udf = make_chunks_udf()


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    keep_cols: Sequence[str] | None = None,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """J5: the lateral-UDTF apply (epa_ingestion.py:761-764) as
    select + posexplode — one output row per (document, chunk), preserving
    chunk order via ``chunk_index``.

    Scale note: chunking is embarrassingly parallel (per-row); the pandas
    UDF runs Arrow-batched per partition with no shuffle at all.
    """
    cols = list(keep_cols) if keep_cols is not None else [c for c in df.columns if c != text_col]
    udf = make_chunks_udf(chunk_size, overlap)
    exploded = df.select(
        *cols, F.posexplode(udf(F.col(text_col))).alias("chunk_index", "chunk")
    )
    return exploded


class TextChunker:
    """Spark UDTF for SQL ``LATERAL`` parity with the reference's
    ``TABLE(TEXT_CHUNKER(...))`` (epa_ingestion.py:265-294, applied :763).

    Register with::

        from pyspark.sql.functions import udtf
        spark.udtf.register("text_chunker", udtf(TextChunker, returnType="chunk: string"))

    then ``SELECT d.doc_id, c.chunk FROM documents d,
    LATERAL text_chunker(d.text) c``.
    """

    def eval(self, text: str | None):  # noqa: D102
        for chunk in split_text(text):
            yield (chunk,)


def register_text_chunker(spark) -> None:
    from pyspark.sql.functions import udtf

    spark.udtf.register("text_chunker", udtf(TextChunker, returnType="chunk: string"))


# ---------------------------------------------------------------------------
# Tokenization & counting (pure column expressions)
# ---------------------------------------------------------------------------

#: BPE-ish pre-tokenizer: word pieces, numbers, or single punctuation marks.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization as array<string> (empty tokens removed)."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count (bigint for oracle-type parity)."""
    return F.size(tokens(col)).cast("long")


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count: regex pre-tokenizer match count. Stays JVM-side
    via ``regexp_extract_all``; DuckDB oracle: len(regexp_extract_all(...))."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), F.lit(0))).cast("long")


# ---------------------------------------------------------------------------
# Language ID (n-gram/stopword heuristic, expression-only)
# ---------------------------------------------------------------------------

#: Distinctive high-frequency function words per language. Deliberately
#: small and regex-expressible so the same heuristic runs in any SQL engine.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|that|with)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit)\b",
    "fr": r"\b(le|la|les|et|est|dans|pour)\b",
    "es": r"\b(el|los|las|es|en|por|para)\b",
}


def lang_marker_count(col: Column, lang: str) -> Column:
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(LANG_MARKERS[lang]), F.lit(0))).cast("long")


def lang_id(col: Column) -> Column:
    """Predicted language = argmax of marker counts ('und' if all zero).

    Ties break by the fixed language order en>de>fr>es (deterministic, and
    reproducible in the SQL oracle via the same CASE chain).
    """
    counts = {lang: lang_marker_count(col, lang) for lang in LANG_MARKERS}
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when(counts[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


# ---------------------------------------------------------------------------
# Quality scoring (expression-only)
# ---------------------------------------------------------------------------

def quality_features(col: Column) -> dict[str, Column]:
    """Length / punctuation-ratio / stopword-ratio features used by
    training-data quality filters. All ratios guard zero denominators."""
    n_chars = F.length(col).cast("long")
    n_tokens = token_count_ws(col)
    n_punct = F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), F.lit(0))).cast("long")
    n_stop = lang_marker_count(col, "en")
    denom_c = F.nullif(n_chars, F.lit(0))
    denom_t = F.nullif(n_tokens, F.lit(0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": (n_punct.cast("double") / denom_c.cast("double")),
        "stopword_ratio": (n_stop.cast("double") / denom_t.cast("double")),
        "mean_token_len": (
            (n_chars - n_tokens + 1).cast("double") / denom_t.cast("double")
        ),
    }


def quality_score(col: Column) -> Column:
    """Composite quality in [0,1]: rewards mid-length docs with moderate
    punctuation and a healthy English stopword rate. Deterministic algebra
    over the features — identical formula ships in the SQL oracle. No
    rounding: ratios of small integers can land exactly on half-ulp round
    boundaries where engines' rounding modes diverge; raw doubles computed
    by identical expression trees are bit-equal instead."""
    f = quality_features(col)
    len_score = F.least(f["n_chars"].cast("double") / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - F.coalesce(f["punct_ratio"], F.lit(1.0)) * 4)
    stop_score = F.least(F.coalesce(f["stopword_ratio"], F.lit(0.0)) * 5, F.lit(1.0))
    return len_score * 0.4 + punct_pen * 0.3 + stop_score * 0.3


# ---------------------------------------------------------------------------
# Document fingerprinting (winnowing rolling hash — pandas UDF)
# ---------------------------------------------------------------------------

FP_K = 8  # k-gram length
FP_WINDOW = 4  # winnowing window

_B, _M = 257, (1 << 61) - 1  # polynomial rolling-hash base / Mersenne modulus


def _winnow(text: str, k: int = FP_K, w: int = FP_WINDOW) -> list[int]:
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): min rolling hash
    per window of k-gram hashes — a compact, position-robust fingerprint."""
    if not text or len(text) < k:
        return []
    h = 0
    top = pow(_B, k - 1, _M)
    hashes: list[int] = []
    for i, ch in enumerate(text):
        h = (h * _B + ord(ch)) % _M
        if i >= k:
            h = (h - ord(text[i - k]) * top * _B) % _M
        if i >= k - 1:
            hashes.append(h)
    fps: list[int] = []
    prev = -1
    for i in range(max(1, len(hashes) - w + 1)):
        window = hashes[i : i + w]
        m = min(window)
        pos = i + window.index(m)
        if pos != prev:
            fps.append(m)
            prev = pos
    return fps


@pandas_udf(ArrayType(LongType()))
def fingerprint_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched winnowing fingerprints (sorted, deduped)."""
    return texts.map(lambda t: sorted(set(_winnow(t or ""))))
