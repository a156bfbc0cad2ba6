"""Parity pins for functions/refhash.py — the pure-Python mirrors of
Spark's hash primitives that the golden signature fixtures (and therefore
the q_simhash / q_minhash_lsh / q_fingerprint oracles) are built from.

If any of these drift from the JVM, the fixtures silently rot; every test
here compares refhash output against LIVE Spark on adversarial inputs
(empty string, all tail lengths around the 4/8/32-byte block boundaries,
multi-byte UTF-8, negative longs) plus real corpus texts.
"""

import pyspark.sql.functions as F
import pytest

from sf_epa_data_ingestion_spark.functions.refhash import (
    hash_long_array,
    java_abs_int,
    java_rem,
    murmur3_string,
    ref_minhash_bands,
    ref_minhash_sig,
    ref_simhash,
    xxh64_string,
)
from sf_epa_data_ingestion_spark.operators import dedup

ADVERSARIAL = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "abcdefg",
    "abcdefgh",
    "abcdefghi",
    "x" * 31,
    "x" * 32,
    "x" * 33,
    "x" * 63,
    "x" * 64,
    "x" * 65,
    "hello world",
    "café ☃ 你好",  # multi-byte UTF-8 (2/3-byte sequences, signed tail bytes)
    "naïve space",  # NBSP is NOT Java \s — must survive normalization
    "tab\tand\nnewline\x0b\f\r",
    "ümlaut ÄÖÜ ß",
]


@pytest.fixture(scope="module")
def hash_rows(spark):
    df = spark.createDataFrame([(s,) for s in ADVERSARIAL], ["s"])
    return df.select(
        "s", F.hash("s").alias("m32"), F.xxhash64("s").alias("x64")
    ).collect()


def test_murmur3_matches_spark(hash_rows):
    for r in hash_rows:
        assert murmur3_string(r["s"]) == r["m32"], repr(r["s"])


def test_xxh64_matches_spark(hash_rows):
    for r in hash_rows:
        assert xxh64_string(r["s"]) == r["x64"], repr(r["s"])


def test_hash_long_array_matches_spark(spark):
    arrs = [[1, 2, 3], [0], [-5, 2**62, -(2**62)], [123456789012345], [-1],
            [2**63 - 1, -(2**63)]]
    df = spark.createDataFrame([(a,) for a in arrs], "arr: array<long>")
    for r in df.select("arr", F.hash("arr").alias("m")).collect():
        assert hash_long_array(list(r["arr"])) == r["m"], r["arr"]


def test_java_arithmetic_quirks():
    assert java_abs_int(-(1 << 31)) == -(1 << 31)  # Math.abs overflow
    assert java_abs_int(-7) == 7
    assert java_rem(-7, 3) == -1  # Java % truncates toward zero
    assert java_rem(7, 3) == 1


def test_signature_pipeline_parity(spark):
    """End-to-end: the pure-Python signature pipelines reproduce the Spark
    operators' output bit-for-bit over the real corpus — the exact
    property the golden fixtures (and their driver oracles) rely on."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}

    for r in dedup.simhash(d).collect():
        t = texts[r["id"]]
        expected = None if t is None else ref_simhash(t)
        assert r["simhash"] == expected, r["id"]

    sig = d.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("id"),
        dedup.minhash_signature(dedup.char_shingles(F.col("text"), 8), 64).alias("sig"),
    )
    ref_sigs = {}
    for r in sig.collect():
        ref_sigs[r["id"]] = ref_minhash_sig(texts[r["id"]])
        assert list(r["sig"]) == ref_sigs[r["id"]], r["id"]

    got_bands = {}
    for r in dedup.minhash_band_rows(sig, 16, 4).collect():
        got_bands.setdefault(r["id"], {})[r["band_id"]] = r["band_hash"]
    for rid, by_band in got_bands.items():
        assert [by_band[b] for b in range(16)] == ref_minhash_bands(ref_sigs[rid])


def test_ref_normalize_matches_spark_on_random_unicode(spark):
    """ref_normalize must mirror normalized_text (lower + Java-\\s collapse
    + space trim) — the seam every golden signature fixture sits on. Java's
    \\s is ASCII-only while Python's is unicode-aware, so the random corpus
    leans on unicode whitespace (NBSP, ideographic space, zero-width),
    case-mapping edge points (İ, ß, ﬁ), and control characters."""
    import random

    from sf_epa_data_ingestion_spark.functions.refhash import ref_normalize
    from sf_epa_data_ingestion_spark.operators.dedup import normalized_text

    rng = random.Random(42)
    alphabet = (
        list("abcXYZ012 \t\n\x0b\f\r")
        + [" ", " ", "　", "​", "İ", "ß", "ﬁ",
           "é", "你", "☃", "\x00", "\x1f"]
    )
    cases = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
             for _ in range(300)]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], ["i", "s"])
    got = {
        r["i"]: r["t"]
        for r in df.select("i", normalized_text(F.col("s")).alias("t")).collect()
    }
    for i, s in enumerate(cases):
        assert got[i] == ref_normalize(s), (i, repr(s), repr(got[i]))


def test_ref_lsh_sigs_matches_spark(spark):
    """ref_lsh_sigs must reproduce the LSH signature spec bit-for-bit on
    the real embedding corpus — the property golden_lsh_sigs.parquet
    (and the q_ann_lsh oracle) is built on. Includes the degenerate
    cases the spec defines: NULL vector and ragged lengths both yield
    the all-zero signature in every table."""
    from sf_epa_data_ingestion_spark.functions.refhash import ref_lsh_sigs
    from sf_epa_data_ingestion_spark.operators.similarity import _signatures_pd

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sig_udf = _signatures_pd(4, 8, 64)
    rows = emb.select(
        "vec_id", "embedding",
        sig_udf(F.col("embedding").cast("array<double>")).alias("sigs"),
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert ref_lsh_sigs(list(r["embedding"])) == list(r["sigs"]), r["vec_id"]

    assert ref_lsh_sigs(None) == [0, 0, 0, 0]
    assert ref_lsh_sigs([1.0] * 63) == [0, 0, 0, 0]  # ragged -> all-zero


def test_lsh_content_address_matches_duckdb():
    """The %.9e canonical rendering both sides of the q_ann_lsh oracle
    join on must format identically in DuckDB printf and Python — 10
    significant digits (lossless float32), two-digit exponent, negative
    zero and subnormals included."""
    import hashlib

    import duckdb

    vecs = [
        [0.0, -0.0, 1.5, -2.25e-5, 3.4e38, 1.1754944e-38, -1.0],
        [float(f"{x}.{x}e{x % 30}") for x in range(64)],
    ]
    con = duckdb.connect()
    for v in vecs:
        duck = con.sql(
            "SELECT md5(array_to_string(list_transform("
            "CAST(? AS FLOAT[]), x -> printf('%.9e', CAST(x AS DOUBLE))), ','))",
            params=[v],
        ).fetchone()[0]
        import struct

        as_f32 = [struct.unpack("<f", struct.pack("<f", x))[0] for x in v]
        py = hashlib.md5(
            ",".join(f"{x:.9e}" for x in as_f32).encode()
        ).hexdigest()
        assert duck == py, v


def test_ref_hll_distinct_matches_spark(spark):
    """ref_hll_distinct must reproduce approx_count_distinct exactly in
    the linear-counting regime (rsd 0.02 over the profiled orders
    columns — the q_approx_profile oracle's contract), and REFUSE
    outside it rather than return an uncertifiable estimate."""
    from sf_epa_data_ingestion_spark.functions.refhash import (
        ref_hll_distinct,
        xxh64_long,
        xxh64_string,
    )

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    for col in ("o_orderstatus", "o_orderpriority", "o_custkey"):
        got = o.agg(F.approx_count_distinct(col, rsd=0.02)).collect()[0][0]
        vals = [r[0] for r in o.select(col).distinct().collect() if r[0] is not None]
        hashes = {
            xxh64_long(v) if isinstance(v, int) else xxh64_string(v) for v in vals
        }
        assert ref_hll_distinct(hashes, rsd=0.02) == got, col

    # adversarial small string set, both precisions
    strs = [f"s{i}" for i in range(37)]
    df = spark.createDataFrame([(s,) for s in strs], ["s"])
    hs = {xxh64_string(s) for s in strs}
    for rsd in (0.05, 0.02):
        got = df.agg(F.approx_count_distinct("s", rsd=rsd)).collect()[0][0]
        assert ref_hll_distinct(hs, rsd=rsd) == got, rsd

    # dense regime: must refuse, never guess
    with pytest.raises(ValueError):
        ref_hll_distinct({xxh64_long(i) for i in range(200_000)}, rsd=0.05)


def test_ref_ivf_probes_matches_spark(spark):
    """ref_ivf_probes must replay ivf_topk's k-means training bit-for-bit
    (the property golden_ivf_probes.parquet and the q_ann_ivf oracle rest
    on). Rather than reach into the operator's internals, compare the
    full end-to-end result: rebuild the query from the mirror's cell and
    probe lists + exact unit-dot scoring and it must equal the Spark
    output row-for-row."""
    import math

    from sf_epa_data_ingestion_spark.functions.refhash import ref_ivf_probes
    from sf_epa_data_ingestion_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["vec_id"]): (r["cosine_sim"], r["rank"])
        for r in similarity.ivf_topk(
            emb, queries, k=10, dim=64, n_centroids=16, n_probe=4
        ).collect()
    }

    rows = [(r["vec_id"], list(r["embedding"])) for r in emb.collect()]
    probes = ref_ivf_probes(rows)
    assert ref_ivf_probes.last_margin > 1e-9

    def unit(v):
        n = 0.0
        for x in v:
            n += float(x) * float(x)
        n = math.sqrt(n)
        return [float(x) / n for x in v]

    units = {i: unit(v) for i, v in rows}
    cells = {i: p[0] for i, p in probes.items()}
    expected = {}
    for qid in sorted(i for i, _ in rows if i < 10):
        scored = []
        for cid in probes[qid][:4]:
            for i, c in cells.items():
                if c == cid and i != qid:
                    d = 0.0
                    for x, y in zip(units[qid], units[i]):
                        d += x * y
                    scored.append((round(d, 6), i))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (sim, i) in enumerate(scored[:10], start=1):
            expected[(qid, i)] = (sim, rank)
    assert got == expected
