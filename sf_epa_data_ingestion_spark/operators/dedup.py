"""Deduplication operators for training-data pipelines (north-star scope).

Five strategies, all distributed-by-construction (no driver materialization,
no O(n^2) cross joins — candidate generation always goes through a
bucket/band equi-join that Spark executes as a shuffle hash join):

- ``exact_dedup``        hash-groupBy on normalized text
- ``minhash_lsh_pairs``  MinHash signatures + banded LSH candidate pairs
- ``simhash``            64-bit SimHash signatures (Hamming near-dup)
- ``ngram_jaccard_pairs``exact character-shingle Jaccard via shingle join
- near-dup by embedding cosine lives in operators/similarity.py

Everything below is built from JVM-side array expressions (transform /
aggregate / array_min) — no Python UDFs — so the whole pipeline stays in
whole-stage codegen and scales with executor count.

Scale notes (100 TB): exact dedup is one shuffle on a 128-bit digest.
MinHash/LSH is the industry-standard near-dup at scale: cost is
O(n * bands) shuffle rows, and band buckets bound the pairwise work; skewed
buckets (boilerplate docs) are handled by AQE skew-join splitting. The
shingle join in ``ngram_jaccard_pairs`` is exact but heavier — use it to
verify LSH candidates, not as the primary pass.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# MinHash universe: (a*h + b) mod P over a base 32-bit hash, P Mersenne prime.
_P = (1 << 31) - 1


def normalized_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest-id representative per normalized-text
    digest. One shuffle on the digest; digest is md5 so collision odds are
    negligible at any scale."""
    digest = F.md5(normalized_text(F.col(text_col))).alias("text_hash")
    return (
        df.select(F.col(id_col), digest)
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def char_shingles(col: Column, k: int = 8) -> Column:
    """Distinct character k-grams of the normalized text, as array<string>.
    Pure expressions: sequence over offsets -> substring -> dedupe."""
    t = normalized_text(col)
    n = F.length(t)
    offsets = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(F.transform(offsets, lambda i: t.substr(i, F.lit(k))))


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash: for permutation i, min over shingles of (a_i*h + b_i) mod P,
    h = 32-bit murmur of the shingle. Fixed (a_i, b_i) derived from i keep
    the signature deterministic across runs/engines."""
    base = F.transform(shingles, lambda s: F.abs(F.hash(s)).cast("long"))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(base, lambda h: ((i * 2 + 1) * h + i * i + 7) % F.lit(_P))
        ),
    )
    return sig


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 8,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH.

    signature (num_hashes mins) -> split into ``bands`` bands of
    num_hashes/bands rows -> hash each band -> equi-join docs sharing any
    (band_id, band_hash) bucket -> distinct pairs with estimated Jaccard
    (signature agreement rate).

    Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(char_shingles(F.col(text_col), shingle_k), num_hashes).alias("sig"),
    ).filter(F.size("sig") > 0)

    banded = sig.select(
        "id",
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.hash(F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)),
            )
        ).alias("band_id", "band_hash"),
    )

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")), lambda v: v == 1)
    )
    return pairs.select(
        "id_a",
        "id_b",
        (agree.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens: per bit, sum +-1 across token
    xxhash64 values; bit set iff the sum is positive. All expression-level:
    fold token-hash array into a 64-wide counter array, then pack bits."""
    toks = F.filter(F.split(normalized_text(F.col(text_col)), " "), lambda t: t != "")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    # shiftright/shiftleft take a literal shift count, so the 64 bit
    # positions are unrolled Python-side into array literals.
    def bit_contrib(h: Column) -> Column:
        return F.array(
            *[
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long")
                for b in range(64)
            ]
        )

    counters = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(acc, bit_contrib(h), lambda x, y: x + y),
    )
    # bit 63 is the sign bit: its mask is the most negative long.
    masks = F.array(
        *[F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long") for b in range(64)]
    )
    packed = F.aggregate(
        F.zip_with(counters, masks, lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseXOR(v),
    )
    return df.select(F.col(id_col).alias("id"), packed.alias("simhash"))


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Hamming-near pairs via the 4-block pigeonhole trick: split the 64-bit
    signature into 4 16-bit blocks — any pair within Hamming distance 3
    agrees on >=1 block — equi-join per block, then verify exact distance.
    Avoids the quadratic compare: candidate generation is 4 hash joins."""
    sigs = simhash(df, text_col, id_col)
    blocks = sigs.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("block_id", "block_val"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    threshold: float = 0.30,
) -> DataFrame:
    """Exact character-k-gram Jaccard similarity for all pairs sharing at
    least one shingle. Candidate generation = shingle equi-join (shuffle on
    shingle), so disjoint docs never pair up. Returns
    (id_a, id_b, n_common, jaccard) above ``threshold``.
    """
    sh = (
        df.select(F.col(id_col).alias("id"), F.explode(char_shingles(F.col(text_col), k)).alias("sh"))
        .dropDuplicates(["id", "sh"])
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out
