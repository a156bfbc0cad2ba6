"""Tests for language ID, quality scoring, token counting, fingerprints."""

from __future__ import annotations

import pyspark.sql.functions as F

from sf_epa_data_ingestion_spark.functions import text


def _one(spark, s, col_builder):
    df = spark.createDataFrame([(s,)], ["text"])
    return df.select(col_builder(F.col("text")).alias("out")).collect()[0]["out"]


def test_lang_id_known_sentences(spark):
    cases = {
        "the cat sat on the mat and that is that": "en",
        "der hund ist nicht mit der katze und die maus": "de",
        "le chat est dans la maison pour les amis": "fr",
        "el perro es grande y los gatos en las casas por para": "es",
        "xyzzy qwerty 12345": "und",
    }
    for sentence, expected in cases.items():
        assert _one(spark, sentence, text.lang_id) == expected, sentence


def test_token_counts(spark):
    assert _one(spark, "one two  three", text.token_count_ws) == 3
    # BPE-ish: words, numbers, punctuation marks each count
    assert _one(spark, "hello, world 42!", text.token_count_bpe) == 5


def test_quality_score_orders_sensibly(spark):
    good = "The quick brown fox jumps over the lazy dog and that is a fine thing to see. " * 10
    bad = "!!! ??? ### $$$ %%% "
    df = spark.createDataFrame([(0, good), (1, bad)], ["id", "text"])
    scores = {
        r["id"]: r["q"]
        for r in df.select("id", text.quality_score(F.col("text")).alias("q")).collect()
    }
    assert 0.0 <= scores[1] < scores[0] <= 1.0


def test_quality_features_zero_guards(spark):
    df = spark.createDataFrame([("",)], ["text"])
    feats = text.quality_features(F.col("text"))
    row = df.select(
        feats["punct_ratio"].alias("p"), feats["stopword_ratio"].alias("s")
    ).collect()[0]
    assert row["p"] is None and row["s"] is None  # NULL, not div-by-zero error


def test_fingerprints_deterministic_and_shift_robust(spark):
    base = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame([(0, base), (1, base), (2, "prefix " + base)], ["id", "text"])
    rows = {r["id"]: r["fp"] for r in df.select("id", text.fingerprint_udf(F.col("text")).alias("fp")).collect()}
    assert rows[0] == rows[1]
    # winnowing is position-robust: a prefix shift keeps most fingerprints
    common = set(rows[0]) & set(rows[2])
    assert len(common) >= len(rows[0]) // 2


def test_chunk_documents_dataframe(spark):
    df = spark.createDataFrame([(1, "word " * 100)], ["doc_id", "text"])
    out = text.chunk_documents(df, chunk_size=64, overlap=16).collect()
    assert len(out) > 1
    assert [r["chunk_index"] for r in out] == list(range(len(out)))
    assert all(len(r["chunk"]) <= 64 for r in out)


def test_udtf_lateral_sql(spark):
    text.register_text_chunker(spark)
    spark.createDataFrame([(1, "alpha beta gamma")], ["doc_id", "text"]).createOrReplaceTempView(
        "docs_udtf_test"
    )
    rows = spark.sql(
        "SELECT d.doc_id, c.chunk FROM docs_udtf_test d, LATERAL text_chunker(d.text) c"
    ).collect()
    assert rows[0]["chunk"] == "alpha beta gamma"
