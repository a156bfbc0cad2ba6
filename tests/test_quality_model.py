"""Quality classifier (operators/quality_model.py): mirror parity,
determinism, learning sanity, and edge cases."""

from __future__ import annotations

import pyspark.sql.functions as F

from sf_epa_data_ingestion_spark.functions.refhash import (
    QLR_ONE,
    qlr_hard_sigmoid_fp,
    ref_qlr_scores,
)
from sf_epa_data_ingestion_spark.operators import quality_model


def _collect(df):
    return sorted((r["id"], r["label"], r["score_fp"]) for r in df.collect())


def test_matches_python_mirror_on_corpus(spark):
    """Bit-exact parity with refhash.ref_qlr_scores on the real corpus —
    the same guarantee the golden-fixture oracle encodes, pinned here
    against the live testdata."""
    import pyarrow.parquet as pq

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = _collect(quality_model.score_quality_lr(df))
    rows = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    want = ref_qlr_scores([(r["doc_id"], r["text"]) for r in rows])
    assert got == want and len(got) == 500


def test_matches_mirror_on_edges(spark):
    """NULL text dropped; empty/whitespace-only text scores from the bias
    alone; unicode + stopword-dense rows agree with the mirror."""
    rows = [
        (1, None),
        (2, ""),
        (3, "   \t\n  "),
        (4, "the a an and or of to in is it that for on with as this words"),
        (5, "café ☃ 你好 naïve unicode tokens only"),
        (6, "one two three"),
        (7, "the the the the the"),  # 1 distinct stopword -> label 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = _collect(quality_model.score_quality_lr(df))
    want = ref_qlr_scores(rows)
    assert got == want
    labels = {i: l for i, l, _ in got}
    assert 1 not in labels  # NULL text excluded entirely
    assert labels[4] == 1 and labels[7] == 0


def test_deterministic_across_runs(spark):
    """Fixed-point arithmetic means two trainings are bit-identical —
    shuffle order cannot move a gradient bit."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    a = _collect(quality_model.score_quality_lr(df))
    b = _collect(quality_model.score_quality_lr(df))
    assert a == b


def test_classifier_learns_the_weak_rule(spark):
    """Learning sanity: thresholding the trained score at ONE/2 must
    reproduce the weak labels almost perfectly on the synthetic corpus
    (the stopword buckets are linearly separable by construction)."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = quality_model.score_quality_lr(df)
    acc = (
        out.select(
            (
                (F.col("score_fp") >= QLR_ONE // 2).cast("int") == F.col("label")
            ).cast("int").alias("hit")
        )
        .agg(F.avg("hit"))
        .collect()[0][0]
    )
    assert acc >= 0.95, acc


def test_hard_sigmoid_spec():
    """The shared link function: clamp to [0, ONE], midpoint at 0, and the
    non-negative-dividend trick keeps trunc == floor."""
    assert qlr_hard_sigmoid_fp(0) == QLR_ONE // 2
    assert qlr_hard_sigmoid_fp(10 * QLR_ONE) == QLR_ONE
    assert qlr_hard_sigmoid_fp(-10 * QLR_ONE) == 0
    assert qlr_hard_sigmoid_fp(2 * QLR_ONE) == QLR_ONE
    assert qlr_hard_sigmoid_fp(-2 * QLR_ONE) == 0
    assert qlr_hard_sigmoid_fp(1) == QLR_ONE // 2  # rounds down, not to nearest


def test_presence_features_distinct_and_bounded(spark):
    """Feature rows are distinct per (doc, bucket) and buckets sit in
    [0, dim) — pmod, not rem."""
    df = spark.createDataFrame(
        [(1, "alpha alpha alpha beta"), (2, "beta gamma")], ["doc_id", "text"]
    )
    rows = quality_model.hashed_presence_features(df, dim=32).collect()
    assert len(rows) == len({(r["id"], r["bucket"]) for r in rows})
    assert all(0 <= r["bucket"] < 32 for r in rows)


def test_empty_corpus_trains_nothing(spark):
    """All-NULL text: no docs to train on — empty result on both sides,
    not a divide-by-zero in the update step (r6 self-audit)."""
    df = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, text string"
    )
    assert quality_model.score_quality_lr(df).count() == 0
    assert ref_qlr_scores([(1, None), (2, None)]) == []


def test_train_then_score_matches_one_call(spark):
    """The deploy split (r7): train_quality_lr's (weights, bias) scored
    through score_docs_lr — the broadcast, no-training path the streaming
    gate uses — must be bit-identical to score_quality_lr's fused pass."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = {r["id"]: r["score_fp"] for r in quality_model.score_quality_lr(df).collect()}
    w, b = quality_model.train_quality_lr(df)
    sep = {r["id"]: r["score_fp"] for r in quality_model.score_docs_lr(df, w, b).collect()}
    assert full == sep and len(full) > 0


def test_score_and_label_fused_parity(spark):
    """The r15 fused serving pass (one tokenize, one exchange) must equal
    the separate weak_stopword_labels + score_docs_lr + join form on a
    real corpus slice AND on the edges they could diverge on: NULL text
    (excluded by both spines), a tokenless doc (bias-only logit, label
    0), and a doc whose every bucket misses the weight table (the LEFT
    weight join must keep its n_stop — an inner join would drop it)."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w, b = quality_model.train_quality_lr(df)
    fused = {
        (r["id"], r["label"], r["score_fp"])
        for r in quality_model.score_and_label_docs_lr(df, w, b).collect()
    }
    labels = quality_model.weak_stopword_labels(df)
    scores = quality_model.score_docs_lr(df, w, b)
    joined = {
        (r["id"], r["label"], r["score_fp"])
        for r in labels.join(scores, "id").collect()
    }
    assert fused == joined and len(fused) > 0

    edge = spark.createDataFrame(
        [
            (1, None),  # NULL text: not in either spine
            (2, "... ..."),  # tokenless after the non-alnum split
            # stopwords only -> every bucket may miss a sparse weight
            # table; score must be bias-only ONLY if those buckets are
            # absent from w, label must still count the stopwords
            (3, "the and for the and for"),
        ],
        "doc_id long, text string",
    )
    sparse_w = {0: 7}  # almost certainly misses the stopword buckets
    f2 = {
        (r["id"], r["label"], r["score_fp"])
        for r in quality_model.score_and_label_docs_lr(edge, sparse_w, b).collect()
    }
    j2 = {
        (r["id"], r["label"], r["score_fp"])
        for r in quality_model.weak_stopword_labels(edge)
        .join(quality_model.score_docs_lr(edge, sparse_w, b), "id")
        .collect()
    }
    assert f2 == j2 and {i for i, _, _ in f2} == {2, 3}


def test_score_and_label_duplicate_id_multiplicity(spark):
    """r16 (r15 ADVICE): under a DUPLICATED doc_id the fused form emits
    one row per INPUT row while the old join form emitted n*n rows per
    id (each helper keeps its per-input-row spine, so the id-equi-join
    multiplies) — doc_id uniqueness is a documented precondition, and
    this pins both the divergence and that the VALUES agree (both
    shapes fold the union of the duplicate rows' tokens)."""
    dup = spark.createDataFrame(
        [(1, "the cat and the hat"), (1, "for a dog the end"), (2, "solo")],
        "doc_id long, text string",
    )
    w, b = {3: 5, 17: -2}, 1
    fused_rows = quality_model.score_and_label_docs_lr(dup, w, b).collect()
    assert len(fused_rows) == 3  # one per input row
    joined_rows = (
        quality_model.weak_stopword_labels(dup)
        .join(quality_model.score_docs_lr(dup, w, b), "id")
        .collect()
    )
    assert len(joined_rows) == 5  # n*n per duplicated id (2*2 + 1)
    fused_set = {(r["id"], r["label"], r["score_fp"]) for r in fused_rows}
    joined_set = {(r["id"], r["label"], r["score_fp"]) for r in joined_rows}
    assert fused_set == joined_set  # values identical; only multiplicity differs


def test_classifier_separates_both_classes(spark):
    """Non-degeneracy guard (the r6 grading hole: STOP_MIN=4 was
    unreachable on this corpus, so labels AND scores were uniformly zero
    and the oracle match was vacuous). Both classes must be present and
    perfectly separated at the ONE/2 threshold."""
    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = quality_model.score_quality_lr(df)
    per = {
        r["label"]: (r["n"], r["hits"])
        for r in out.groupBy("label").agg(
            F.count("*").alias("n"),
            F.sum(
                (
                    (F.col("score_fp") >= QLR_ONE // 2).cast("int") == F.col("label")
                ).cast("int")
            ).alias("hits"),
        ).collect()
    }
    assert set(per) == {0, 1}, per
    assert all(n == hits for n, hits in per.values()), per
