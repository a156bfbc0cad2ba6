"""Corpus-cleaning operators: PII redaction, HTML stripping, URL domains,
repetition stats, benchmark contamination (operators/cleaning.py).

The driver-testdata documents contain no PII/HTML/URLs, so these tests pin
the semantics on crafted strings; the oracle harness covers engine parity
on the (augmented) corpus."""

from __future__ import annotations

import pyspark.sql.functions as F

from sf_epa_data_ingestion_spark.operators import cleaning


def _clean(spark, s, fn):
    return (
        spark.createDataFrame([(s,)], "t string")
        .select(fn(F.col("t")).alias("out"))
        .first()["out"]
    )


def test_redact_pii_all_shapes(spark):
    s = (
        "mail a.b-c_d@sub.example.co.uk or root@h.io, host 192.168.0.1, "
        "ssn 123-45-6789, call (415) 555-2671 or 415.555.2671 x9"
    )
    out = _clean(spark, s, cleaning.redact_pii)
    assert out == (
        "mail <EMAIL> or <EMAIL>, host <IP>, "
        "ssn <ID>, call <PHONE> or <PHONE> x9"
    )


def test_redact_pii_leaves_clean_text_alone(spark):
    s = "version 1.2.3 of the spec, published 2024-01-02, costs 12-34 units"
    assert _clean(spark, s, cleaning.redact_pii) == s


def test_strip_html_tags_entities_whitespace(spark):
    s = (
        '<html><body class="x">\n  Hello <b>world</b>!'
        "<script>if (1 < 2) alert('x');</script>"
        "<style>p { color: red; }</style>"
        " AT&amp;T &lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;end</body></html>"
    )
    out = _clean(spark, s, cleaning.strip_html)
    assert out == "Hello world ! AT&T <tag> \"q\" 'a' end"


def test_strip_html_plain_text_unchanged(spark):
    assert _clean(spark, "no markup here 1 2 3", cleaning.strip_html) == "no markup here 1 2 3"


def test_extract_url_domains_counts_and_reach(spark):
    df = spark.createDataFrame(
        [
            (1, "see https://A.example.com/x and https://a.example.com/y"),
            (2, "mirror http://b.example.org plus https://a.example.com"),
            (3, "no urls at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["domain"]: r for r in cleaning.extract_url_domains(df).collect()}
    assert rows["a.example.com"]["n_urls"] == 3  # case-folded host
    assert rows["a.example.com"]["n_docs"] == 2
    assert rows["b.example.org"]["n_urls"] == 1
    assert set(rows) == {"a.example.com", "b.example.org"}


def test_repetition_stats_values(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x  y\tz"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in cleaning.repetition_stats(df).collect()}
    assert (rows[1]["n_tokens"], rows[1]["n_unique_tokens"]) == (5, 2)
    assert abs(rows[1]["repetition_ratio"] - (1 - 2 / 5)) < 1e-12
    assert (rows[2]["n_tokens"], rows[2]["n_unique_tokens"]) == (3, 3)
    assert rows[3]["repetition_ratio"] == 0.0


def test_contamination_screen_counts_distinct_grams(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # shares two distinct 4-grams with the benchmark sentence
            (1, "he said the quick brown fox jumps high"),
            # repeated phrase still counts once (distinct grams per doc)
            (2, "lazy dog lazy dog the quick brown fox the quick brown fox"),
            (3, "completely different words only here"),
            (4, "shorter than"),  # < n words -> no grams
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r["n_hits"] for r in cleaning.contamination_screen(docs, bench, n=4).collect()}
    assert rows[1] == 2  # "the quick brown fox", "quick brown fox jumps"
    assert rows[2] == 1  # "the quick brown fox" once, despite repetition
    assert 3 not in rows and 4 not in rows


def test_dedup_lines_removes_repeated_keeps_blank_and_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "keep me\nboiler\n\nunique one"),
            (2, "boiler\nunique two"),
            (3, "boiler"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["text"]
        for r in cleaning.dedup_lines(docs, "doc_id", "text", max_freq=1).collect()
    }
    # 'boiler' occurs 3x -> removed everywhere; blank line survives; order kept
    assert out == {1: "keep me\n\nunique one", 2: "unique two", 3: "", 4: ""}


def test_dedup_lines_max_freq_and_delimiter(spark):
    docs = spark.createDataFrame(
        [(1, "a.b.a"), (2, "b.c"), (3, "c.d")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["text"]
        for r in cleaning.dedup_lines(
            docs, "doc_id", "text", max_freq=2, delimiter="."
        ).collect()
    }
    # every token occurs <= 2 times -> nothing removed; delimiter is literal
    assert out == {1: "a.b.a", 2: "b.c", 3: "c.d"}
    out1 = {
        r["doc_id"]: r["text"]
        for r in cleaning.dedup_lines(
            docs, "doc_id", "text", max_freq=1, delimiter="."
        ).collect()
    }
    # 'a' (2x within one doc), 'b', 'c' all exceed freq 1; 'd' survives
    assert out1 == {1: "", 2: "", 3: "d"}


def test_dedup_lines_fast_path_equals_distributed_path(spark):
    """r15: the InSet fast path (banned set collected through the
    limit(inline_max+1) guard, rewrite as one codegen'd projection) must
    be row-identical to the distributed explode/anti-join/reassembly
    path on every edge the operator owns: NULL text, blank lines,
    all-banned docs, banned lines that are substrings of kept ones, and
    a multi-char delimiter. inline_max=0 forces the fallback."""
    docs = spark.createDataFrame(
        [
            (1, "boiler::keep::boiler"),
            (2, "boiler::"),            # trailing empty token survives
            (3, None),                  # NULL text -> ''
            (4, "boiler"),              # everything banned -> ''
            (5, "boilerplate::boiler"),  # substring must NOT match
            (6, ""),
        ],
        "doc_id long, text string",
    )
    kw = dict(max_freq=2, delimiter="::")
    fast = {r["doc_id"]: r["text"]
            for r in cleaning.dedup_lines(docs, "doc_id", "text", **kw).collect()}
    dist = {r["doc_id"]: r["text"]
            for r in cleaning.dedup_lines(docs, "doc_id", "text",
                                          inline_max=0, **kw).collect()}
    assert fast == dist
    # 'boiler' occurs 4x > 2 -> banned; 'boilerplate' and blanks survive
    assert fast == {1: "keep", 2: "", 3: "", 4: "", 5: "boilerplate", 6: ""}

    # overflow guard: inline_max=1 with 1 banned line stays on the fast
    # path; inline_max so small the set overflows must fall back — both
    # identical either way
    tiny = {r["doc_id"]: r["text"]
            for r in cleaning.dedup_lines(docs, "doc_id", "text",
                                          inline_max=1, **kw).collect()}
    assert tiny == fast
    many = spark.createDataFrame(
        [(i, f"w{i} dup{i % 3}") for i in range(9)], "doc_id long, text string"
    )
    over = {r["doc_id"]: r["text"]
            for r in cleaning.dedup_lines(many, "doc_id", "text", max_freq=2,
                                          delimiter=" ", inline_max=2).collect()}
    ref = {r["doc_id"]: r["text"]
           for r in cleaning.dedup_lines(many, "doc_id", "text", max_freq=2,
                                         delimiter=" ", inline_max=0).collect()}
    assert over == ref  # 3 banned lines > inline_max=2 -> fallback ran

    # byte guard (r16, r15 VERDICT #5): a banned set within the ROW
    # bound but over the BYTE bound must fall back to the distributed
    # path — same rows either way. 'boiler' is 6 bytes; a 4-byte cap
    # forces the fallback, a generous one stays fast.
    byte_over = {r["doc_id"]: r["text"]
                 for r in cleaning.dedup_lines(docs, "doc_id", "text",
                                               inline_max_bytes=4, **kw).collect()}
    assert byte_over == fast
    byte_ok = {r["doc_id"]: r["text"]
               for r in cleaning.dedup_lines(docs, "doc_id", "text",
                                             inline_max_bytes=1 << 20,
                                             **kw).collect()}
    assert byte_ok == fast


def test_ngram_novelty_first_carrier_attribution(spark):
    from sf_epa_data_ingestion_spark.operators.cleaning import ngram_novelty

    # doc 1 coins both 2-grams; doc 2 repeats one of them and coins one
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "zz")], "doc_id long, text string"
    )
    rows = {r["id"]: r for r in ngram_novelty(df, n=2).collect()}
    assert rows[1]["n_grams"] == 2 and rows[1]["novel_frac"] == 1.0
    # doc 2: "a b" first seen in doc 1; "b d" is its own
    assert rows[2]["n_grams"] == 2 and abs(rows[2]["novel_frac"] - 0.5) < 1e-9
    assert 3 not in rows  # too short for a 2-gram
