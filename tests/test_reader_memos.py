"""Session-scoped reader memos (r15): load_table and load_search_index
each cost ~90 ms of pure driver/py4j time per call — a 100-query suite
pays that hundreds of times for the same static layouts, and a serving
tier would hold its frames open. The memos must be invisible except for
speed: same plan back for the same bytes, a fresh plan the moment the
path's content changes."""

import os
import sys

sys.path.insert(0, "/root/repo")

from sf_epa_data_ingestion_spark.operators import search
from sf_epa_data_ingestion_spark.sources import readers

SF = "/root/testdata/sf0.001"


def test_load_table_memoizes_per_session(spark):
    a = readers.load_table(spark, SF, "orders")
    b = readers.load_table(spark, SF, "orders")
    assert a is b, "repeat load of an unchanged table must hit the memo"
    # distinct tables / sf dirs are distinct entries
    c = readers.load_table(spark, SF, "lineitem")
    assert c is not a
    assert a.count() > 0  # the cached frame still executes


def test_load_table_reopens_on_rewrite(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(3).write.parquet(p)
    a = readers.load_table(spark, str(tmp_path), "t")
    assert a.count() == 3
    # rewrite in place: mtime_ns moves -> the memo must miss
    spark.range(5).write.mode("overwrite").parquet(p)
    os.utime(p)  # overwrite may reuse the dir inode; force the stat change
    b = readers.load_table(spark, str(tmp_path), "t")
    assert b.count() == 5


def test_load_table_nanos_conf_reasserted_on_hit(spark, tmp_path):
    # fabricate a TIMESTAMP(NANOS) table (the driver's testdata has
    # carried micros since r14, but the legacy-reader path must hold)
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"ts": pa.array([1_700_000_000_000_000_123], pa.timestamp("ns"))})
    pq.write_table(t, str(tmp_path / "nanos.parquet"))
    df = readers.load_table(spark, str(tmp_path), "nanos")
    assert df.count() == 1  # conf was set; truncated micros read works
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    hit = readers.load_table(spark, str(tmp_path), "nanos")  # memo hit
    assert hit is df
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert hit.count() == 1


def test_load_ivf_index_memoizes_and_reopens(spark, tmp_path):
    from sf_epa_data_ingestion_spark.operators import similarity

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)], "vec_id long, embedding array<double>"
    )
    root = str(tmp_path / "ivf")
    similarity.materialize_ivf_index(vecs, root, n_centroids=2)
    a = similarity.load_ivf_index(spark, root)
    assert similarity.load_ivf_index(spark, root) is a
    meta = os.path.join(root, "_meta.json")
    st = os.stat(meta)
    os.utime(meta, ns=(st.st_atime_ns + 1_000_000, st.st_mtime_ns + 1_000_000))
    assert similarity.load_ivf_index(spark, root) is not a


def test_load_search_index_memoizes_and_reopens(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "id long, text string"
    )
    root = str(tmp_path / "idx")
    search.materialize_search_index(docs, root, id_col="id", text_col="text")
    a = search.load_search_index(spark, root)
    b = search.load_search_index(spark, root)
    assert a is b, "repeat load of an unchanged layout must hit the memo"
    # a rebuilt layout (fresh _meta.json mtime) must be reopened
    meta = os.path.join(root, "_meta.json")
    st = os.stat(meta)
    os.utime(meta, ns=(st.st_atime_ns + 1_000_000, st.st_mtime_ns + 1_000_000))
    c = search.load_search_index(spark, root)
    assert c is not a
