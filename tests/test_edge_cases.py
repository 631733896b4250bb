"""Edge-case mini-frames (FIXTURES.md §3.3): the corners the synthetic
TPC-H-ish data under-covers — nulls in keys, ties, empties, zero vectors,
unicode text."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_snap_to_hadoop_spark.operators.cassandra import lww_merge, wide_row_regroup
from cassandra_snap_to_hadoop_spark.operators.dedup import exact_dedup, shingles
from cassandra_snap_to_hadoop_spark.operators.similarity import cosine, knn_bruteforce
from cassandra_snap_to_hadoop_spark.operators.text import quality_features


def test_null_join_keys_never_match(spark):
    a = spark.createDataFrame([(1, "a"), (None, "b")], "k int, v string")
    b = spark.createDataFrame([(1, "x"), (None, "y")], "k int, w string")
    inner = a.join(b, a.k == b.k).collect()
    assert len(inner) == 1 and inner[0].v == "a"
    # null-safe equality DOES match nulls
    nullsafe = a.join(b, a.k.eqNullSafe(b.k)).collect()
    assert len(nullsafe) == 2


def test_zero_vector_cosine_is_null(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    row = df.crossJoin(
        df.select(F.col("embedding").alias("e2")).filter(F.expr("embedding[0] = 1.0"))
    ).select(cosine(F.col("embedding"), F.col("e2")).alias("c")).collect()
    vals = sorted([r.c for r in row], key=lambda x: (x is None, x))
    assert vals[0] == 1.0 and vals[1] is None  # defined pair, zero-vector pair


def test_knn_with_zero_vector_query_returns_no_scores(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, [0.0, 1.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    q = df.filter(F.col("vec_id") == 1).select(F.col("vec_id").alias("query_id"), "embedding")
    out = knn_bruteforce(df, q, k=2).collect()
    assert all(r.cos is None for r in out)  # cosine undefined, ranked but null


def test_empty_table_through_operators(spark):
    empty = spark.createDataFrame([], "pk long, ck long, _writetime long, _seq long, v string")
    assert lww_merge(empty, ["pk", "ck"], "_writetime", "_seq").count() == 0
    assert wide_row_regroup(empty, ["pk"], "ck", ["v"]).count() == 0
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(empty_docs, "doc_id", "text").count() == 0


def test_unicode_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, "héllo wörld héllo wörld héllo"), (2, ""), (3, "日本語 テスト 日本語 テスト 日本語")],
        "doc_id long, text string",
    )
    sh = df.select("doc_id", F.size(shingles(F.col("text"), 3)).alias("n")).collect()
    got = {r.doc_id: r.n for r in sh}
    # 5 tokens -> 3 trigrams, but the a-b-a-b-a pattern repeats one -> 2 distinct
    assert got[1] == 2 and got[2] == 0 and got[3] == 2
    q = quality_features(df, "text").collect()
    empty_row = next(r for r in q if r.doc_id == 2)
    assert empty_row.quality_ok == 0  # empty text never passes quality


def test_ranking_ties_fully_deterministic(spark):
    """Every row has the same value — the pk tiebreak must make row_number
    a permutation, repeatably."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame([(i, 7.0) for i in range(20)], "id long, v double")
    w = Window.partitionBy().orderBy(F.col("v").desc(), F.col("id"))
    r1 = [(r.id, r.rn) for r in df.withColumn("rn", F.row_number().over(w)).collect()]
    r2 = [(r.id, r.rn) for r in df.withColumn("rn", F.row_number().over(w)).collect()]
    assert sorted(r1) == sorted(r2) == [(i, i + 1) for i in range(20)]


def test_all_null_group_key(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), (1, 3.0)], "k int, v double"
    )
    out = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert out[None] == 3.0 and out[1] == 3.0  # nulls form one group (SQL semantics)

def test_chunking_short_and_empty_docs(spark):
    """j31's chunk-count formula on the corners: a doc shorter than one
    window still yields exactly one chunk; an empty string tokenizes to
    [''] (one token) and must not error."""
    from cassandra_snap_to_hadoop_spark.queries.training import j31_context_chunking

    # Build a registry-shaped call by staging a miniature documents table.
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (1, "one two three", "en", "src0", 13),
                (2, "", "en", "src1", 0),
                (3, " ".join(f"w{i}" for i in range(64)), "en", "src2", 100),
                (4, " ".join(f"w{i}" for i in range(65)), "en", "src3", 100),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in j31_context_chunking(spark, d).collect()}
    assert out[1]["n_chunks"] == 1
    assert out[2]["n_chunks"] == 1 and out[2]["n_tokens"] == 1
    assert out[3]["n_chunks"] == 1  # exactly one full window
    assert out[4]["n_chunks"] == 2  # one token over -> second (overlapping) chunk


def test_line_dedup_doc_shorter_than_line(spark):
    """j29 on a 3-token doc: one (short) line, nothing dropped when its
    content is unique."""
    from cassandra_snap_to_hadoop_spark.queries.governance import j29_line_dedup
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, f"unique{i} alpha beta", "en", "src0", 10) for i in range(30)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        rows = j29_line_dedup(spark, d).collect()
    # banner is injected into doc_id%3!=0 docs -> their banner line IS
    # boilerplate (20/30 docs > 5%), the unique tail line survives.
    for r in rows:
        if r["doc_id"] % 3 != 0:
            assert r["n_lines"] == 2 and r["n_kept"] == 1
        else:
            assert r["n_lines"] == 1 and r["n_kept"] == 1


def test_semdedup_identical_vectors_prune_to_one(spark):
    """j33 keep-first: N identical vectors leave exactly the smallest id."""
    from cassandra_snap_to_hadoop_spark.queries.governance import j33_semdedup_prune
    import tempfile

    vec = [0.5] * 8
    other = [-1.0] + [0.1] * 7
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, vec, 0) for i in range(5)] + [(99, other, 0)],
            "vec_id long, embedding array<float>, label int",
        ).write.parquet(f"{d}/embeddings.parquet")
        rows = {r["vec_id"]: r for r in j33_semdedup_prune(spark, d).collect()}
    assert rows[0]["dropped"] == 0
    assert all(rows[i]["dropped"] == 1 for i in range(1, 5))
    assert rows[99]["dropped"] == 0  # different quadrant, untouched
